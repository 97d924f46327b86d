"""Regression tests for the self-review findings: queue-deadline timeouts,
checkpoint serialization under concurrent flush, legacy-size limits, and
Content-Length validation."""

import socket
import threading
import time

import pytest
import requests

from acoustid_index_tpu.engine import errors
from acoustid_index_tpu.engine.index import Index
from acoustid_index_tpu.engine.model import Insert, SearchOptions

from server_fixture import Server


def test_search_deadline_enforced(tmp_path):
    idx = Index.open(str(tmp_path / "idx"), checkpoint_age=None)
    try:
        idx.update([Insert(id=1, hashes=[1, 2])])
        # A request whose deadline already passed while queueing is refused.
        with pytest.raises(errors.SearchTimeout):
            idx.search([1, 2], SearchOptions(), deadline=time.monotonic() - 0.001)
        # A live deadline passes.
        results, _ = idx.search([1, 2], SearchOptions(), deadline=time.monotonic() + 30)
        assert results[0].id == 1
    finally:
        idx.close()


def test_concurrent_flush_and_maintenance_checkpoints(tmp_path):
    """A public flush() racing maintenance checkpoints must never lose
    manifest-committed files (regression: identical segment file names, the
    loser's abort deleted the winner's file)."""
    idx = Index.open(str(tmp_path / "idx"), checkpoint_threshold=5, checkpoint_age=None)
    try:
        stop = threading.Event()
        failures = []

        def flusher():
            while not stop.is_set():
                try:
                    idx.flush()
                except Exception as exc:  # noqa: BLE001
                    failures.append(exc)
                    return

        t = threading.Thread(target=flusher)
        t.start()
        try:
            for i in range(1, 120):
                idx.update([Insert(id=i, hashes=[i, 7])])
                if i % 10 == 0:
                    idx.run_maintenance()
        finally:
            stop.set()
            t.join()
        assert not failures
        idx.flush()
    finally:
        idx.close()

    # The decisive check: a fresh open must find every manifest file intact.
    idx2 = Index.open(str(tmp_path / "idx"), checkpoint_age=None)
    try:
        results, _ = idx2.search([7], SearchOptions(max_results=100, min_score=1, min_score_pct=0))
        assert len(results) == 100  # capped at limit; all docs present
        assert idx2.acquire_reader().num_docs() == 119
    finally:
        idx2.close()


def test_large_limit_does_not_crash(tmp_path):
    """limit > out_len (the legacy default is 500) must degrade to the top
    out_len results, not overrun the output tile."""
    idx = Index.open(str(tmp_path / "idx"), checkpoint_age=None)
    try:
        idx.update([Insert(id=i, hashes=[42]) for i in range(1, 300)])
        results, _ = idx.search([42], SearchOptions(max_results=500, min_score=1, min_score_pct=0))
        assert len(results) == 128  # out_len cap
        assert [r.id for r in results] == list(range(1, 129))
    finally:
        idx.close()


def test_bad_content_length(tmp_path):
    s = Server(tmp_path / "data").start()
    try:
        for bad in (b"-1", b"abc"):
            conn = socket.create_connection(("127.0.0.1", s.port), timeout=10)
            conn.sendall(
                b"POST /x/_search HTTP/1.1\r\nHost: h\r\nContent-Length: " + bad + b"\r\n\r\n"
            )
            data = conn.recv(4096)
            assert b"400" in data.split(b"\r\n", 1)[0], data
            conn.close()
    finally:
        s.stop()


def test_model_ingest_rejects_doc_zero():
    import numpy as np

    from acoustid_index_tpu.models.fingerprint_search import FingerprintSearchModel

    m = FingerprintSearchModel()
    with pytest.raises(ValueError):
        m.ingest(np.array([1, 2], np.uint32), np.array([0, 1], np.uint32))
