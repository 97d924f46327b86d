"""Replicator edge cases mirroring the reference's unit matrix
(Replicator.zig tests): poison-op parking, corpus-stream retry (a transient
failure must never degrade to an incomplete replay), and three-replica
convergence."""

import threading
import time

import pytest

from acoustid_index_tpu.cluster.coordinator import BootstrapStream, MemoryCoordinator
from acoustid_index_tpu.cluster.replicator import Replicator
from acoustid_index_tpu.engine import errors
from acoustid_index_tpu.engine.model import Insert
from acoustid_index_tpu.multi.multi_index import MultiIndex, SearchRequestParams

from test_replication import Node, search_ids


def test_three_replicas_converge(tmp_path):
    coordinator = MemoryCoordinator()
    nodes = [Node(tmp_path / f"n{i}", coordinator) for i in range(3)]
    try:
        nodes[0].mi.create_index("idx")
        for n in nodes:
            n.wait_exists("idx")
        v = 0
        for i, n in enumerate(nodes):  # writes from every node interleaved
            v = n.mi.update("idx", [Insert(id=10 + i, hashes=[10 + i, 999])])
        for n in nodes:
            n.wait_version("idx", v)
        want = search_ids(nodes[0], "idx", [999])
        assert len(want) == 3
        for n in nodes[1:]:
            assert search_ids(n, "idx", [999]) == want
    finally:
        for n in nodes:
            n.close()


def test_poison_meta_op_does_not_wedge_others(tmp_path):
    """A create that keeps failing must be parked and retried without
    blocking reconciliation of other indexes."""
    coordinator = MemoryCoordinator()
    mi = MultiIndex.open(str(tmp_path / "node"), checkpoint_age=None, sync=False)
    repl = Replicator(mi, coordinator, ryw_timeout=10.0)
    mi.replication = repl

    real_reconcile = mi.reconcile_create
    fail_until = [time.monotonic() + 1.5]

    def flaky(name, generation):
        if name == "poison" and time.monotonic() < fail_until[0]:
            raise RuntimeError("injected reconcile failure")
        return real_reconcile(name, generation)

    mi.reconcile_create = flaky
    repl.start()
    try:
        coordinator.create_index("poison")
        coordinator.create_index("healthy")
        deadline = time.monotonic() + 15
        while time.monotonic() < deadline and not mi.check_index_exists("healthy"):
            time.sleep(0.05)
        assert mi.check_index_exists("healthy")  # not wedged behind the poison op
        # The parked poison op is retried once the failure clears.
        deadline = time.monotonic() + 15
        while time.monotonic() < deadline and not mi.check_index_exists("poison"):
            time.sleep(0.1)
        assert mi.check_index_exists("poison")
    finally:
        repl.stop()
        mi.close()


class FlakyThenGoodCoordinator(MemoryCoordinator):
    """open_bootstrap fails twice, then serves the corpus."""

    def __init__(self, corpus):
        super().__init__(bootstrap_corpus=corpus)
        self.attempts = 0

    def open_bootstrap(self, index_name, generation):
        self.attempts += 1
        if self.attempts <= 2:
            raise errors.CoordinatorError("injected transient failure")
        return super().open_bootstrap(index_name, generation)


def test_corpus_seed_retries_instead_of_incomplete_replay(tmp_path):
    corpus = {("idx", 1): (40, [[Insert(id=i, hashes=[i, 321]) for i in range(1, 8)]])}
    coordinator = FlakyThenGoodCoordinator(corpus)
    node = Node(tmp_path / "a", coordinator)
    try:
        node.mi.create_index("idx")
        node.wait_exists("idx")
        node.wait_version("idx", 40, timeout=30)  # installed at the stream position
        assert coordinator.attempts >= 3  # retried through the failures
        assert len(search_ids(node, "idx", [321])) == 7  # full corpus, not a replay
    finally:
        node.close()


def test_truncated_corpus_stream_never_installs(tmp_path):
    """A stream that dies before its end marker must raise, not install a
    partial corpus (BootstrapStream contract)."""

    class TruncatingStream(BootstrapStream):
        position = 50

        def __init__(self):
            self.sent = 0

        def next_batch(self):
            if self.sent == 0:
                self.sent = 1
                return [Insert(id=1, hashes=[1])]
            raise errors.CoordinatorError("transport died mid-stream")

    mi = MultiIndex.open(str(tmp_path / "n"), checkpoint_age=None, sync=False)
    try:
        mi.create_index("idx")
        with pytest.raises(errors.CoordinatorError):
            mi.bootstrap_lineage_from_source("idx", 1, TruncatingStream())
        # The live index is untouched (still empty at version 0).
        assert mi.get_peer_status("idx")["version"] == 0
    finally:
        mi.close()
