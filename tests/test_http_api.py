"""End-to-end HTTP API tests against the real server subprocess, modeled on
the reference's pytest e2e strategy (SURVEY.md §4): CRUD, exact search
scores, content negotiation, restart persistence (soft and SIGKILL),
optimistic versioning, metrics."""

import json

import msgpack
import pytest
import requests

from server_fixture import Server, post_search

MSGPACK_CT = "application/vnd.msgpack"


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    s = Server(tmp_path_factory.mktemp("data"), extra_args=["--checkpoint-age-ms", "0"])
    s.start()
    yield s
    s.stop()


_counter = [0]


@pytest.fixture
def index(server):
    _counter[0] += 1
    name = f"t{_counter[0]:04d}"
    r = requests.put(server.url(f"/{name}"))
    assert r.status_code == 200, r.text
    yield name
    requests.delete(server.url(f"/{name}"))


def test_health(server):
    assert requests.get(server.url("/_health")).text == "OK\n"
    assert requests.head(server.url("/_health")).status_code == 200


def test_index_lifecycle(server):
    name = "lifecycle"
    assert requests.head(server.url(f"/{name}")).status_code == 404
    assert requests.get(server.url(f"/{name}/_health")).status_code == 404

    r = requests.put(server.url(f"/{name}"))
    assert r.status_code == 200
    body = r.json()
    assert body["ready"] is True and body["generation"] == 1

    # Idempotent create.
    assert requests.put(server.url(f"/{name}")).status_code == 200
    # Optimistic create conflict.
    r = requests.put(server.url(f"/{name}"), json={"expect_does_not_exist": True})
    assert r.status_code == 409
    assert r.json()["error"] == "IndexAlreadyExists"

    assert requests.head(server.url(f"/{name}")).status_code == 200
    assert requests.get(server.url(f"/{name}/_health")).text == "OK\n"

    info = requests.get(server.url(f"/{name}")).json()
    assert info["version"] == 0
    assert info["stats"]["num_docs"] == 0

    r = requests.delete(server.url(f"/{name}"))
    assert r.status_code == 200 and r.json()["deleted"] is True
    assert requests.head(server.url(f"/{name}")).status_code == 404
    # Delete of a missing index: ok unless expected.
    assert requests.delete(server.url(f"/{name}")).json()["deleted"] is False
    r = requests.delete(server.url(f"/{name}"), json={"expect_exists": True})
    assert r.status_code == 404

    # Recreate bumps the generation (lineages never mix).
    r = requests.put(server.url(f"/{name}"))
    assert r.json()["generation"] == 2
    requests.delete(server.url(f"/{name}"))


def test_invalid_index_names(server):
    for bad in ("a.b", "a/b", "a%20b"):
        r = requests.put(server.url(f"/{bad}"))
        assert r.status_code in (400, 404), bad


def test_fingerprint_crud_and_search(server, index):
    u = server.url
    r = requests.put(u(f"/{index}/1"), json={"hashes": [100, 200, 300]})
    assert r.status_code == 200, r.text
    r = requests.put(u(f"/{index}/2"), json={"hashes": [200, 300, 400]})
    assert r.status_code == 200

    assert requests.head(u(f"/{index}/1")).status_code == 200
    assert requests.head(u(f"/{index}/99")).status_code == 404
    assert requests.get(u(f"/{index}/1")).json()["version"] == 1

    r = post_search(u(f"/{index}/_search"), json={"query": [100, 200, 300]})
    assert r.status_code == 200
    results = r.json()["results"]
    assert results[0] == {"id": 1, "score": 3}

    # Exact scoring: doc 2 intersects on 200,300.
    r = post_search(u(f"/{index}/_search"), json={"query": [200, 300, 400], "min_score": 1, "score_pct": 0})
    assert [x["id"] for x in r.json()["results"]] == [2, 1]

    requests.delete(u(f"/{index}/1"))
    assert requests.head(u(f"/{index}/1")).status_code == 404
    assert requests.get(u(f"/{index}/1")).status_code == 404
    r = post_search(u(f"/{index}/_search"), json={"query": [100, 200, 300], "score_pct": 0})
    assert [x["id"] for x in r.json()["results"]] == [2]


def test_update_batch_and_versioning(server, index):
    u = server.url
    r = requests.post(
        u(f"/{index}/_update"),
        json={
            "changes": [
                {"insert": {"id": 10, "hashes": [1, 2, 3]}},
                {"insert": {"id": 11, "hashes": [2, 3, 4]}},
                {"delete": {"id": 10}},
            ]
        },
    )
    assert r.status_code == 200
    v = r.json()["version"]
    assert v == 1

    # Optimistic versioning.
    r = requests.post(
        u(f"/{index}/_update"),
        json={"changes": [{"insert": {"id": 12, "hashes": [9]}}], "expected_version": 0},
    )
    assert r.status_code == 409 and r.json()["error"] == "VersionMismatch"
    r = requests.post(
        u(f"/{index}/_update"),
        json={"changes": [{"insert": {"id": 12, "hashes": [9]}}], "expected_version": v},
    )
    assert r.status_code == 200 and r.json()["version"] == v + 1

    # Deleted-in-batch doc is invisible.
    r = post_search(u(f"/{index}/_search"), json={"query": [1, 2, 3], "score_pct": 0})
    assert [x["id"] for x in r.json()["results"]] == [11]

    # id 0 is rejected.
    r = requests.post(u(f"/{index}/_update"), json={"changes": [{"insert": {"id": 0, "hashes": [1]}}]})
    assert r.status_code == 400 and r.json()["error"] == "InvalidFingerprintId"


def test_metadata(server, index):
    u = server.url
    requests.post(
        u(f"/{index}/_update"),
        json={"changes": [{"insert": {"id": 1, "hashes": [5]}}], "metadata": {"foo": "bar"}},
    )
    info = requests.get(u(f"/{index}")).json()
    assert info["metadata"] == {"foo": "bar"}


def test_content_negotiation_msgpack(server, index):
    u = server.url
    # msgpack request with single-char keys; msgpack response mirrors.
    body = msgpack.packb({"c": [{"i": {"i": 7, "h": [42, 43]}}]})
    r = requests.post(u(f"/{index}/_update"), data=body, headers={"Content-Type": MSGPACK_CT})
    assert r.status_code == 200, r.text
    assert r.headers["Content-Type"].startswith(MSGPACK_CT)
    assert msgpack.unpackb(r.content) == {"v": 1}

    q = msgpack.packb({"q": [42, 43], "s": 0})
    r = post_search(u(f"/{index}/_search"), data=q, headers={"Content-Type": MSGPACK_CT})
    assert msgpack.unpackb(r.content) == {"r": [{"i": 7, "s": 2}]}

    # Explicit Accept overrides: msgpack body, JSON answer.
    r = post_search(
        u(f"/{index}/_search"), data=q, headers={"Content-Type": MSGPACK_CT, "Accept": "application/json"}
    )
    assert r.json() == {"results": [{"id": 7, "score": 2}]}

    # A body with no Content-Type defaults to msgpack.
    r = post_search(u(f"/{index}/_search"), data=q)
    assert msgpack.unpackb(r.content) == {"r": [{"i": 7, "s": 2}]}

    # Unsupported media type.
    r = post_search(u(f"/{index}/_search"), data=b"x", headers={"Content-Type": "text/csv"})
    assert r.status_code == 415

    # Error bodies are negotiated too.
    r = post_search(
        u(f"/{index}/_search"), data=msgpack.packb({"q": "notalist"}), headers={"Content-Type": MSGPACK_CT}
    )
    assert r.status_code == 400
    assert msgpack.unpackb(r.content) == {"e": "BadRequest"}


def test_search_limits_sanitized(server, index):
    u = server.url
    for i in range(1, 30):
        requests.put(u(f"/{index}/{i}"), json={"hashes": [777]})
    r = post_search(u(f"/{index}/_search"), json={"query": [777], "limit": 100000, "score_pct": 0, "min_score": 1})
    assert len(r.json()["results"]) == 29  # capped at 100, not 100000
    r = post_search(u(f"/{index}/_search"), json={"query": [777], "limit": 0, "score_pct": 0})
    assert len(r.json()["results"]) == 1  # clamped up to 1


def test_search_param_validation(server, index):
    u = server.url
    # Non-numeric tuning values are a 400 BadRequest, not a 500.
    for body in (
        {"query": [1], "min_score": "abc"},
        {"query": [1], "score_pct": "xyz"},
        {"query": [1], "limit": "huge"},
        {"query": [1, "nope"]},
        {"query": [1, -5]},
        {"query": [2**40]},
    ):
        r = post_search(u(f"/{index}/_search"), json=body)
        assert r.status_code == 400, (body, r.status_code, r.text)
        assert r.json()["error"] == "BadRequest"


def test_missing_index_errors(server):
    u = server.url
    r = post_search(u("/nosuch/_search"), json={"query": [1]})
    assert r.status_code == 404 and r.json()["error"] == "IndexNotFound"
    r = requests.post(u("/nosuch/_update"), json={"changes": []})
    assert r.status_code == 404


def test_metrics_endpoint(server, index):
    u = server.url
    requests.put(u(f"/{index}/1"), json={"hashes": [1]})
    post_search(u(f"/{index}/_search"), json={"query": [1]})
    text = requests.get(u("/_metrics")).text
    assert f'aitpu_searches_total{{index="{index}"}}' in text
    assert "aitpu_search_seconds_bucket" in text
    # The per-hash scan histogram (the reference's scanned-docs-per-hash
    # load-skew signal, metrics.zig:96-101) records real observations.
    assert "aitpu_scanned_postings_per_hash_bucket" in text
    count_line = next(
        l for l in text.splitlines() if l.startswith("aitpu_scanned_postings_per_hash_count")
    )
    assert int(count_line.split()[-1]) >= 1


def test_persistence_across_restarts(tmp_path):
    s = Server(tmp_path / "data", extra_args=["--checkpoint-threshold", "50", "--checkpoint-age-ms", "0"])
    s.start()
    try:
        u = s.url
        requests.put(u("/persist"))
        for i in range(1, 40):
            requests.put(u(f"/persist/{i}"), json={"hashes": [i, i + 1, 1000]})
        want = post_search(u("/persist/_search"), json={"query": [1000, 5, 6], "score_pct": 0, "min_score": 1}).json()
        assert want["results"]

        s.restart()  # soft
        got = post_search(s.url("/persist/_search"), json={"query": [1000, 5, 6], "score_pct": 0, "min_score": 1}).json()
        assert got == want

        for i in range(40, 60):
            requests.put(s.url(f"/persist/{i}"), json={"hashes": [i, i + 1, 1000]})
        want2 = post_search(s.url("/persist/_search"), json={"query": [1000, 45], "score_pct": 0, "min_score": 1}).json()

        s.restart(hard=True)  # SIGKILL
        got2 = post_search(s.url("/persist/_search"), json={"query": [1000, 45], "score_pct": 0, "min_score": 1}).json()
        assert got2 == want2
        info = requests.get(s.url("/persist")).json()
        assert info["stats"]["num_docs"] >= 59
    finally:
        s.stop()
