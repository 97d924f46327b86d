"""Real multi-process cluster e2e: a coordinator subprocess plus replica
subprocesses on free ports, driven over HTTP (mirrors the reference's
tests/test_cluster.py strategy): create propagation, read-your-writes,
metadata replication, delete/recreate convergence, peer status, bootstrap
from a peer after retention truncation."""

import time

import pytest
import requests

from server_fixture import Server, post_search


class Coordinator(Server):
    def __init__(self, data_dir):
        super().__init__(data_dir, extra_args=["--coordinator"])


def wait_until(fn, timeout=30, what="condition"):
    deadline = time.time() + timeout
    last = None
    while time.time() < deadline:
        try:
            if fn():
                return
        except requests.RequestException as exc:
            last = exc
        time.sleep(0.1)
    raise AssertionError(f"timeout waiting for {what}: {last}")


@pytest.fixture
def cluster(tmp_path):
    coord = Coordinator(tmp_path / "coord").start()
    procs = [coord]

    def replica(name, peers=(), extra=("--checkpoint-age-ms", "0")):
        args = ["--coordinator-url", f"http://127.0.0.1:{coord.port}", *extra]
        if peers:
            args += ["--peers", ",".join(peers)]
        s = Server(tmp_path / name, extra_args=args)
        s.start()
        procs.append(s)
        return s

    yield coord, replica
    for p in procs:
        p.stop()


def test_cluster_end_to_end(cluster, tmp_path):
    coord, replica = cluster
    a = replica("a")
    b = replica("b")

    # Create on A propagates to B via the meta feed.
    r = requests.put(a.url("/idx"))
    assert r.status_code == 200, r.text
    gen = r.json()["generation"]
    wait_until(lambda: requests.head(b.url("/idx")).status_code == 200, what="create on b")

    # Read-your-writes on A; async convergence on B.
    r = requests.put(a.url("/idx/1"), json={"hashes": [10, 20, 30]})
    assert r.status_code == 200, r.text
    got = post_search(a.url("/idx/_search"), json={"query": [10, 20, 30], "score_pct": 0}).json()
    assert got["results"] == [{"id": 1, "score": 3}]
    wait_until(
        lambda: post_search(b.url("/idx/_search"), json={"query": [10, 20, 30], "score_pct": 0}).json().get("results")
        == [{"id": 1, "score": 3}],
        what="data on b",
    )

    # Writes via B work too (routed through the coordinator).
    r = requests.put(b.url("/idx/2"), json={"hashes": [20, 30, 40]})
    assert r.status_code == 200, r.text
    wait_until(
        lambda: requests.head(a.url("/idx/2")).status_code == 200,
        what="b's write on a",
    )

    # Metadata replicates like data.
    requests.post(a.url("/idx/_update"), json={"changes": [], "metadata": {"k": "v"}})
    wait_until(
        lambda: requests.get(b.url("/idx")).json().get("metadata") == {"k": "v"},
        what="metadata on b",
    )

    # Peer status exposes replication watermarks.
    st = requests.get(a.url("/idx/_status")).json()
    assert st["generation"] == gen
    assert st["version"] >= 3

    # Delete/recreate bumps the generation everywhere; lineages never mix.
    requests.delete(a.url("/idx"))
    wait_until(lambda: requests.head(b.url("/idx")).status_code == 404, what="delete on b")
    # The recreate can race b's meta consumer still digesting the delete —
    # a transient non-200 is retryable, like the reference e2e treats
    # 503-while-bootstrapping as "poll on".
    r = None
    deadline = time.time() + 30
    while time.time() < deadline:
        r = requests.put(b.url("/idx"))
        if r.status_code == 200:
            break
        time.sleep(0.2)
    assert r is not None and r.status_code == 200, (r.status_code, r.text)
    gen2 = r.json()["generation"]
    assert gen2 > gen
    wait_until(lambda: requests.head(a.url("/idx")).status_code == 200, what="recreate on a")
    requests.put(b.url("/idx/5"), json={"hashes": [50]})
    wait_until(
        lambda: post_search(a.url("/idx/_search"), json={"query": [50], "score_pct": 0}).json().get("results")
        == [{"id": 5, "score": 1}],
        what="fresh lineage data on a",
    )
    got = post_search(a.url("/idx/_search"), json={"query": [10, 20, 30], "score_pct": 0}).json()
    assert got["results"] == []  # old lineage's data is gone


def test_cluster_coordinator_restart_durable(tmp_path):
    """A SIGKILLed coordinator restarted with --coordinator-dir resumes the
    exact changelog: existing replicas keep writing at the same versions,
    and a fresh replica replays the full pre-crash history."""
    cdir = str(tmp_path / "coordlog")
    coord = Server(
        tmp_path / "coord", extra_args=["--coordinator", "--coordinator-dir", cdir]
    ).start()
    procs = [coord]
    try:
        a = Server(
            tmp_path / "a",
            extra_args=[
                "--coordinator-url",
                f"http://127.0.0.1:{coord.port}",
                "--checkpoint-age-ms",
                "0",
            ],
        ).start()
        procs.append(a)

        requests.put(a.url("/idx"))
        gen = requests.get(a.url("/idx/_status")).json()["generation"]
        for i in range(1, 6):
            r = requests.put(a.url(f"/idx/{i}"), json={"hashes": [i, 500]})
            assert r.status_code == 200, r.text

        # Hard-kill the coordinator and bring it back on the SAME port.
        port = coord.port
        coord.stop(hard=True)
        coord.extra_args += ["--port", str(port)]
        coord.start()

        # The generation assignment survived: recreate attempts are idempotent
        # (same active generation), and writes resume at the next version.
        wait_until(
            lambda: requests.put(
                a.url("/idx/6"), json={"hashes": [6, 500]}, timeout=5
            ).status_code
            == 200,
            what="write after coordinator restart",
            timeout=60,
        )
        st = requests.get(a.url("/idx/_status")).json()
        assert st["generation"] == gen

        # A fresh replica must replay the FULL pre-crash history from the
        # durable changelog.
        b = Server(
            tmp_path / "b",
            extra_args=[
                "--coordinator-url",
                f"http://127.0.0.1:{coord.port}",
                "--checkpoint-age-ms",
                "0",
            ],
        ).start()
        procs.append(b)
        wait_until(
            lambda: post_search(
                b.url("/idx/_search"), json={"query": [500, 3], "score_pct": 0, "min_score": 1}
            )
            .json()
            .get("results"),
            what="pre-crash data on b",
            timeout=60,
        )
        got = post_search(
            b.url("/idx/_search"), json={"query": [500], "score_pct": 0, "min_score": 1}
        ).json()
        assert {r["id"] for r in got["results"]} == {1, 2, 3, 4, 5, 6}
    finally:
        for p in procs:
            p.stop()


def test_cluster_bootstrap_from_peer(cluster):
    coord, replica = cluster
    # Aggressive checkpointing so A's file_version (the donor watermark)
    # covers the writes quickly.
    a = replica("a", extra=("--checkpoint-threshold", "10", "--checkpoint-age-ms", "500"))

    requests.put(a.url("/idx"))
    version = 0
    for i in range(1, 25):
        r = requests.post(
            a.url("/idx/_update"),
            json={"changes": [{"insert": {"id": i, "hashes": [i, 777]}}]},
        )
        version = r.json()["version"]

    # Make A's state durable so its snapshot covers everything.
    wait_until(
        lambda: requests.get(a.url("/idx/_status")).json()["file_version"] >= version,
        what="a file_version",
        timeout=60,
    )
    gen = requests.get(a.url("/idx/_status")).json()["generation"]

    # Truncate the changelog below `version`: replay is no longer possible.
    r = requests.post(
        f"http://127.0.0.1:{coord.port}/_truncate/idx/{gen}", params={"floor": version}
    )
    assert r.status_code == 200, r.text

    # A fresh node must bootstrap from A's snapshot, then keep consuming.
    c = replica("c", peers=[f"http://127.0.0.1:{a.port}"])
    wait_until(lambda: requests.head(c.url("/idx")).status_code == 200, what="create on c", timeout=60)
    wait_until(
        lambda: requests.get(c.url("/idx/_health")).status_code == 200
        and requests.get(c.url("/idx/_status")).json()["version"] >= version,
        what="c bootstrapped",
        timeout=90,
    )
    got = post_search(c.url("/idx/_search"), json={"query": [777, 5], "score_pct": 0, "min_score": 1}).json()
    want = post_search(a.url("/idx/_search"), json={"query": [777, 5], "score_pct": 0, "min_score": 1}).json()
    assert got == want and want["results"]

    # New writes still reach the bootstrapped node.
    requests.put(a.url("/idx/99"), json={"hashes": [999]})
    wait_until(
        lambda: post_search(c.url("/idx/_search"), json={"query": [999], "score_pct": 0}).json().get("results")
        == [{"id": 99, "score": 1}],
        what="post-bootstrap consumption on c",
    )
