"""Host-side serving-pipeline attribution: drive BatchingSearcher open-loop
against a device-built 10M table and time every pipeline stage separately
(submit, claim+pack, launch dispatch, device_get, resolve, materialize).

Separates tunnel RTT (device_get wall) from host CPU work (everything
else) — the breakdown VERDICT r2 #1 asks for.
"""
import functools
import os
import sys
import threading
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from bench import BATCH, HASHES_PER_DOC, N_DOCS, NOISE_HASHES, doc_hashes
from acoustid_index_tpu.engine.searcher import (
    BATCH_SIZES,
    BatchingSearcher,
    _params_for,
)
from acoustid_index_tpu.engine.model import SearchOptions
from acoustid_index_tpu.engine.segments import Snapshot
from acoustid_index_tpu.ops.build import sort_postings

DOCS = int(os.environ.get("PROBE_DOCS", N_DOCS))
SECONDS = float(os.environ.get("PROBE_SECONDS", 20))
INFLIGHT = int(os.environ.get("PROBE_INFLIGHT", 2048))


@jax.jit
def make_table():
    ids = jnp.arange(1, DOCS + 1, dtype=jnp.uint32)
    j = jnp.arange(HASHES_PER_DOC, dtype=jnp.uint32)
    h = ids[:, None] * jnp.uint32(2654435761)
    h = h + j[None, :] * jnp.uint32(0x27D4EB2F) + jnp.uint32(12345)
    h = h ^ (h >> jnp.uint32(13)); h = h * jnp.uint32(0x85EBCA6B); h = h ^ (h >> jnp.uint32(16))
    hashes = h.reshape(-1)
    docids = jnp.broadcast_to(ids[:, None], (DOCS, HASHES_PER_DOC)).reshape(-1)
    return sort_postings(hashes, docids, hashes.shape[0])


def build_views():
    h_sorted, d_sorted = make_table()
    h_sorted.block_until_ready()
    n_postings = DOCS * HASHES_PER_DOC
    cap = 1
    while cap < n_postings:
        cap *= 2

    def pad(a, size, fill):
        out = jnp.full((size,), fill, a.dtype)
        return out.at[: a.shape[0]].set(a)

    hp = pad(h_sorted, cap, jnp.uint32(0xFFFFFFFF))
    file_view = {
        "hashes": hp,
        "docids": pad(d_sorted, cap, jnp.uint32(0xFFFFFFFF)),
        "block_index": hp[::1024],
        "seg_start": jnp.zeros(1, jnp.int32),
        "seg_len": jnp.zeros(1, jnp.int32).at[0].set(n_postings),
        "docs_len": jnp.zeros(1, jnp.int32).at[0].set(DOCS),
        "mention_ids": pad(jnp.arange(1, DOCS + 1, dtype=jnp.uint32), 1 << 24, jnp.uint32(0xFFFFFFFF)),
        "mention_ord": jnp.zeros(1 << 24, jnp.int32),
        "mention_len": jnp.int32(DOCS),
        "view_token": 1,
    }
    mem_view = {
        "hashes": jnp.full(1024, 0xFFFFFFFF, jnp.uint32),
        "docids": jnp.full(1024, 0xFFFFFFFF, jnp.uint32),
        "block_index": jnp.full(1, 0xFFFFFFFF, jnp.uint32),
        "seg_start": jnp.zeros(1, jnp.int32),
        "seg_len": jnp.zeros(1, jnp.int32),
        "docs_len": jnp.zeros(1, jnp.int32),
        "mention_ids": jnp.full(1024, 0xFFFFFFFF, jnp.uint32),
        "mention_ord": jnp.full(1024, -1, jnp.int32),
        "mention_len": jnp.int32(0),
        "view_token": 2,
    }
    return Snapshot(file_view=file_view, mem_view=mem_view)


class Stat:
    __slots__ = ("t", "n")

    def __init__(self):
        self.t = 0.0
        self.n = 0

    def add(self, dt):
        self.t += dt
        self.n += 1

    def __repr__(self):
        if not self.n:
            return "n=0"
        return f"n={self.n} total={self.t*1000:.0f}ms avg={self.t/self.n*1e3:.3f}ms"


STATS = {k: Stat() for k in ("pack", "launch", "get", "resolve", "submit")}
BATCH_HIST = {}


class TimedSearcher(BatchingSearcher):
    def _launch(self, snapshot, params, packed_in):
        t0 = time.perf_counter()
        h = super()._launch(snapshot, params, packed_in)
        STATS["launch"].add(time.perf_counter() - t0)
        b = packed_in.shape[0]
        BATCH_HIST[b] = BATCH_HIST.get(b, 0) + 1
        return h

    @staticmethod
    def _pack_rows(params, rows, b):
        t0 = time.perf_counter()
        out = BatchingSearcher._pack_rows(params, rows, b)
        STATS["pack"].add(time.perf_counter() - t0)
        return out

    def _collect_loop(self):
        while True:
            item = self._collect_q.get()
            if item is None:
                return
            handle, params, batch = item
            try:
                t0 = time.perf_counter()
                packed = np.asarray(jax.device_get(handle))
                t1 = time.perf_counter()
                STATS["get"].add(t1 - t0)
                for i, req in enumerate(batch):
                    req.row = packed[i]
                    req.snapshot = None
                    req.done.set()
                STATS["resolve"].add(time.perf_counter() - t1)
            except Exception as exc:  # noqa: BLE001
                for req in batch:
                    req.error = exc
                    req.done.set()
            finally:
                with self._qlock:
                    self._inflight -= 1
                self._inflight_sem.release()


def main():
    snapshot = build_views()
    searcher = TimedSearcher()
    options = SearchOptions(max_results=40, min_score=6, min_score_pct=10)

    rng = np.random.default_rng(5)
    n_q = 8192
    targets = rng.integers(1, DOCS + 1, n_q, dtype=np.uint32)
    hs_all = doc_hashes(targets, HASHES_PER_DOC)
    noise = rng.integers(0, 2**32, (n_q, NOISE_HASHES), dtype=np.uint32)
    qs = [
        (int(targets[i]), np.unique(np.concatenate([hs_all[i, :20], noise[i]])).tolist())
        for i in range(n_q)
    ]

    # Warm every batch bucket.
    params = _params_for(128)
    padded0 = np.zeros(128, np.uint32)
    q0 = np.asarray(qs[0][1], np.uint32)
    padded0[: q0.shape[0]] = q0
    req0 = (padded0, int(q0.shape[0]), options)
    for b in BATCH_SIZES:
        searcher._run_batch_traced(snapshot, params, [req0] * b)
    print("warm done", flush=True)
    for s in STATS.values():
        s.t, s.n = 0.0, 0
    BATCH_HIST.clear()

    import queue

    sem = threading.BoundedSemaphore(INFLIGHT)
    handles = queue.Queue()
    stop_t = time.time() + SECONDS
    n_sub, n_reap = 4, 6
    done = [0] * n_reap
    miss = [0] * n_reap

    def submitter(k):
        r = np.random.default_rng(7000 + k)
        while time.time() < stop_t:
            sem.acquire()
            t, q = qs[int(r.integers(0, n_q))]
            t0 = time.perf_counter()
            h = searcher.submit(snapshot, q, options)
            STATS["submit"].add(time.perf_counter() - t0)
            handles.put((t, h))

    def reaper(k):
        while True:
            item = handles.get()
            if item is None:
                return
            t, h = item
            res, _ = h.result()
            sem.release()
            if not res or res[0].id != t:
                miss[k] += 1
            done[k] += 1

    subs = [threading.Thread(target=submitter, args=(i,)) for i in range(n_sub)]
    reaps = [threading.Thread(target=reaper, args=(i,)) for i in range(n_reap)]
    t0 = time.time()
    for t in subs + reaps:
        t.start()
    for t in subs:
        t.join()
    for _ in reaps:
        handles.put(None)
    for t in reaps:
        t.join()
    wall = time.time() - t0
    total = sum(done)
    print(f"open-loop: {total} queries in {wall:.1f}s = {total/wall:.0f} qps, miss={sum(miss)}")
    print(f"in-flight cap {INFLIGHT}, MAX_IN_FLIGHT={searcher.MAX_IN_FLIGHT}, collectors={searcher.COLLECTORS}")
    for k, s in STATS.items():
        print(f"  {k}: {s}")
    print(f"  batch sizes: {dict(sorted(BATCH_HIST.items()))}")
    n_batches = sum(BATCH_HIST.values())
    if n_batches:
        print(f"  {n_batches} batches, avg size {total/max(n_batches,1):.1f}, "
              f"wall/batch {wall/n_batches*1000:.2f}ms")
    searcher.close()


if __name__ == "__main__":
    main()
