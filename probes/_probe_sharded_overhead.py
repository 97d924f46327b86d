"""CPU-mesh relative overhead of the sharded serving program, 1 -> 8 shards.

Strong scaling on a FIXED corpus: the same postings partitioned across n
shards, timed per batch on a virtual n-device CPU mesh.  The interesting
number is not absolute qps (CPU lowering of the TPU program) but how the
per-batch cost moves with n: shard-local work shrinks ~1/n while the
all-gathered hit-list scoring (B x P x 12 bytes per shard, replicated
scoring) stays constant — the measured curve bounds the collective+score
overhead the v5e-8 projection in BASELINE.md must absorb.

Run: python probes/_probe_sharded_overhead.py  (forces CPU, 8 virtual devices)
"""
import os as _os, sys as _sys

_os.environ["AITPU_JAX_PLATFORMS"] = "cpu"
_os.environ["XLA_FLAGS"] = (
    _os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import time

import numpy as np

from acoustid_index_tpu.utils import jaxsetup  # noqa: F401  (applies platform)

import jax
import jax.numpy as jnp

from acoustid_index_tpu.engine.memseg import build_segment
from acoustid_index_tpu.engine.model import BulkInsert, SegmentInfo
from acoustid_index_tpu.engine.searcher import _params_for
from acoustid_index_tpu.engine.segments import Snapshot
from acoustid_index_tpu.parallel.sharded import (
    search_tiers,
    AXIS,
    Mesh,
    build_sharded_view,
    sharded_search_batch,
)

N_DOCS = 150_000
K = 24
BATCH = 32


def doc_hashes(ids, n):
    j = np.arange(n, dtype=np.uint32)
    with np.errstate(over="ignore"):
        h = ids.astype(np.uint32)[:, None] * np.uint32(2654435761)
        h = h + j[None, :] * np.uint32(0x27D4EB2F) + np.uint32(12345)
        h = h ^ (h >> np.uint32(13))
        h = h * np.uint32(0x85EBCA6B)
        h = h ^ (h >> np.uint32(16))
    return h.astype(np.uint32)


def main():
    devices = jax.devices()
    assert len(devices) >= 8 and devices[0].platform == "cpu", devices

    ids = np.arange(1, N_DOCS + 1, dtype=np.uint32)
    hs = doc_hashes(ids, K)
    offsets = np.arange(0, (N_DOCS + 1) * K, K, dtype=np.uint32)
    seg = build_segment(
        [BulkInsert(ids=ids, hashes=hs.reshape(-1), offsets=offsets)],
        SegmentInfo(commit_id=1),
    )
    snap = Snapshot(file=(seg,), memory=())
    params = _params_for(128)

    rng = np.random.default_rng(3)
    targets = rng.integers(1, N_DOCS + 1, BATCH, dtype=np.uint32)
    qs = np.zeros((BATCH, params.query_len), np.uint32)
    lens = np.zeros(BATCH, np.int32)
    for b, t in enumerate(targets):
        h = doc_hashes(np.array([t], np.uint32), K)[0]
        noise = rng.integers(0, 2**32, 100, dtype=np.uint32)
        q = np.unique(np.concatenate([h[:20], noise]))[: params.query_len]
        qs[b, : q.shape[0]] = q
        lens[b] = q.shape[0]
    limits = np.full(BATCH, 10, np.int32)
    min_scores = np.full(BATCH, 6, np.int32)
    pcts = np.full(BATCH, 10, np.int32)

    print(f"corpus {N_DOCS} docs x {K} = {N_DOCS*K/1e6:.0f}M postings; batch {BATCH}")
    base_ms = None
    for n in (1, 4, 8):
        mesh = Mesh(np.array(devices[:n]), (AXIS,))
        view = build_sharded_view(snap, mesh)
        f_t, m_t = search_tiers(view)

        def call(q_arr):
            return sharded_search_batch(
                params, mesh, f_t, m_t,
                q_arr, lens, limits, min_scores, pcts,
            )

        out = jax.device_get(call(qs))
        hit = float(np.mean(out["ids"][:, 0] == targets))
        assert hit > 0.95, (n, hit)
        reps = []
        for r in range(5):
            q_t = qs + np.uint32(r & 1)
            t0 = time.time()
            jax.block_until_ready(call(q_t))
            reps.append(time.time() - t0)
        ms = sorted(reps)[len(reps) // 2] * 1000
        if base_ms is None:
            base_ms = ms
        print(
            f"shards={n}: {ms:8.1f} ms/batch  (x{base_ms/ms:4.2f} vs shards=1, "
            f"hit {hit:.3f})"
        )


if __name__ == "__main__":
    main()
