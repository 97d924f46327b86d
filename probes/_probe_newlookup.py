"""Fori-slope of the serving program after the resident top-index kernel +
single-operand main pass with straddle fixup.  Compare against the 8.3ms
baseline measured pre-change."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import time

import numpy as np

import jax
import jax.numpy as jnp

from bench import BATCH, N_DOCS, device_qps_fori, make_queries
from acoustid_index_tpu.engine.searcher import _params_for
from acoustid_index_tpu.ops.search_kernel import (
    pack_inputs_np,
    search_segments_batch,
)
from bench import kernel_bench  # noqa: F401  (not used; keep import graph warm)


def main():
    from acoustid_index_tpu.ops.build import sort_postings

    t0 = time.time()

    @jax.jit
    def make_table():
        ids = jnp.arange(1, N_DOCS + 1, dtype=jnp.uint32)
        j = jnp.arange(24, dtype=jnp.uint32)
        h = ids[:, None] * jnp.uint32(2654435761)
        h = h + j[None, :] * jnp.uint32(0x27D4EB2F) + jnp.uint32(12345)
        h = h ^ (h >> jnp.uint32(13))
        h = h * jnp.uint32(0x85EBCA6B)
        h = h ^ (h >> jnp.uint32(16))
        hashes = h.reshape(-1)
        docids = jnp.broadcast_to(ids[:, None], (N_DOCS, 24)).reshape(-1)
        return sort_postings(hashes, docids, hashes.shape[0])

    h_sorted, d_sorted = make_table()
    h_sorted.block_until_ready()
    print(f"table built {time.time()-t0:.0f}s", flush=True)

    n_postings = N_DOCS * 24
    cap = 1
    while cap < n_postings:
        cap *= 2

    def pad(a, size, fill):
        out = jnp.full((size,), fill, a.dtype)
        return out.at[: a.shape[0]].set(a)

    ids_host = np.arange(1, N_DOCS + 1, dtype=np.uint32)
    hashes_padded = pad(h_sorted, cap, jnp.uint32(0xFFFFFFFF))
    file_tier = {
        "hashes": hashes_padded,
        "docids": pad(d_sorted, cap, jnp.uint32(0xFFFFFFFF)),
        "block_index": hashes_padded[::1024],
        "seg_start": jnp.zeros(1, jnp.int32),
        "seg_len": jnp.zeros(1, jnp.int32).at[0].set(n_postings),
        "mention_ids": pad(jnp.asarray(ids_host), 1 << 24, jnp.uint32(0xFFFFFFFF)),
        "mention_ord": jnp.zeros(1 << 24, jnp.int32),
        "mention_len": jnp.int32(N_DOCS),
    }
    mem_tier = {
        "hashes": jnp.full(1024, 0xFFFFFFFF, jnp.uint32),
        "docids": jnp.full(1024, 0xFFFFFFFF, jnp.uint32),
        "block_index": jnp.full(1, 0xFFFFFFFF, jnp.uint32),
        "seg_start": jnp.zeros(1, jnp.int32),
        "seg_len": jnp.zeros(1, jnp.int32),
        "mention_ids": jnp.full(1024, 0xFFFFFFFF, jnp.uint32),
        "mention_ord": jnp.full(1024, -1, jnp.int32),
        "mention_len": jnp.int32(0),
    }

    params = _params_for(128)
    rngq = np.random.default_rng(17)
    limits = np.full(BATCH, 10, np.int32)
    min_scores = np.full(BATCH, 6, np.int32)
    pcts = np.full(BATCH, 10, np.int32)

    targets, qs, lens = make_queries(rngq, BATCH, params.query_len, N_DOCS)
    t0 = time.time()
    out = jax.device_get(
        search_segments_batch(params, file_tier, mem_tier, qs, lens, limits, min_scores, pcts)
    )
    print(f"compiled {time.time()-t0:.0f}s", flush=True)
    hit_rate = float(np.mean(out["ids"][:, 0] == targets))
    print(f"hit rate {hit_rate}", flush=True)
    assert hit_rate > 0.95, hit_rate

    targets, qs, lens = make_queries(rngq, BATCH, params.query_len, N_DOCS)
    qps = device_qps_fori(
        jax, params, file_tier, mem_tier, pack_inputs_np(qs, lens, limits, min_scores, pcts), BATCH
    )
    print(f"device fori-slope: {BATCH/qps*1000:.2f} ms/batch, {qps:.0f} qps", flush=True)


if __name__ == "__main__":
    main()
