"""Sub-attribution of the plan/ranges phase at serving shapes (10M docs,
B=256, Q=128, S=1): mini+resident top-index search, + main single-block
scan, + straddle fixup, vs the full tier_ranges_blocked.  Fori-slope timing
(see bench.device_qps_fori)."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import functools
import time

import numpy as np

import jax
import jax.numpy as jnp

from bench import BATCH, N_DOCS, make_queries
from acoustid_index_tpu.engine.searcher import _params_for
from acoustid_index_tpu.ops.build import sort_postings
from probes._pairkernel import block_lookup_pair
from acoustid_index_tpu.ops.pallas_lookup import (
    BLOCK,
    block_lookup,
    block_lookup_resident,
    tier_ranges_blocked,
)


def main():
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

    h_sorted, _d = make_table()
    h_sorted.block_until_ready()
    print(f"table built {time.time()-t0:.0f}s", flush=True)

    n_postings = N_DOCS * 24
    cap = 1
    while cap < n_postings:
        cap *= 2
    hashes_padded = jnp.full((cap,), 0xFFFFFFFF, jnp.uint32).at[:n_postings].set(h_sorted)
    tier = {
        "hashes": hashes_padded,
        "block_index": hashes_padded[::BLOCK],
        "seg_start": jnp.zeros(1, jnp.int32),
        "seg_len": jnp.zeros(1, jnp.int32).at[0].set(n_postings),
    }

    params = _params_for(128)
    Q = params.query_len
    rngq = np.random.default_rng(17)
    _, qs, lens = make_queries(rngq, BATCH, Q, N_DOCS)
    qs_np = qs

    nblk = tier["block_index"].shape[0]
    nblk_pad = -(-nblk // BLOCK) * BLOCK

    def stage_resident(t, queries, valid_q):
        qf = queries.reshape(-1)
        bi = t["block_index"]
        if nblk_pad != nblk:
            bi = jnp.concatenate([bi, jnp.full(nblk_pad - nblk, 0xFFFFFFFF, bi.dtype)])
        mini = bi[::BLOCK]
        ub2 = jnp.sum((mini[None, :] <= qf[:, None]).astype(jnp.int32), axis=1)
        c = jnp.clip(ub2 - 1, 0, mini.shape[0] - 1)
        lo_c, cnt_c = block_lookup_resident(bi, c, qf)
        return lo_c, cnt_c

    def phase_resident(t, queries, valid_q):
        lo_c, cnt_c = stage_resident(t, queries, valid_q)
        return jnp.sum(lo_c.astype(jnp.uint32)) + jnp.sum(cnt_c.astype(jnp.uint32))

    def phase_main(t, queries, valid_q):
        lo_c, cnt_c = stage_resident(t, queries, valid_q)
        ub = lo_c + cnt_c
        blk = jnp.clip(ub - 1, 0, nblk - 1).astype(jnp.int32)
        live = valid_q.reshape(-1)
        blk_main = jnp.where(live, blk, 0)
        qf = queries.reshape(-1)
        lo_m, cnt_m = block_lookup(t["hashes"], blk_main, qf)
        return jnp.sum(lo_m.astype(jnp.uint32)) + jnp.sum(cnt_m.astype(jnp.uint32))

    def phase_full(t, queries, valid_q):
        lo, cnt, trunc = tier_ranges_blocked(t, queries, valid_q, params.per_hash_cap)
        return (
            jnp.sum(lo.astype(jnp.uint32))
            + jnp.sum(cnt.astype(jnp.uint32))
            + trunc.astype(jnp.uint32)
        )

    def slope(fn, label):
        @functools.partial(jax.jit, static_argnums=(0, 1))
        def run_k(k, f, t, qs0):
            def body(i, acc):
                q2 = qs0 + (acc & jnp.uint32(1))
                valid = jnp.broadcast_to(
                    jnp.arange(Q, dtype=jnp.int32)[None, :] < jnp.int32(120), q2.shape
                )
                return acc + f(t, q2, valid)

            return jax.lax.fori_loop(0, k, body, jnp.uint32(0))

        warm = jax.device_put(jnp.asarray(qs_np))
        timed = jax.device_put(jnp.asarray(qs_np + np.uint32(1)))
        times = {}
        for k in (2, 12):
            int(jax.device_get(run_k(k, fn, tier, warm)))
            t0 = time.time()
            int(jax.device_get(run_k(k, fn, tier, timed)))
            times[k] = time.time() - t0
        per = max((times[12] - times[2]) / 10, 1e-9)
        print(f"{label}: {per*1000:.2f} ms/batch", flush=True)

    slope(phase_resident, "mini+resident")
    slope(phase_main, "mini+resident+main")
    slope(phase_full, "full tier_ranges_blocked")


if __name__ == "__main__":
    main()
