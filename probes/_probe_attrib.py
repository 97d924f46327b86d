"""Forced-execution phase attribution of the serving program at bench shapes
(10M docs, B=256, Q=128, steady state: 1 file segment, empty memory tier).
Each phase prefix is timed by fori-loop slope (K=2 vs K=12) with the inputs
perturbed per iteration by the previous result, so nothing can be elided or
deduped by the axon client."""
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
from acoustid_index_tpu.ops.search_kernel import (
    P_SMALL,
    _batch_ranges,
    _plan_and_gather,
    _score_rank,
    _search_batch_impl,
    pack_inputs_np,
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
    _, qs, lens = make_queries(rngq, BATCH, params.query_len, N_DOCS)
    pin_np = pack_inputs_np(qs, lens, limits, min_scores, pcts)

    import dataclasses

    p_small = dataclasses.replace(params, postings_budget=P_SMALL)
    Q = params.query_len

    def phase_ranges(p, ft, mt, queries, q_lens, min_sc):
        f_lo, f_cnt, m_lo, m_cnt, trunc = _batch_ranges(p, ft, mt, queries, q_lens)
        return (
            jnp.sum(f_lo.astype(jnp.uint32))
            + jnp.sum(f_cnt.astype(jnp.uint32))
            + trunc.astype(jnp.uint32)
        )

    def phase_gather(p, ft, mt, queries, q_lens, min_sc):
        f_lo, f_cnt, m_lo, m_cnt, trunc = _batch_ranges(p, ft, mt, queries, q_lens)

        def per_q(f_lo1, f_cnt1, m_lo1, m_cnt1):
            d, o, inv, total, over = _plan_and_gather(
                p_small, ft, mt, f_lo1, f_cnt1, m_lo1, m_cnt1, use_mem=False
            )
            return jnp.sum(d.astype(jnp.uint32)) + total.astype(jnp.uint32)

        return jnp.sum(jax.vmap(per_q)(f_lo, f_cnt, m_lo, m_cnt))

    def phase_rank(p, ft, mt, queries, q_lens, min_sc):
        f_lo, f_cnt, m_lo, m_cnt, trunc = _batch_ranges(p, ft, mt, queries, q_lens)

        def per_q(f_lo1, f_cnt1, m_lo1, m_cnt1, ms):
            d, o, inv, total, over = _plan_and_gather(
                p_small, ft, mt, f_lo1, f_cnt1, m_lo1, m_cnt1, use_mem=False
            )
            cd, co, csc, c_valid, c_over = _score_rank(p_small, d, o, inv, ms)
            return jnp.sum(cd) + jnp.sum(csc.astype(jnp.uint32))

        return jnp.sum(jax.vmap(per_q)(f_lo, f_cnt, m_lo, m_cnt, min_sc))

    def phase_full(p, ft, mt, queries, q_lens, min_sc):
        out = _search_batch_impl(
            p, ft, mt, queries, q_lens,
            jnp.full((BATCH,), 10, jnp.int32), min_sc, jnp.full((BATCH,), 10, jnp.int32),
        )
        return jnp.sum(out["ids"].astype(jnp.uint32))

    def slope(fn, label):
        @functools.partial(jax.jit, static_argnums=(0, 1))
        def run_k(k, f, ft, mt, pin):
            def body(i, acc):
                pin2 = pin.at[:, :Q].set(pin[:, :Q] + (acc & jnp.uint32(1)))
                q2 = pin2[:, :Q]
                l2 = pin2[:, Q].astype(jnp.int32)
                ms = pin2[:, Q + 2].astype(jnp.int32)
                return acc + f(params, ft, mt, q2, l2, ms)

            return jax.lax.fori_loop(0, k, body, jnp.uint32(0))

        pin_warm = jax.device_put(jnp.asarray(pin_np))
        pin_timed = jax.device_put(jnp.asarray(pin_np + np.uint32(1)))
        times = {}
        for k in (2, 12):
            int(jax.device_get(run_k(k, fn, file_tier, mem_tier, pin_warm)))
            t0 = time.time()
            int(jax.device_get(run_k(k, fn, file_tier, mem_tier, pin_timed)))
            times[k] = time.time() - t0
        per = max((times[12] - times[2]) / 10, 1e-9)
        print(f"{label}: {per*1000:.2f} ms/batch", flush=True)
        return per

    slope(phase_ranges, "ranges (plan: mini+resident+main+fixup)")
    slope(phase_gather, "ranges+gather (P_SMALL)")
    slope(phase_rank, "ranges+gather+score_rank")
    slope(phase_full, "full program")


if __name__ == "__main__":
    main()
