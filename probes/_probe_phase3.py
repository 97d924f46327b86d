"""Fori-slope phase attribution of the serving program (K=2 vs K=12 inside
one jitted fori_loop; slope = pure device time — the only trustworthy
timing on the axon tunnel).

Phases measured cumulatively (each includes the previous):
  ranges   — stage 1 only (top-index + Pallas landing-block lookups)
  gather   — + plan/gather at the engaged budget (small path when it fits)
  score    — + matrix/sort scoring
  full     — the whole serving program (adds supersession + select)
"""
import functools
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from bench import BATCH, HASHES_PER_DOC, N_DOCS, make_queries
from acoustid_index_tpu.engine.searcher import _params_for
from acoustid_index_tpu.ops.build import sort_postings
from acoustid_index_tpu.ops import search_kernel as sk


@jax.jit
def make_table():
    ids = jnp.arange(1, N_DOCS + 1, dtype=jnp.uint32)
    j = jnp.arange(HASHES_PER_DOC, dtype=jnp.uint32)
    h = ids[:, None] * jnp.uint32(2654435761)
    h = h + j[None, :] * jnp.uint32(0x27D4EB2F) + jnp.uint32(12345)
    h = h ^ (h >> jnp.uint32(13)); h = h * jnp.uint32(0x85EBCA6B); h = h ^ (h >> jnp.uint32(16))
    hashes = h.reshape(-1)
    docids = jnp.broadcast_to(ids[:, None], (N_DOCS, HASHES_PER_DOC)).reshape(-1)
    return sort_postings(hashes, docids, hashes.shape[0])


h_sorted, d_sorted = make_table()
h_sorted.block_until_ready()
n_postings = N_DOCS * HASHES_PER_DOC
cap = 1
while cap < n_postings:
    cap *= 2


def pad(a, size, fill):
    out = jnp.full((size,), fill, a.dtype)
    return out.at[: a.shape[0]].set(a)


hp = pad(h_sorted, cap, jnp.uint32(0xFFFFFFFF))
file_tier = {
    "hashes": hp,
    "docids": pad(d_sorted, cap, jnp.uint32(0xFFFFFFFF)),
    "block_index": hp[::1024],
    "seg_start": jnp.zeros(1, jnp.int32),
    "seg_len": jnp.zeros(1, jnp.int32).at[0].set(n_postings),
    "docs_len": jnp.zeros(1, jnp.int32).at[0].set(N_DOCS),
    "mention_ids": pad(jnp.arange(1, N_DOCS + 1, dtype=jnp.uint32), 1 << 24, jnp.uint32(0xFFFFFFFF)),
    "mention_ord": jnp.zeros(1 << 24, jnp.int32),
    "mention_len": jnp.int32(N_DOCS),
}
mem_tier = {
    "hashes": jnp.full(1024, 0xFFFFFFFF, jnp.uint32),
    "docids": jnp.full(1024, 0xFFFFFFFF, jnp.uint32),
    "block_index": jnp.full(1, 0xFFFFFFFF, jnp.uint32),
    "seg_start": jnp.zeros(1, jnp.int32),
    "seg_len": jnp.zeros(1, jnp.int32),
    "docs_len": jnp.zeros(1, jnp.int32),
    "mention_ids": jnp.full(1024, 0xFFFFFFFF, jnp.uint32),
    "mention_ord": jnp.full(1024, -1, jnp.int32),
    "mention_len": jnp.int32(0),
}

params = _params_for(128)
rngq = np.random.default_rng(17)
_, qs, lens = make_queries(rngq, BATCH, params.query_len, N_DOCS)
pin = np.zeros((BATCH, params.query_len + 4), np.uint32)
pin[:, : params.query_len] = qs
pin[:, params.query_len] = lens
pin[:, params.query_len + 1] = 10
pin[:, params.query_len + 2] = 6
pin[:, params.query_len + 3] = 10


def phase_fn(phase):
    p = params
    Q = p.query_len

    def one(file_tier, mem_tier, pin2):
        queries = pin2[:, :Q]
        q_lens = pin2[:, Q].astype(jnp.int32)
        limits = pin2[:, Q + 1].astype(jnp.int32)
        min_scores = pin2[:, Q + 2].astype(jnp.int32)
        pcts = pin2[:, Q + 3].astype(jnp.int32)
        if phase == "full":
            out = sk._search_batch_impl(p, file_tier, mem_tier, queries, q_lens, limits, min_scores, pcts)
            return jnp.sum(out["ids"].astype(jnp.uint32))
        f_lo, f_cnt, m_lo, m_cnt, trunc = sk._batch_ranges(p, file_tier, mem_tier, queries, q_lens)
        if phase == "ranges":
            return (
                jnp.sum(f_lo.astype(jnp.uint32))
                + jnp.sum(f_cnt.astype(jnp.uint32))
                + trunc.astype(jnp.uint32)
            )
        import dataclasses

        p_small = dataclasses.replace(p, postings_budget=sk.P_SMALL)

        def gather_one(f_lo1, f_cnt1, m_lo1, m_cnt1, min_score):
            d, o, inv, total, over = sk._plan_and_gather(
                p_small, file_tier, mem_tier, f_lo1, f_cnt1, m_lo1, m_cnt1, use_mem=False
            )
            if phase == "gather":
                return jnp.sum(d.astype(jnp.uint32)) + total.astype(jnp.uint32)
            win, score, cand = sk._score_matrix(p_small, d, o, inv, min_score)
            return jnp.sum(score.astype(jnp.uint32)) + jnp.sum(d.astype(jnp.uint32))

        r = jax.vmap(gather_one)(f_lo, f_cnt, m_lo, m_cnt, min_scores)
        return jnp.sum(r)

    @functools.partial(jax.jit, static_argnums=(0,))
    def runK(K, ft, mt, pin0):
        def body(i, acc):
            pin2 = pin0.at[:, :Q].set(pin0[:, :Q] + (acc & jnp.uint32(1)))
            return acc + one(ft, mt, pin2)

        return jax.lax.fori_loop(0, K, body, jnp.uint32(0))

    return runK


if __name__ == "__main__":  # guard: other probes import this module for its table
    for phase in ("ranges", "gather", "score", "full"):
        runK = phase_fn(phase)
        pj = jax.device_put(jnp.asarray(pin))
        times = {}
        for K in (2, 12):
            int(jax.device_get(runK(K, file_tier, mem_tier, pj)))  # compile + warm
            t0 = time.time()
            int(jax.device_get(runK(K, file_tier, mem_tier, pj)))
            times[K] = time.time() - t0
        slope = (times[12] - times[2]) / 10
        print(f"{phase}: {slope*1000:.2f} ms/batch ({BATCH/slope:.0f} qps)", flush=True)
