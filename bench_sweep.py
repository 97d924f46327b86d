"""Per-stage kernel timing + postings-budget sweep on the real device.

Builds the same 10M-doc table as bench.py, then times cumulative prefixes of
the search pipeline (range -> gather -> rank -> mention -> full) and sweeps
the postings budget P, to locate the dominant stage at serving shapes.
Diagnostic tool, not part of the headline bench.
"""

import functools
import sys
import time

import numpy as np

from bench import BATCH, HASHES_PER_DOC, N_DOCS, doc_hashes, make_queries


def main():
    import jax
    import jax.numpy as jnp

    from acoustid_index_tpu.ops.build import sort_postings
    from acoustid_index_tpu.ops.search_kernel import (
        SearchParams,
        _batch_newest,
        _batch_ranges,
        _final_select,
        _plan_and_gather,
        _score_rank,
    )

    @jax.jit
    def make_table():
        ids = jnp.arange(1, N_DOCS + 1, dtype=jnp.uint32)
        j = jnp.arange(HASHES_PER_DOC, dtype=jnp.uint32)
        h = ids[:, None] * jnp.uint32(2654435761)
        h = h + j[None, :] * jnp.uint32(0x27D4EB2F) + jnp.uint32(12345)
        h = h ^ (h >> jnp.uint32(13))
        h = h * jnp.uint32(0x85EBCA6B)
        h = h ^ (h >> jnp.uint32(16))
        hashes = h.reshape(-1)
        docids = jnp.broadcast_to(ids[:, None], (N_DOCS, HASHES_PER_DOC)).reshape(-1)
        return sort_postings(hashes, docids, hashes.shape[0])

    h_sorted, d_sorted = make_table()
    h_sorted.block_until_ready()
    print("table built", flush=True)

    n_postings = N_DOCS * HASHES_PER_DOC
    cap = 1
    while cap < n_postings:
        cap *= 2

    def pad(a, size, fill):
        out = jnp.full((size,), fill, a.dtype)
        return out.at[: a.shape[0]].set(a)

    hashes_padded = pad(h_sorted, cap, jnp.uint32(0xFFFFFFFF))
    file_tier = {
        "hashes": hashes_padded,
        "docids": pad(d_sorted, cap, jnp.uint32(0xFFFFFFFF)),
        "block_index": hashes_padded[::1024],
        "seg_start": jnp.zeros(1, jnp.int32),
        "seg_len": jnp.zeros(1, jnp.int32).at[0].set(n_postings),
        "mention_ids": pad(jnp.arange(1, N_DOCS + 1, dtype=jnp.uint32), 1 << 24, jnp.uint32(0xFFFFFFFF)),
        "mention_len": jnp.int32(N_DOCS),
    }
    mem_tier = {
        "hashes": jnp.full(1024, 0xFFFFFFFF, jnp.uint32),
        "docids": jnp.full(1024, 0xFFFFFFFF, jnp.uint32),
        "block_index": jnp.full(1, 0xFFFFFFFF, jnp.uint32),
        "seg_start": jnp.zeros(1, jnp.int32),
        "seg_len": jnp.zeros(1, jnp.int32),
        "mention_ids": jnp.full(1024, 0xFFFFFFFF, jnp.uint32),
        "mention_len": jnp.int32(0),
    }

    @functools.partial(jax.jit, static_argnums=(0, 1))
    def staged(p, stage, file_tier, mem_tier, qs, lens, limits, min_scores, pcts):
        f_lo, f_cnt, m_lo, m_cnt, trunc = _batch_ranges(p, file_tier, mem_tier, qs, lens)
        if stage == "range":
            return f_lo.sum() + f_cnt.sum() + m_lo.sum() + m_cnt.sum()

        def plan_one(a, b, c, d):
            return _plan_and_gather(p, file_tier, mem_tier, a, b, c, d)

        d, o, inv, totals, overs = jax.vmap(plan_one)(f_lo, f_cnt, m_lo, m_cnt)
        if stage == "gather":
            return d.astype(jnp.int32).sum() + o.sum()

        def rank_one(d1, o1, i1, ms):
            return _score_rank(p, d1, o1, i1, ms)

        cd, co, csc, cv, cover = jax.vmap(rank_one)(d, o, inv, min_scores)
        if stage == "rank":
            return cd.astype(jnp.int32).sum() + csc.sum()

        newest = _batch_newest(mem_tier, cd.reshape(-1), cv.reshape(-1)).reshape(cd.shape)
        if stage == "mention":
            return newest.sum()

        out = jax.vmap(lambda *a: _final_select(p, *a))(cd, co, csc, cv, newest, limits, min_scores, pcts)
        return out["ids"].astype(jnp.int32).sum()

    rngq = np.random.default_rng(17)
    limits = np.full(BATCH, 10, np.int32)
    min_scores = np.full(BATCH, 6, np.int32)
    pcts = np.full(BATCH, 10, np.int32)

    def timeit(p, stage, qs, lens, rounds=6):
        r = staged(p, stage, file_tier, mem_tier, qs, lens, limits, min_scores, pcts)
        r.block_until_ready()
        t0 = time.time()
        for _ in range(rounds):
            r = staged(p, stage, file_tier, mem_tier, qs, lens, limits, min_scores, pcts)
        r.block_until_ready()
        return (time.time() - t0) / rounds * 1000.0

    _, qs, lens = make_queries(rngq, BATCH, 128, N_DOCS)
    budgets = [int(x) for x in (sys.argv[1:] or ["1024", "2048", "4096"])]
    for P in budgets:
        p = SearchParams(query_len=128, postings_budget=P, per_hash_cap=1024, candidate_cap=256, out_len=128)
        times = {}
        for stage in ("range", "gather", "rank", "mention", "full"):
            times[stage] = timeit(p, stage, qs, lens)
        print(
            f"P={P}: "
            + " ".join(f"{s}={times[s]:.1f}ms" for s in times)
            + f" | qps(full)={BATCH / times['full'] * 1000:.0f}",
            flush=True,
        )


if __name__ == "__main__":
    main()
