"""Stage attribution of the sharded serving program at mesh-1 on the real
chip: where do the ~21.5ms/batch go (vs ~1.8ms unsharded at the same 10M
corpus)?  Variants compile separately and are fori-slope timed:

  ranges   — _batch_ranges only (blocked lookup on the sharded layout)
  gather   — + vmapped _plan_and_gather at P_SMALL
  score    — + vmapped _score_rank (the sort-based scorer)
  full     — the real sharded_search_batch

Run on the TPU session:  python -u probes/_probe_sharded_attrib.py
"""
import os as _os, sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import functools
import time

import numpy as np

import jax
import jax.numpy as jnp

from acoustid_index_tpu.engine.memseg import build_segment
from acoustid_index_tpu.engine.model import BulkInsert, SegmentInfo
from acoustid_index_tpu.engine.searcher import _params_for
from acoustid_index_tpu.engine.segments import Snapshot
from acoustid_index_tpu.ops.search_kernel import (
    P_SMALL,
    _batch_ranges,
    _plan_and_gather,
    _score_rank,
    small_budget,
)
from acoustid_index_tpu.parallel.sharded import (
    AXIS,
    build_sharded_view,
    make_mesh,
    search_tiers,
    sharded_search_batch,
)

N_DOCS = int(_os.environ.get("ATTRIB_DOCS", 10_000_000))
K = 24
BATCH = 256


def doc_hashes(ids, n):
    j = np.arange(n, dtype=np.uint32)
    with np.errstate(over="ignore"):
        h = ids.astype(np.uint32)[:, None] * np.uint32(2654435761)
        h = h + j[None, :] * np.uint32(0x27D4EB2F) + np.uint32(12345)
        h = h ^ (h >> np.uint32(13))
        h = h * np.uint32(0x85EBCA6B)
        h = h ^ (h >> np.uint32(16))
    return h.astype(np.uint32)


def slope(fn, qs, tiers, reps=3, klo=4, khi=32):
    # `tiers` (the packed tier dicts) MUST be jit ARGUMENTS: closed-over
    # device arrays lower as HLO constants — 2+GB of them — and blow the
    # axon remote-compile size limit (CLAUDE.md gotcha).
    @functools.partial(jax.jit, static_argnums=(0,))
    def run_k(k, qs, tiers):
        def body(i, acc):
            return acc + fn(qs + (acc & jnp.uint32(1)), tiers)

        return jax.lax.fori_loop(0, k, body, jnp.uint32(0))

    times = {klo: [], khi: []}
    for k in (klo, khi):
        int(jax.device_get(run_k(k, qs, tiers)))
        for r in range(reps):
            t0 = time.time()
            int(jax.device_get(run_k(k, qs + np.uint32(1 + r), tiers)))
            times[k].append(time.time() - t0)
    return max(
        (sorted(times[khi])[reps // 2] - sorted(times[klo])[reps // 2]) / (khi - klo),
        1e-9,
    )


def main():
    import dataclasses

    t0 = time.time()
    cache = f"/tmp/aitpu_seg10m.npz" if N_DOCS == 10_000_000 else f"/tmp/aitpu_seg_{N_DOCS}.npz"  # 10M path shared with _probe_sharded_bisect
    if _os.path.exists(cache):
        from acoustid_index_tpu.engine.memseg import Segment

        z = np.load(cache)
        seg = Segment(
            info=SegmentInfo(commit_id=1),
            hashes=z["hashes"],
            docids=z["docids"],
            docs_ids=z["docs_ids"],
            docs_alive=z["docs_alive"],
            min_doc_id=1,
            max_doc_id=N_DOCS,
        )
    else:
        ids = np.arange(1, N_DOCS + 1, dtype=np.uint32)
        hs = doc_hashes(ids, K)
        offsets = np.arange(0, (N_DOCS + 1) * K, K, dtype=np.uint32)
        seg = build_segment(
            [BulkInsert(ids=ids, hashes=hs.reshape(-1), offsets=offsets)],
            SegmentInfo(commit_id=1),
        )
        del hs
        np.savez(cache, hashes=seg.hashes, docids=seg.docids,
                 docs_ids=seg.docs_ids, docs_alive=seg.docs_alive)
    print(f"segment ready {time.time()-t0:.0f}s")
    snap = Snapshot(file=(seg,), memory=())
    mesh = make_mesh(1)
    view = build_sharded_view(snap, mesh)
    print(f"view built {time.time()-t0:.0f}s")

    params = _params_for(128)
    p_small = dataclasses.replace(params, postings_budget=P_SMALL)
    rng = np.random.default_rng(23)
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
    lens_j = jnp.asarray(lens)
    minsc_j = jnp.asarray(min_scores)

    tiers = search_tiers(view)

    def squeeze(tiers):
        # Mesh-1 flat layout: the global device arrays ARE the per-shard
        # locals; only the per-shard mention_len scalar needs indexing.
        def loc(t):
            return {k: (v[0] if k == "mention_len" else v) for k, v in t.items()}

        return loc(tiers[0]), loc(tiers[1])

    def ranges_fn(qs2, tiers):
        f_search, m_search = squeeze(tiers)
        f_lo, f_cnt, m_lo, m_cnt, tr = _batch_ranges(params, f_search, m_search, qs2, lens_j)
        return jnp.sum(f_cnt.astype(jnp.uint32)) + jnp.sum(m_cnt.astype(jnp.uint32))

    def gather_fn(qs2, tiers):
        f_search, m_search = squeeze(tiers)
        f_lo, f_cnt, m_lo, m_cnt, tr = _batch_ranges(params, f_search, m_search, qs2, lens_j)

        def plan_one(a, b, c, d):
            dd, oo, inv, tot, over = _plan_and_gather(
                p_small, f_search, m_search, a, b, c, d, use_mem=False
            )
            return dd, oo, inv, tot

        d, o, inv, tot = jax.vmap(plan_one)(f_lo, f_cnt, m_lo, m_cnt)
        return jnp.sum(d.astype(jnp.uint32)) + jnp.sum(tot.astype(jnp.uint32))

    def score_fn(qs2, tiers):
        f_search, m_search = squeeze(tiers)
        f_lo, f_cnt, m_lo, m_cnt, tr = _batch_ranges(params, f_search, m_search, qs2, lens_j)

        def plan_one(a, b, c, d):
            dd, oo, inv, tot, over = _plan_and_gather(
                p_small, f_search, m_search, a, b, c, d, use_mem=False
            )
            return dd, oo, inv

        d, o, inv = jax.vmap(plan_one)(f_lo, f_cnt, m_lo, m_cnt)
        cd, co, csc, cv, c_over = jax.vmap(
            lambda d1, o1, i1, ms: _score_rank(p_small, d1, o1, i1, ms)
        )(d, o, inv, minsc_j)
        return jnp.sum(cd.astype(jnp.uint32)) + jnp.sum(csc.astype(jnp.uint32))

    def full_fn(qs2, tiers):
        out = sharded_search_batch(
            params, mesh, tiers[0], tiers[1],
            qs2, lens_j, jnp.asarray(limits), minsc_j, jnp.asarray(pcts),
        )
        return jnp.sum(out["ids"].astype(jnp.uint32))

    def single_fn(qs2, tiers):
        """The UNSHARDED program run directly on the squeezed sharded view:
        separates view-layout cost from shard_map/collective cost."""
        from acoustid_index_tpu.ops.search_kernel import _search_batch_impl

        f_search, m_search = squeeze(tiers)
        out = _search_batch_impl(
            params, f_search, m_search, qs2, lens_j,
            jnp.asarray(limits), minsc_j, jnp.asarray(pcts),
        )
        return jnp.sum(out["ids"].astype(jnp.uint32))

    def impl_fn(qs2, tiers):
        """The unsharded program on whatever (file, mem) tier pair is passed
        — used by the unsh/analytic variants with non-sharded views."""
        from acoustid_index_tpu.ops.search_kernel import _search_batch_impl

        out = _search_batch_impl(
            params, tiers[0], tiers[1], qs2, lens_j,
            jnp.asarray(limits), minsc_j, jnp.asarray(pcts),
        )
        return jnp.sum(out["ids"].astype(jnp.uint32))

    def direct_fn(qs2, tiers):
        """The direct pipeline FORCED (no lax.cond): emit ranges ->
        _direct_candidates -> matrix score/select.  If this runs at the
        unsharded headline speed while `single` doesn't, the cascade's
        conds/predicates are the problem, not the stages."""
        import dataclasses as dc

        from acoustid_index_tpu.ops.search_kernel import (
            F_DIRECT,
            _batch_newest,
            _direct_candidates,
            _final_select_matrix,
            _score_matrix,
        )

        f_search, m_search = squeeze(tiers)
        f_lo, f_cnt, m_lo, m_cnt, tr, emit_info = _batch_ranges(
            params, f_search, m_search, qs2, lens_j, want_emit=True
        )
        rows, covered = emit_info
        E = 2 if params.query_len <= 128 else 1
        d, inv, totals = _direct_candidates(params, f_search, rows, covered, f_lo, f_cnt, E)
        o = jnp.zeros(d.shape, jnp.int32)
        win, score, cand = jax.vmap(
            lambda d1, o1, i1, ms: _score_matrix(params, d1, o1, i1, ms)
        )(d, o, inv, minsc_j)
        newest = _batch_newest(m_search, d.reshape(-1), cand.reshape(-1)).reshape(d.shape)
        out = jax.vmap(
            lambda d1, s1, w1, c1, n1, l1, ms1, p1: _final_select_matrix(
                params, d1, s1, w1, c1, n1, l1, ms1, p1
            )
        )(d, score, win, cand, newest, jnp.asarray(limits), minsc_j, jnp.asarray(pcts))
        return jnp.sum(out["ids"].astype(jnp.uint32))

    def rangese_fn(qs2, tiers):
        """Emitting range phase only (the direct path's stage 1)."""
        f_search, m_search = squeeze(tiers)
        f_lo, f_cnt, m_lo, m_cnt, tr, emit_info = _batch_ranges(
            params, f_search, m_search, qs2, lens_j, want_emit=True
        )
        rows, covered = emit_info
        return (
            jnp.sum(f_cnt.astype(jnp.uint32))
            + jnp.sum(rows[:, 0, 0].astype(jnp.uint32))
            + jnp.sum(covered.astype(jnp.uint32))
        )

    def dcand_fn(qs2, tiers):
        """Emitting ranges + _direct_candidates (stages 1-2, no scoring)."""
        from acoustid_index_tpu.ops.search_kernel import _direct_candidates

        f_search, m_search = squeeze(tiers)
        f_lo, f_cnt, m_lo, m_cnt, tr, emit_info = _batch_ranges(
            params, f_search, m_search, qs2, lens_j, want_emit=True
        )
        rows, covered = emit_info
        E = 2 if params.query_len <= 128 else 1
        d, inv, totals = _direct_candidates(params, f_search, rows, covered, f_lo, f_cnt, E)
        return jnp.sum(d.astype(jnp.uint32)) + jnp.sum(totals.astype(jnp.uint32))

    def directm_fn(qs2, tiers):
        """The impl's direct path at FULL fidelity (mem-tier cond + concat,
        width E*Q+F+P_MEM_DIRECT, matrix scoring, final select) but WITHOUT
        the direct_ok/base lax.cond wrapper.  fast => the cond/base branch
        is the cost; slow => the mem concat / width is."""
        import dataclasses as dc

        from acoustid_index_tpu.ops.search_kernel import (
            SENTINEL,
            TIER_MEM,
            _batch_newest,
            _direct_candidates,
            _final_select_matrix,
            _plan_and_gather,
            _score_matrix,
        )

        f_search, m_search = squeeze(tiers)
        B = qs2.shape[0]
        f_lo, f_cnt, m_lo, m_cnt, tr, emit_info = _batch_ranges(
            params, f_search, m_search, qs2, lens_j, want_emit=True
        )
        rows, covered = emit_info
        E = 2 if params.query_len <= 128 else 1
        d_f, inv_f, totals_f = _direct_candidates(params, f_search, rows, covered, f_lo, f_cnt, E)
        from acoustid_index_tpu.ops.search_kernel import P_MEM_DIRECT

        has_mem = jnp.sum(m_search["seg_len"]) > 0
        p_mem = dc.replace(params, postings_budget=P_MEM_DIRECT)

        def mem_branch(_):
            def one(f_lo1, m_lo1, m_cnt1):
                dm, _om, im, tot, _over = _plan_and_gather(
                    p_mem, f_search, m_search, f_lo1, jnp.zeros_like(m_cnt1),
                    m_lo1, m_cnt1, use_mem=True, use_file=False,
                )
                return dm, im, tot

            return jax.vmap(one)(f_lo, m_lo, m_cnt)

        def no_mem(_):
            return (
                jnp.full((B, P_MEM_DIRECT), SENTINEL, jnp.uint32),
                jnp.ones((B, P_MEM_DIRECT), jnp.int32),
                jnp.zeros((B,), jnp.int32),
            )

        d_m, inv_m, totals_m = jax.lax.cond(has_mem, mem_branch, no_mem, None)
        d = jnp.concatenate([d_f, d_m], axis=1)
        inv = jnp.concatenate([inv_f, inv_m], axis=1)
        o = jnp.concatenate(
            [jnp.zeros(d_f.shape, jnp.int32), jnp.full(d_m.shape, TIER_MEM, jnp.int32)],
            axis=1,
        )
        win, score, cand = jax.vmap(
            lambda d1, o1, i1, ms: _score_matrix(params, d1, o1, i1, ms)
        )(d, o, inv, minsc_j)
        newest = _batch_newest(m_search, d.reshape(-1), cand.reshape(-1)).reshape(d.shape)
        out = jax.vmap(
            lambda d1, s1, w1, c1, n1, l1, ms1, p1: _final_select_matrix(
                params, d1, s1, w1, c1, n1, l1, ms1, p1
            )
        )(d, score, win, cand, newest, jnp.asarray(limits), minsc_j, jnp.asarray(pcts))
        return jnp.sum(out["ids"].astype(jnp.uint32))

    def base_fn(qs2, tiers):
        """The impl's BASE path forced (small-budget matrix w/ gather, or
        full sort): what full/single would cost if direct_ok were false at
        runtime."""
        from acoustid_index_tpu.ops.search_kernel import (
            _batch_newest,
            _final_select_matrix,
            _score_matrix,
        )

        f_search, m_search = squeeze(tiers)
        f_lo, f_cnt, m_lo, m_cnt, tr = _batch_ranges(params, f_search, m_search, qs2, lens_j)

        def score_one(f_lo1, f_cnt1, m_lo1, m_cnt1, ms):
            d, o, inv, total, over = _plan_and_gather(
                p_small, f_search, m_search, f_lo1, f_cnt1, m_lo1, m_cnt1, use_mem=False
            )
            win, score, cand = _score_matrix(p_small, d, o, inv, ms)
            return d, win, score, cand

        d, win, score, cand = jax.vmap(score_one)(f_lo, f_cnt, m_lo, m_cnt, minsc_j)
        newest = _batch_newest(m_search, d.reshape(-1), cand.reshape(-1)).reshape(d.shape)
        out = jax.vmap(
            lambda d1, s1, w1, c1, n1, l1, ms1, p1: _final_select_matrix(
                params, d1, s1, w1, c1, n1, l1, ms1, p1
            )
        )(d, score, win, cand, newest, jnp.asarray(limits), minsc_j, jnp.asarray(pcts))
        return jnp.sum(out["ids"].astype(jnp.uint32))

    def _direct_tail(f_search, m_search, rows, covered, f_lo, f_cnt, m_lo, m_cnt, B):
        """directm body from stage 2 on; returns the summed ids scalar."""
        import dataclasses as dc

        from acoustid_index_tpu.ops.search_kernel import (
            P_MEM_DIRECT,
            SENTINEL,
            TIER_MEM,
            _batch_newest,
            _direct_candidates,
            _final_select_matrix,
            _plan_and_gather,
            _score_matrix,
        )

        E = 2 if params.query_len <= 128 else 1
        d_f, inv_f, totals_f = _direct_candidates(params, f_search, rows, covered, f_lo, f_cnt, E)
        has_mem = jnp.sum(m_search["seg_len"]) > 0
        p_mem = dc.replace(params, postings_budget=P_MEM_DIRECT)

        def mem_branch(_):
            def one(f_lo1, m_lo1, m_cnt1):
                dm, _om, im, tot, _over = _plan_and_gather(
                    p_mem, f_search, m_search, f_lo1, jnp.zeros_like(m_cnt1),
                    m_lo1, m_cnt1, use_mem=True, use_file=False,
                )
                return dm, im, tot

            return jax.vmap(one)(f_lo, m_lo, m_cnt)

        def no_mem(_):
            return (
                jnp.full((B, P_MEM_DIRECT), SENTINEL, jnp.uint32),
                jnp.ones((B, P_MEM_DIRECT), jnp.int32),
                jnp.zeros((B,), jnp.int32),
            )

        d_m, inv_m, totals_m = jax.lax.cond(has_mem, mem_branch, no_mem, None)
        d = jnp.concatenate([d_f, d_m], axis=1)
        inv = jnp.concatenate([inv_f, inv_m], axis=1)
        o = jnp.concatenate(
            [jnp.zeros(d_f.shape, jnp.int32), jnp.full(d_m.shape, TIER_MEM, jnp.int32)],
            axis=1,
        )
        win, score, cand = jax.vmap(
            lambda d1, o1, i1, ms: _score_matrix(params, d1, o1, i1, ms)
        )(d, o, inv, minsc_j)
        newest = _batch_newest(m_search, d.reshape(-1), cand.reshape(-1)).reshape(d.shape)
        out = jax.vmap(
            lambda d1, s1, w1, c1, n1, l1, ms1, p1: _final_select_matrix(
                params, d1, s1, w1, c1, n1, l1, ms1, p1
            )
        )(d, score, win, cand, newest, jnp.asarray(limits), minsc_j, jnp.asarray(pcts))
        return jnp.sum(out["ids"].astype(jnp.uint32))

    def _base_tail(f_search, m_search, f_lo, f_cnt, m_lo, m_cnt):
        """base body from stage 2 on (small-budget gather + matrix)."""
        from acoustid_index_tpu.ops.search_kernel import (
            _batch_newest,
            _final_select_matrix,
            _plan_and_gather,
            _score_matrix,
        )

        def score_one(f_lo1, f_cnt1, m_lo1, m_cnt1, ms):
            d, o, inv, total, over = _plan_and_gather(
                p_small, f_search, m_search, f_lo1, f_cnt1, m_lo1, m_cnt1, use_mem=False
            )
            win, score, cand = _score_matrix(p_small, d, o, inv, ms)
            return d, win, score, cand

        d, win, score, cand = jax.vmap(score_one)(f_lo, f_cnt, m_lo, m_cnt, minsc_j)
        newest = _batch_newest(m_search, d.reshape(-1), cand.reshape(-1)).reshape(d.shape)
        out = jax.vmap(
            lambda d1, s1, w1, c1, n1, l1, ms1, p1: _final_select_matrix(
                params, d1, s1, w1, c1, n1, l1, ms1, p1
            )
        )(d, score, win, cand, newest, jnp.asarray(limits), minsc_j, jnp.asarray(pcts))
        return jnp.sum(out["ids"].astype(jnp.uint32))

    def _cond_common(qs2, tiers):
        from acoustid_index_tpu.ops.search_kernel import F_DIRECT, P_MEM_DIRECT

        f_search, m_search = squeeze(tiers)
        B = qs2.shape[0]
        f_lo, f_cnt, m_lo, m_cnt, tr, emit_info = _batch_ranges(
            params, f_search, m_search, qs2, lens_j, want_emit=True
        )
        rows, covered = emit_info
        E = 2 if params.query_len <= 128 else 1
        ov_tot = jnp.sum(jnp.maximum(f_cnt - jnp.where(covered, E, 0), 0), axis=1)
        m_tot = jnp.sum(m_cnt, axis=1)
        direct_ok = jnp.logical_and(
            jnp.max(ov_tot) <= F_DIRECT, jnp.max(m_tot) <= P_MEM_DIRECT
        )
        return f_search, m_search, B, f_lo, f_cnt, m_lo, m_cnt, rows, covered, direct_ok

    def cond2_fn(qs2, tiers):
        """directm vs base under the REAL lax.cond(direct_ok, ...): does the
        cond wrapper alone reproduce the 8.4ms?"""
        (f_search, m_search, B, f_lo, f_cnt, m_lo, m_cnt, rows, covered,
         direct_ok) = _cond_common(qs2, tiers)
        return jax.lax.cond(
            direct_ok,
            lambda _: _direct_tail(f_search, m_search, rows, covered, f_lo, f_cnt, m_lo, m_cnt, B),
            lambda _: _base_tail(f_search, m_search, f_lo, f_cnt, m_lo, m_cnt),
            None,
        )

    def condcand_fn(qs2, tiers):
        """cond wrapping ONLY _direct_candidates (rows/covered cross the
        conditional boundary): is the emit-consuming stage the poison?"""
        from acoustid_index_tpu.ops.search_kernel import _direct_candidates

        (f_search, m_search, B, f_lo, f_cnt, m_lo, m_cnt, rows, covered,
         direct_ok) = _cond_common(qs2, tiers)
        E = 2 if params.query_len <= 128 else 1

        def a(_):
            d, inv, tot = _direct_candidates(params, f_search, rows, covered, f_lo, f_cnt, E)
            return jnp.sum(d.astype(jnp.uint32)) + jnp.sum(tot.astype(jnp.uint32))

        def b(_):
            return jnp.sum(f_lo.astype(jnp.uint32))

        return jax.lax.cond(direct_ok, a, b, None)

    def condtail_fn(qs2, tiers):
        """_direct_candidates OUTSIDE; cond wraps only scoring + select."""
        from acoustid_index_tpu.ops.search_kernel import (
            _batch_newest,
            _direct_candidates,
            _final_select_matrix,
            _score_matrix,
        )

        (f_search, m_search, B, f_lo, f_cnt, m_lo, m_cnt, rows, covered,
         direct_ok) = _cond_common(qs2, tiers)
        E = 2 if params.query_len <= 128 else 1
        d, inv, totals = _direct_candidates(params, f_search, rows, covered, f_lo, f_cnt, E)
        o = jnp.zeros(d.shape, jnp.int32)

        def a(_):
            win, score, cand = jax.vmap(
                lambda d1, o1, i1, ms: _score_matrix(params, d1, o1, i1, ms)
            )(d, o, inv, minsc_j)
            newest = _batch_newest(m_search, d.reshape(-1), cand.reshape(-1)).reshape(d.shape)
            out = jax.vmap(
                lambda d1, s1, w1, c1, n1, l1, ms1, p1: _final_select_matrix(
                    params, d1, s1, w1, c1, n1, l1, ms1, p1
                )
            )(d, score, win, cand, newest, jnp.asarray(limits), minsc_j, jnp.asarray(pcts))
            return jnp.sum(out["ids"].astype(jnp.uint32))

        def b(_):
            return jnp.sum(d.astype(jnp.uint32))

        return jax.lax.cond(direct_ok, a, b, None)

    def condranges_fn(qs2, tiers):
        """EMITTING ranges themselves inside a cond (both branches run the
        same emit lookup): does the Pallas emit kernel slow inside a
        conditional?"""
        def a(_):
            f_search, m_search = squeeze(tiers)
            f_lo, f_cnt, m_lo, m_cnt, tr, emit_info = _batch_ranges(
                params, f_search, m_search, qs2, lens_j, want_emit=True
            )
            rows, covered = emit_info
            return (jnp.sum(f_cnt.astype(jnp.uint32))
                    + jnp.sum(rows[:, 0, 0].astype(jnp.uint32))
                    + jnp.sum(covered.astype(jnp.uint32)))

        def b(_):
            return jnp.uint32(0)

        pred = jnp.sum(qs2) != jnp.uint32(1)
        return jax.lax.cond(pred, a, b, None)

    def condsame_fn(qs2, tiers):
        """Same cond with the direct branch on BOTH sides: separates cond
        operand-tuple overhead from the presence of the gather branch."""
        (f_search, m_search, B, f_lo, f_cnt, m_lo, m_cnt, rows, covered,
         direct_ok) = _cond_common(qs2, tiers)

        def br(_):
            return _direct_tail(f_search, m_search, rows, covered, f_lo, f_cnt, m_lo, m_cnt, B)

        def br2(_):
            return _direct_tail(f_search, m_search, rows, covered, f_lo, f_cnt, m_lo, m_cnt, B) + jnp.uint32(0)

        return jax.lax.cond(direct_ok, br, br2, None)

    def diag(tiers):
        """Fetch the cascade's runtime predicates once: is direct engaged?"""
        from acoustid_index_tpu.ops.search_kernel import (
            F_DIRECT,
            P_MEM_DIRECT,
            P_SMALL,
            small_budget,
        )

        @jax.jit
        def stats(qs2, tiers):
            f_search, m_search = squeeze(tiers)
            f_lo, f_cnt, m_lo, m_cnt, tr, emit_info = _batch_ranges(
                params, f_search, m_search, qs2, lens_j, want_emit=True
            )
            rows, covered = emit_info
            E = 2 if params.query_len <= 128 else 1
            ov_tot = jnp.sum(jnp.maximum(f_cnt - jnp.where(covered, E, 0), 0), axis=1)
            m_tot = jnp.sum(m_cnt, axis=1)
            _, totals_rough = small_budget(params, f_cnt, m_cnt, qs2.shape[0])
            return {
                "max_ov_tot": jnp.max(ov_tot),
                "max_m_tot": jnp.max(m_tot),
                "direct_ok": jnp.logical_and(
                    jnp.max(ov_tot) <= F_DIRECT, jnp.max(m_tot) <= P_MEM_DIRECT
                ),
                "covered_frac": jnp.mean(covered.astype(jnp.float32)),
                "max_total": jnp.max(totals_rough),
                "small": jnp.max(totals_rough) <= P_SMALL,
                "max_f_cnt": jnp.max(f_cnt),
                "trunc": tr,
            }

        for tag, q_in in (("qs", qs), ("qs+1", qs + np.uint32(1)), ("qs+3", qs + np.uint32(3))):
            out = jax.device_get(stats(jnp.asarray(q_in), tiers))
            print(tag, {k: (v.item() if hasattr(v, "item") else v) for k, v in out.items()},
                  flush=True)

    import sys

    names = sys.argv[1:] or ["ranges", "gather", "score", "full"]
    if "diag" in names:
        diag(tiers)

    # Non-sharded reference views, measured in the SAME session so numbers
    # are directly comparable to single/full:
    #   unsh     — the real production pack (engine.segments.pack_tier)
    #   analytic — bench.py kernel_bench's hand-built device table (the
    #              headline's 1.8ms table)
    if "unsh" in names:
        from acoustid_index_tpu.engine.segments import (
            FILE_SLOTS,
            MEMORY_SLOTS,
            pack_tier,
            tier_view_for_search,
        )

        t0 = time.time()
        fv = tier_view_for_search(pack_tier([seg], FILE_SLOTS), mentions=False)
        mv = tier_view_for_search(pack_tier([], MEMORY_SLOTS))
        jax.block_until_ready(fv["inter"] if "inter" in fv else fv["hashes"])
        print(f"unsh pack_tier view built {time.time()-t0:.0f}s "
              f"shapes={[(k, tuple(v.shape)) for k, v in fv.items() if hasattr(v, 'shape')]}")
        t0 = time.time()
        per = slope(impl_fn, jnp.asarray(qs), (fv, mv))
        print(f"unsh   : {per*1000:7.2f} ms/batch ({BATCH/per:8.0f} qps)  [{time.time()-t0:.0f}s incl compile]")
        del fv, mv

    if "analytic" in names:
        from acoustid_index_tpu.ops.build import sort_postings
        from acoustid_index_tpu.ops.layout import interleave_jnp

        n_postings = N_DOCS * K
        cap = 1
        while cap < n_postings:
            cap *= 2

        @jax.jit
        def make_table():
            ids = jnp.arange(1, N_DOCS + 1, dtype=jnp.uint32)
            j = jnp.arange(K, dtype=jnp.uint32)
            h = ids[:, None] * jnp.uint32(2654435761)
            h = h + j[None, :] * jnp.uint32(0x27D4EB2F) + jnp.uint32(12345)
            h = h ^ (h >> jnp.uint32(13))
            h = h * jnp.uint32(0x85EBCA6B)
            h = h ^ (h >> jnp.uint32(16))
            hashes = h.reshape(-1)
            docids = jnp.broadcast_to(ids[:, None], (N_DOCS, K)).reshape(-1)
            h_sorted, d_sorted = sort_postings(hashes, docids, hashes.shape[0])

            def pad(a, fill):
                out = jnp.full((cap,), fill, a.dtype)
                return jax.lax.dynamic_update_slice(out, a, (0,))

            h_pad = pad(h_sorted, jnp.uint32(0xFFFFFFFF))
            d_pad = pad(d_sorted, jnp.uint32(0xFFFFFFFF))
            return interleave_jnp(h_pad, d_pad), h_pad[::1024]

        t0 = time.time()
        inter_a, bi_a = make_table()
        inter_a.block_until_ready()
        print(f"analytic table built {time.time()-t0:.0f}s")
        fta = {
            "inter": inter_a,
            "block_index": bi_a,
            "seg_start": jnp.zeros(1, jnp.int32),
            "seg_len": jnp.zeros(1, jnp.int32).at[0].set(n_postings),
        }
        mta = {
            "hashes": jnp.full(1024, 0xFFFFFFFF, jnp.uint32),
            "docids": jnp.full(1024, 0xFFFFFFFF, jnp.uint32),
            "block_index": jnp.full(1, 0xFFFFFFFF, jnp.uint32),
            "seg_start": jnp.zeros(1, jnp.int32),
            "seg_len": jnp.zeros(1, jnp.int32),
            "mention_ids": jnp.full(1024, 0xFFFFFFFF, jnp.uint32),
            "mention_len": jnp.int32(0),
        }
        t0 = time.time()
        per = slope(impl_fn, jnp.asarray(qs), (fta, mta))
        print(f"analytic: {per*1000:6.2f} ms/batch ({BATCH/per:8.0f} qps)  [{time.time()-t0:.0f}s incl compile]")
        del fta, mta, inter_a, bi_a
    for name, fn in (("ranges", ranges_fn), ("gather", gather_fn),
                     ("score", score_fn), ("full", full_fn),
                     ("single", single_fn), ("direct", direct_fn),
                     ("rangese", rangese_fn), ("dcand", dcand_fn),
                     ("directm", directm_fn), ("base", base_fn),
                     ("cond2", cond2_fn), ("condsame", condsame_fn),
                     ("condcand", condcand_fn), ("condtail", condtail_fn),
                     ("condranges", condranges_fn)):
        if name not in names:
            continue
        t0 = time.time()
        per = slope(fn, jnp.asarray(qs), tiers)
        print(
            f"{name:7s}: {per*1000:7.2f} ms/batch ({BATCH/per:8.0f} qps)  "
            f"[{time.time()-t0:.0f}s incl compile]"
        )


if __name__ == "__main__":
    main()
