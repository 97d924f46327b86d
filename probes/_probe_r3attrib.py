"""Fori-slope attribution of the ROUND-3 serving program on the interleaved
10M-doc steady state (the bench table): cumulative phases of the direct
(gather-free) path, plus isolated costs of the Pallas stages.

Phases (cumulative, each includes all previous):
  emit_ranges — stage 1 with want_emit (top index + emitting landing kernel
                + straddle fixup)
  direct      — + gather-free candidate extraction from emitted rows
  matrix      — + sort-free matrix scoring
  full        — whole program (adds supersession cond + select/extract)

Isolated:
  landing     — the emitting landing kernel alone (block ids precomputed)
  topidx      — resident top-index search alone

Tables are passed as ARGUMENTS everywhere (closed-over device arrays become
HLO constants and blow the axon remote-compile size limit).
"""
import functools
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from bench import N_DOCS, make_queries
from acoustid_index_tpu.engine.searcher import _params_for
from probes._probe_phase3 import file_tier, mem_tier  # 10M plain tier
from acoustid_index_tpu.ops import search_kernel as sk
from acoustid_index_tpu.ops import pallas_lookup as pla
from acoustid_index_tpu.ops.layout import interleave_jnp

params = _params_for(128)
Q = params.query_len
BATCH = 256

inter_tier = {k: v for k, v in file_tier.items() if k not in ("hashes", "docids")}
inter_tier["inter"] = jax.jit(interleave_jnp)(file_tier["hashes"], file_tier["docids"])
inter_tier["inter"].block_until_ready()

rngq = np.random.default_rng(17)
_, qs, lens = make_queries(rngq, BATCH, Q, N_DOCS)
pin = np.zeros((BATCH, Q + 4), np.uint32)
pin[:, :Q] = qs
pin[:, Q] = lens
pin[:, Q + 1] = 10
pin[:, Q + 2] = 6
pin[:, Q + 3] = 10


def phase_fn(phase):
    p = params

    def one(ft, mt, pin2):
        queries = pin2[:, :Q]
        q_lens = pin2[:, Q].astype(jnp.int32)
        limits = pin2[:, Q + 1].astype(jnp.int32)
        min_scores = pin2[:, Q + 2].astype(jnp.int32)
        pcts = pin2[:, Q + 3].astype(jnp.int32)
        if phase == "full":
            out = sk._search_batch_impl(p, ft, mt, queries, q_lens, limits, min_scores, pcts)
            return jnp.sum(out["ids"].astype(jnp.uint32))
        if phase == "landing":
            # Just the emitting landing kernel: fixed block ids (cheap mix
            # so consecutive lookups hit distinct pseudo-random blocks).
            qf = queries.reshape(-1)
            nblk = ft["inter"].shape[0] // 2048
            blk = (qf % jnp.uint32(nblk)).astype(jnp.int32)
            lo, cnt, rows = pla.block_lookup_emit(ft["inter"], blk, qf)
            return jnp.sum(lo.astype(jnp.uint32)) + jnp.sum(rows[:, 0, 0])
        if phase == "topidx":
            qf = queries.reshape(-1)
            bi = ft["block_index"]
            nblk = bi.shape[0]
            nblk_pad = -(-nblk // 1024) * 1024
            if nblk_pad != nblk:
                bi = jnp.concatenate([bi, jnp.full(nblk_pad - nblk, 0xFFFFFFFF, bi.dtype)])
            mini = bi[::1024]
            ub2 = jnp.sum((mini[None, :] <= qf[:, None]).astype(jnp.int32), axis=1)
            c = jnp.clip(ub2 - 1, 0, mini.shape[0] - 1)
            lt_c, cnt_c = pla.block_lookup_resident(bi, c, qf)
            return jnp.sum(lt_c.astype(jnp.uint32)) + jnp.sum(cnt_c.astype(jnp.uint32))
        valid_q = jnp.arange(Q, dtype=jnp.int32)[None, :] < q_lens[:, None]
        f_lo, f_cnt, trunc, rows, covered = pla.tier_ranges_blocked(
            ft, queries, valid_q, p.per_hash_cap, emit=True
        )
        if phase == "emit_ranges":
            return (
                jnp.sum(f_lo.astype(jnp.uint32))
                + jnp.sum(f_cnt.astype(jnp.uint32))
                + jnp.sum(rows[:, 0, 0])
                + trunc.astype(jnp.uint32)
            )
        d, inv, totals = sk._direct_candidates(p, ft, rows, covered, f_lo, f_cnt, 2)
        if phase == "direct":
            return jnp.sum(d) + jnp.sum(totals.astype(jnp.uint32))
        o = jnp.zeros(d.shape, jnp.int32)
        win, score, cand = jax.vmap(
            lambda d1, o1, i1, ms: sk._score_matrix(p, d1, o1, i1, ms)
        )(d, o, inv.astype(jnp.int32), min_scores)
        return jnp.sum(score.astype(jnp.uint32)) + jnp.sum(d)

    @functools.partial(jax.jit, static_argnums=(0,))
    def runK(K, ft, mt, pin0):
        def body(i, acc):
            pin2 = pin0.at[:, :Q].set(pin0[:, :Q] + (acc & jnp.uint32(1)))
            return acc + one(ft, mt, pin2)

        return jax.lax.fori_loop(0, K, body, jnp.uint32(0))

    return runK


if __name__ == "__main__":
    import os

    pj = jax.device_put(jnp.asarray(pin))
    # Timed calls run DIFFERENT inputs than the warm call (the axon client
    # dedupes identical executions); K spread is wide and the slope uses
    # medians of 3 reps (single-shot K=2/12 drowned in tunnel RTT noise).
    KLO, KHI, REPS = 4, 64, 3
    phases = os.environ.get(
        "R3ATTRIB", "landing,topidx,emit_ranges,direct,matrix,full"
    ).split(",")
    for phase in phases:
        runK = phase_fn(phase)
        times = {KLO: [], KHI: []}
        for K in (KLO, KHI):
            int(jax.device_get(runK(K, inter_tier, mem_tier, pj)))  # compile + warm
            for r in range(REPS):
                pj_t = jax.device_put(jnp.asarray(pin + np.uint32(1 + r)))
                t0 = time.time()
                int(jax.device_get(runK(K, inter_tier, mem_tier, pj_t)))
                times[K].append(time.time() - t0)
        slope = (sorted(times[KHI])[REPS // 2] - sorted(times[KLO])[REPS // 2]) / (
            KHI - KLO
        )
        print(f"{phase}: {slope*1000:.2f} ms/batch ({BATCH/slope:.0f} qps)", flush=True)
    print("R3ATTRIBDONE", flush=True)
