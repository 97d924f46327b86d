"""Fori-slope attribution INSIDE tier_ranges_blocked on the 10M file tier.

Cumulative stages:
  mini    — dense mini-index compare picking the top-index chunk
  top     — + resident top-index scan (landing block per lookup)
  land    — + single-operand landing-block kernel
  full    — + straddle fixup (pair kernel) + clamps = tier_ranges_blocked
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
from probes._probe_phase3 import file_tier
from acoustid_index_tpu.ops import pallas_lookup as plk

params = _params_for(128)
Q = params.query_len
B = 256

rngq = np.random.default_rng(17)
_, qs, lens = make_queries(rngq, B, Q, N_DOCS)
valid = np.arange(Q)[None, :] < lens[:, None]


def stage_fn(stage):
    tier = file_tier
    BLOCK = plk.BLOCK

    def one(tier, queries, valid_q):
        if stage == "full":
            lo, cnt, tr = plk.tier_ranges_blocked(tier, queries, valid_q, params.per_hash_cap)
            return jnp.sum(lo.astype(jnp.uint32)) + jnp.sum(cnt.astype(jnp.uint32))
        block_index = tier["block_index"]
        nblk = block_index.shape[0]
        qf = queries.reshape(-1)
        nblk_pad = -(-nblk // BLOCK) * BLOCK
        bi = block_index
        if nblk_pad != nblk:
            bi = jnp.concatenate([bi, jnp.full(nblk_pad - nblk, 0xFFFFFFFF, bi.dtype)])
        mini = bi[::BLOCK]
        ub2 = jnp.sum((mini[None, :] <= qf[:, None]).astype(jnp.int32), axis=1)
        c = jnp.clip(ub2 - 1, 0, mini.shape[0] - 1)
        if stage == "mini":
            return jnp.sum(c.astype(jnp.uint32))
        lt_c, cnt_c = plk.block_lookup_resident(bi, c, qf)
        ub = c * BLOCK + lt_c + cnt_c
        if stage == "top":
            return jnp.sum(ub.astype(jnp.uint32))
        n_items = jnp.sum(tier["seg_len"]).astype(jnp.int32)
        blk_last = jnp.maximum((n_items - 1) // BLOCK, 0)
        blk = jnp.clip(jnp.clip(ub - 1, 0, blk_last), 0, nblk - 1).astype(jnp.int32)
        live = jnp.logical_and(valid_q.reshape(-1), n_items > 0)
        blk_main = jnp.where(live, blk, 0)
        lo_flat, cnt_flat = plk.block_lookup(tier["hashes"], blk_main, qf)
        return jnp.sum(lo_flat.astype(jnp.uint32)) + jnp.sum(cnt_flat.astype(jnp.uint32))

    @functools.partial(jax.jit, static_argnums=(0,))
    def runK(K, t, q0, v0):
        def body(i, acc):
            q2 = q0 + (acc & jnp.uint32(1))
            return acc + one(t, q2, v0)

        return jax.lax.fori_loop(0, K, body, jnp.uint32(0))

    return runK


if __name__ == "__main__":
    qj = jax.device_put(jnp.asarray(qs))
    vj = jax.device_put(jnp.asarray(valid))
    for stage in ("mini", "top", "land", "full"):
        runK = stage_fn(stage)
        times = {}
        for K in (2, 12):
            int(jax.device_get(runK(K, file_tier, qj, vj)))
            t0 = time.time()
            int(jax.device_get(runK(K, file_tier, qj, vj)))
            times[K] = time.time() - t0
        slope = (times[12] - times[2]) / 10
        print(f"{stage}: {slope*1000:.3f} ms/batch", flush=True)
    print("RANGESPLITDONE", flush=True)
