"""Feasibility probe: FUSED landing-block kernel that also emits docids.

Layout under test: interleaved blocks — each 1024-posting block stored as a
(16, 128) tile, rows 0-7 the hashes, rows 8-15 the docids.  One operand DMA
per lookup then carries BOTH arrays, so the kernel can emit, per lookup:

    comp  = (#entries < q) + (#entries == q) << 12      (as today)
    d[e]  = docids[lt + e]  for e < E                    (new)

eliminating the separate XLA gather phase (~20ns per random posting load)
for runs of length <= E.  The kernel is DMA-issue-bound (~41ns/lookup at
G=256, body-insensitive), so the extra one-hot extractions should ride
free; this probe measures whether that holds and how the doubled per-lookup
DMA bytes (8KB vs 4KB) price in.

Variants (fori-slope timed):
    land_gG       — production single-block kernel (baseline)
    fused_gG_eE   — interleaved operand, comp + E docid SMEM outputs
"""
import functools
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")

BLOCK = 1024
ROWS = BLOCK // 128
L = 32768
N = 1 << 27  # 134M postings (interleaved table = 1GB HBM)
NBLK = N // BLOCK


def make_landing(G):
    def lookup(hashes2d, blk, queries):
        Lc = queries.shape[0]

        def kernel(blk_ref, q_ref, *refs):
            h_refs = refs[:G]
            comp_ref = refs[G]
            i = pl.program_id(0)
            base = i * G
            for k in range(G):
                j = base + k
                q = q_ref[j]
                b0 = h_refs[k][:, :]
                comp_ref[j] = jnp.sum(
                    (b0 < q).astype(jnp.int32) + ((b0 == q).astype(jnp.int32) << 12)
                )

        def in_spec(idx):
            return pl.BlockSpec((ROWS, 128), lambda i, b, q, idx=idx: (b[i * G + idx], 0))

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(Lc // G,),
            in_specs=[in_spec(k) for k in range(G)],
            out_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        )
        comp = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=(jax.ShapeDtypeStruct((Lc,), jnp.int32),),
        )(blk, queries, *([hashes2d] * G))[0]
        return comp

    return lookup


def fused_call(G, E, inter2d, blk, queries):
    """Raw (comp, d0..dE-1) outputs of the fused kernel."""
    Lc = queries.shape[0]

    def kernel(blk_ref, q_ref, *refs):
        t_refs = refs[:G]
        comp_ref = refs[G]
        d_refs = refs[G + 1 : G + 1 + E]
        i = pl.program_id(0)
        base = i * G
        flat = (
            jax.lax.broadcasted_iota(jnp.int32, (ROWS, 128), 0) * 128
            + jax.lax.broadcasted_iota(jnp.int32, (ROWS, 128), 1)
        )
        for k in range(G):
            j = base + k
            q = q_ref[j]
            tile = t_refs[k]
            hh = tile[0:ROWS, :]
            dd = jax.lax.bitcast_convert_type(tile[ROWS : 2 * ROWS, :], jnp.int32)
            comp = jnp.sum(
                (hh < q).astype(jnp.int32) + ((hh == q).astype(jnp.int32) << 12)
            )
            comp_ref[j] = comp
            lt = comp & 0xFFF
            for e in range(E):
                d_refs[e][j] = jnp.sum(jnp.where(flat == lt + e, dd, 0))

    def in_spec(idx):
        return pl.BlockSpec(
            (2 * ROWS, 128), lambda i, b, q, idx=idx: (b[i * G + idx], 0)
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(Lc // G,),
        in_specs=[in_spec(k) for k in range(G)],
        out_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * (1 + E),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=tuple([jax.ShapeDtypeStruct((Lc,), jnp.int32)] * (1 + E)),
    )(blk, queries, *([inter2d] * G))


def make_fused(G, E):
    def lookup(inter2d, blk, queries):
        outs = fused_call(G, E, inter2d, blk, queries)
        return outs[0] + sum(outs[1:])

    return lookup


def bench(name, fn, table2d, nblocks):
    rng = np.random.default_rng(0)
    blk = jnp.asarray(rng.integers(1, nblocks - 1, L), jnp.int32)
    q = jnp.asarray(rng.integers(0, 2**32, L, dtype=np.uint32))

    @functools.partial(jax.jit, static_argnums=(0,))
    def runK(K, h, b0, q0):
        def body(i, carry):
            acc, b, qq = carry
            s = jnp.sum(fn(h, b, qq).astype(jnp.uint32))
            b = jnp.where(
                jnp.arange(L) % 7 == (s % 7).astype(jnp.int32), (b + 1) % (nblocks - 2), b
            ).astype(jnp.int32)
            qq = qq + (s & jnp.uint32(1))
            return (acc + s, b, qq)

        acc, _, _ = jax.lax.fori_loop(0, K, body, (jnp.uint32(0), b0, q0))
        return acc

    try:
        times = {}
        for K in (2, 12):
            int(jax.device_get(runK(K, table2d, blk, q)))
            t0 = time.time()
            int(jax.device_get(runK(K, table2d, blk, q)))
            times[K] = time.time() - t0
        slope = (times[12] - times[2]) / 10
        print(f"{name}: {slope*1000:.2f} ms / {L} = {slope/L*1e9:.0f} ns/lookup", flush=True)
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__}: {str(e)[:300]}", flush=True)


def main():
    hashes = np.arange(N, dtype=np.uint32)
    docids = (np.arange(N, dtype=np.uint32) * 2654435761) & np.uint32(0xFFFFFFFF)
    plain2d = jnp.asarray(hashes.reshape(-1, 128))
    inter = np.empty((NBLK, 2 * ROWS, 128), np.uint32)
    inter[:, :ROWS, :] = hashes.reshape(NBLK, ROWS, 128)
    inter[:, ROWS:, :] = docids.reshape(NBLK, ROWS, 128)
    inter2d = jnp.asarray(inter.reshape(-1, 128))
    del inter

    # Correctness spot check: fused comp + docids match host truth.
    rng = np.random.default_rng(1)
    blk_s = np.asarray(rng.integers(1, NBLK - 1, 2048), np.int32)
    pos = rng.integers(0, BLOCK, 2048)
    q_s = hashes.reshape(NBLK, BLOCK)[blk_s, pos].copy()
    miss = rng.random(2048) < 0.5
    q_s[miss] = rng.integers(0, 2**32, miss.sum(), dtype=np.uint32)

    def host_truth(b, q):
        h = hashes[b * BLOCK : (b + 1) * BLOCK]
        d = docids[b * BLOCK : (b + 1) * BLOCK]
        lt = int(np.sum(h < q))
        eq = int(np.sum(h == q))
        d0 = int(d[lt]) if lt < BLOCK else 0
        d1 = int(d[lt + 1]) if lt + 1 < BLOCK else 0
        return lt + (eq << 12), d0, d1

    outs = jax.jit(functools.partial(fused_call, 32, 2))(
        inter2d, jnp.asarray(blk_s), jnp.asarray(q_s)
    )
    comp = np.asarray(outs[0])
    d0 = np.asarray(outs[1]).astype(np.uint32)
    d1 = np.asarray(outs[2]).astype(np.uint32)
    bad = 0
    for i in range(2048):
        c, e0, e1 = host_truth(int(blk_s[i]), int(q_s[i]))
        if comp[i] != c or ((c & 0xFFF) < BLOCK - 2 and (d0[i] != e0 or d1[i] != e1)):
            bad += 1
            if bad <= 3:
                print(f"  mismatch i={i}: comp {comp[i]} vs {c}, d0 {d0[i]} vs {e0}, d1 {d1[i]} vs {e1}")
    print(f"parity: {2048-bad}/2048 ok", flush=True)

    gs_land = tuple(int(x) for x in os.environ.get("SWEEP_LAND", "256,512").split(",") if x)
    gs_fused = tuple(int(x) for x in os.environ.get("SWEEP_FUSED", "128,256,512").split(",") if x)
    es = tuple(int(x) for x in os.environ.get("SWEEP_E", "2,4").split(",") if x)
    for G in gs_land:
        bench(f"land_g{G}", make_landing(G), plain2d, NBLK)
    for G in gs_fused:
        for E in es:
            bench(f"fused_g{G}_e{E}", make_fused(G, E), inter2d, NBLK)
    print("FUSEDDONE", flush=True)


if __name__ == "__main__":
    main()
