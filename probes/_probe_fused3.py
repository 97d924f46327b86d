"""Fused-kernel round 3: docid emission as VECTOR rows, not SMEM scalars.

probe2 showed the (16,128) interleaved operand is free (40ns e0 vs 42
baseline) and each per-lookup SMEM scalar docid store costs ~64ns (the
vector->scalar transfer).  This probe emits the (2,128) docid rows
containing [lt, lt+E) as an output VMEM tile instead — sublane reductions
+ vector stores only — and extracts lanes OUTSIDE the kernel with
elementwise one-hot row-dots (pure VPU work in XLA).

Variants:
    land_g256            — baseline
    rowemit_gG           — comp scalar + (2,128) docid rows per lookup
    rowemit_gG + extract — plus the XLA-side lane extraction to (d0..dE-1)
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
N = 1 << 27
NBLK = N // BLOCK


def rowemit_call(G, inter2d, blk, queries):
    """comp (L,) SMEM + rows (2L, 128) VMEM: rows 2j, 2j+1 are the docid
    rows r, min(r+1, ROWS-1) where r = lt(j) // 128."""
    Lc = queries.shape[0]

    def kernel(blk_ref, q_ref, *refs):
        t_refs = refs[:G]
        comp_ref = refs[G]
        rows_ref = refs[G + 1]
        i = pl.program_id(0)
        rows_iota = jax.lax.broadcasted_iota(jnp.int32, (ROWS, 128), 0)
        base = i * G
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
            r = jnp.minimum(lt >> 7, ROWS - 1)
            r2 = jnp.minimum(r + 1, ROWS - 1)
            row0 = jnp.sum(jnp.where(rows_iota == r, dd, 0), axis=0, keepdims=True)
            row1 = jnp.sum(jnp.where(rows_iota == r2, dd, 0), axis=0, keepdims=True)
            rows_ref[2 * k : 2 * k + 1, :] = row0
            rows_ref[2 * k + 1 : 2 * k + 2, :] = row1

    def in_spec(idx):
        return pl.BlockSpec(
            (2 * ROWS, 128), lambda i, b, q, idx=idx: (b[i * G + idx], 0)
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(Lc // G,),
        in_specs=[in_spec(k) for k in range(G)],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((2 * G, 128), lambda i, b, q: (i, 0)),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((Lc,), jnp.int32),
            jax.ShapeDtypeStruct((2 * Lc, 128), jnp.int32),
        ),
    )(blk, queries, *([inter2d] * G))


def extract(comp, rows, E):
    """XLA-side: d_e = docids[lt + e] from the emitted rows."""
    Lc = comp.shape[0]
    lt = comp & 0xFFF
    c = lt & 127
    r2 = rows.reshape(Lc, 2, 128)
    lanes = jnp.arange(128, dtype=jnp.int32)[None, :]
    outs = []
    for e in range(E):
        ce = c + e
        use_hi = ce >= 128
        lane = ce & 127
        sel = (lanes == lane[:, None]).astype(jnp.int32)
        v0 = jnp.sum(r2[:, 0, :] * sel, axis=1)
        v1 = jnp.sum(r2[:, 1, :] * sel, axis=1)
        outs.append(jnp.where(use_hi, v1, v0))
    return outs


def make_fn(G, E):
    def fn(inter2d, blk, queries):
        comp, rows = rowemit_call(G, inter2d, blk, queries)
        r = comp
        if E:
            for d in extract(comp, rows, E):
                r = r + d
        else:
            r = r + rows[:, 0].astype(jnp.int32)
        return r

    return fn


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
    rm = np.empty((NBLK, 2 * ROWS, 128), np.uint32)
    rm[:, :ROWS, :] = hashes.reshape(NBLK, ROWS, 128)
    rm[:, ROWS:, :] = docids.reshape(NBLK, ROWS, 128)
    rm2d = jnp.asarray(rm.reshape(-1, 128))
    del rm

    # correctness: d0/d1 match host truth where run starts in-block
    rng = np.random.default_rng(1)
    blk_s = np.asarray(rng.integers(1, NBLK - 1, 2048), np.int32)
    pos = rng.integers(0, BLOCK, 2048)
    q_s = hashes.reshape(NBLK, BLOCK)[blk_s, pos].copy()

    comp, rows = jax.jit(functools.partial(rowemit_call, 32))(
        rm2d, jnp.asarray(blk_s), jnp.asarray(q_s)
    )
    d0, d1 = jax.jit(functools.partial(extract, E=2))(comp, rows)
    comp = np.asarray(comp)
    d0 = np.asarray(d0).astype(np.uint32)
    d1 = np.asarray(d1).astype(np.uint32)
    bad = 0
    for i in range(2048):
        b, q = int(blk_s[i]), int(q_s[i])
        h = hashes[b * BLOCK : (b + 1) * BLOCK]
        d = docids[b * BLOCK : (b + 1) * BLOCK]
        lt = int(np.sum(h < q))
        e0 = int(d[lt]) if lt < BLOCK else 0
        e1 = int(d[lt + 1]) if lt + 1 < BLOCK else 0
        if (comp[i] & 0xFFF) != lt or (lt < BLOCK - 2 and (d0[i] != e0 or d1[i] != e1)):
            bad += 1
            if bad <= 3:
                print(f"  mismatch i={i}: lt {comp[i]&0xFFF} vs {lt}, d0 {d0[i]} vs {e0}, d1 {d1[i]} vs {e1}")
    print(f"parity: {2048-bad}/2048 ok", flush=True)

    for G in (128, 256):
        bench(f"rowemit_g{G}_e0", make_fn(G, 0), rm2d, NBLK)
        bench(f"rowemit_g{G}_e2", make_fn(G, 2), rm2d, NBLK)
        bench(f"rowemit_g{G}_e4", make_fn(G, 4), rm2d, NBLK)
    print("FUSED3DONE", flush=True)


if __name__ == "__main__":
    main()
