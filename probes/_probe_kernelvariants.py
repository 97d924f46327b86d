"""Kernel-variant sweep for the two hot lookup kernels (fori-slope timed):

  land_g{G}_onehot — production landing-block kernel (one-hot tile merge)
  land_g{G}_smem   — same but SMEM scalar outputs (no one-hot merge)
  res_g{G}_onehot  — production resident top-index kernel
  res_g{G}_smem    — SMEM scalar outputs

The one-hot merge costs ~10-15 VPU ops per lookup; SMEM scalar stores are
~2 scalar ops but serialize on the scalar core.  Which wins is empirical.
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
N = 1 << 28  # landing table: 268M postings
NTOP = N // BLOCK  # resident table: the sampled top index (~262k entries)


def make_landing(G, out_mode):
    def lookup(hashes2d, blk, queries):
        Lc = queries.shape[0]

        def kernel(blk_ref, q_ref, *refs):
            h_refs = refs[:G]
            comp_ref = refs[G]
            i = pl.program_id(0)
            base = i * G
            if out_mode == "onehot":
                rows = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
                lanes = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
                comp_tile = comp_ref[:, :]
                for k in range(G):
                    j = base + k
                    q = q_ref[j]
                    b0 = h_refs[k][:, :]
                    comp = jnp.sum((b0 < q).astype(jnp.int32) + ((b0 == q).astype(jnp.int32) << 12))
                    row = (j % 1024) // 128
                    lane = j % 128
                    mask = jnp.logical_and(rows == row, lanes == lane)
                    comp_tile = jnp.where(mask, comp, comp_tile)
                comp_ref[:, :] = comp_tile
            else:
                for k in range(G):
                    j = base + k
                    q = q_ref[j]
                    b0 = h_refs[k][:, :]
                    comp_ref[j] = jnp.sum(
                        (b0 < q).astype(jnp.int32) + ((b0 == q).astype(jnp.int32) << 12)
                    )

        def in_spec(idx):
            return pl.BlockSpec((ROWS, 128), lambda i, b, q, idx=idx: (b[i * G + idx], 0))

        if out_mode == "onehot":
            out_specs = [pl.BlockSpec((8, 128), lambda i, b, q: (i * G // 1024, 0))]
            out_shape = (jax.ShapeDtypeStruct((Lc // 1024 * 8, 128), jnp.int32),)
        else:
            out_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)]
            out_shape = (jax.ShapeDtypeStruct((Lc,), jnp.int32),)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(Lc // G,),
            in_specs=[in_spec(k) for k in range(G)],
            out_specs=out_specs,
        )
        comp = pl.pallas_call(kernel, grid_spec=grid_spec, out_shape=out_shape)(
            blk, queries, *([hashes2d] * G)
        )[0]
        return comp.reshape(-1)[:Lc]

    return lookup


def make_resident(G, out_mode):
    def lookup(hashes2d, blk, queries):
        Lc = queries.shape[0]
        r_all = hashes2d.shape[0]

        def kernel(blk_ref, q_ref, h_ref, comp_ref):
            i = pl.program_id(0)
            base = i * G
            if out_mode == "onehot":
                rows = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
                lanes = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
                comp_tile = comp_ref[:, :]
                for k in range(G):
                    j = base + k
                    q = q_ref[j]
                    c = blk_ref[j]
                    b0 = h_ref[pl.ds(c * ROWS, ROWS), :]
                    comp = jnp.sum((b0 < q).astype(jnp.int32) + ((b0 == q).astype(jnp.int32) << 12))
                    row = (j % 1024) // 128
                    lane = j % 128
                    mask = jnp.logical_and(rows == row, lanes == lane)
                    comp_tile = jnp.where(mask, comp, comp_tile)
                comp_ref[:, :] = comp_tile
            else:
                for k in range(G):
                    j = base + k
                    q = q_ref[j]
                    c = blk_ref[j]
                    b0 = h_ref[pl.ds(c * ROWS, ROWS), :]
                    comp_ref[j] = jnp.sum(
                        (b0 < q).astype(jnp.int32) + ((b0 == q).astype(jnp.int32) << 12)
                    )

        if out_mode == "onehot":
            out_specs = [pl.BlockSpec((8, 128), lambda i, *_s: (i * G // 1024, 0))]
            out_shape = (jax.ShapeDtypeStruct((Lc // 1024 * 8, 128), jnp.int32),)
        else:
            out_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)]
            out_shape = (jax.ShapeDtypeStruct((Lc,), jnp.int32),)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(Lc // G,),
            in_specs=[pl.BlockSpec((r_all, 128), lambda i, *_s: (0, 0))],
            out_specs=out_specs,
        )
        comp = pl.pallas_call(kernel, grid_spec=grid_spec, out_shape=out_shape)(
            blk, queries, hashes2d
        )[0]
        return comp.reshape(-1)[:Lc]

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
        print(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)


def main():
    big = jnp.arange(N, dtype=jnp.uint32).reshape(-1, 128)
    top = jnp.arange(NTOP, dtype=jnp.uint32)
    top_pad = -(-NTOP // BLOCK) * BLOCK
    top = jnp.concatenate([top, jnp.full(top_pad - NTOP, 0xFFFFFFFF, jnp.uint32)]).reshape(-1, 128)

    # parity spot check: smem vs onehot agree
    rng = np.random.default_rng(1)
    blk_s = jnp.asarray(rng.integers(1, N // BLOCK - 1, 2048), jnp.int32)
    q_s = jnp.asarray(rng.integers(0, 2**32, 2048, dtype=np.uint32))
    a = jax.jit(make_landing(32, "onehot"))(big, blk_s, q_s)
    b = jax.jit(make_landing(32, "smem"))(big, blk_s, q_s)
    assert np.array_equal(np.asarray(a), np.asarray(b)), "landing smem parity"
    print("parity ok", flush=True)

    import os as _os

    lands = tuple(int(x) for x in _os.environ.get("SWEEP_LAND", "32,64").split(",") if x)
    ress = tuple(int(x) for x in _os.environ.get("SWEEP_RES", "32,64,128").split(",") if x)
    modes = tuple(m for m in _os.environ.get("SWEEP_MODES", "onehot,smem").split(",") if m)
    for G in lands:
        for mode in modes:
            bench(f"land_g{G}_{mode}", make_landing(G, mode), big, N // BLOCK)
    for G in ress:
        for mode in modes:
            bench(f"res_g{G}_{mode}", make_resident(G, mode), top, top_pad // BLOCK)


if __name__ == "__main__":
    main()
