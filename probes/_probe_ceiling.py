"""Device-ceiling probe: can an explicit-DMA lookup kernel beat the grid
pipeline's ~83ns/operand bookkeeping floor?  Fori-slope timing (K=2 vs
K=12 inside one jitted fori_loop; inputs perturbed by the previous result).

Variants:
  prod    — production block_lookup (G=32 pipelined operands)
  dma1    — explicit DMA, one 4KB block per lookup, NBUF-deep, SMEM out
  dma1v   — explicit DMA, VMEM tile outputs (vectorized one-hot merge)
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
from acoustid_index_tpu.ops.pallas_lookup import block_lookup

BLOCK = 1024
ROWS = BLOCK // 128
NBUF = int(os.environ.get("NBUF", "8"))
L = int(os.environ.get("L", "32768"))
N = 1 << 28  # 268M postings


def dma_lookup(hashes2d, blk, queries, vmem_out: bool):
    Lc = queries.shape[0]

    def kernel(blk_ref, q_ref, hbm_ref, comp_ref, scratch, sems):
        def start(j):
            slot = jax.lax.rem(j, NBUF)
            pltpu.make_async_copy(
                hbm_ref.at[pl.ds(blk_ref[j] * ROWS, ROWS), :],
                scratch.at[slot],
                sems.at[slot],
            ).start()

        for j in range(NBUF):
            start(j)

        if vmem_out:
            rows_i = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
            lanes_i = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)

            def body(t, _):
                # t indexes output tiles of 1024 lookups; inner loop of 1024
                # would blow unroll; use fori over lookups with tile accum.
                return _

            # simpler: accumulate per-lookup into VMEM flat (Lc//128, 128)
            def body2(j, _):
                slot = jax.lax.rem(j, NBUF)
                pltpu.make_async_copy(
                    hbm_ref.at[pl.ds(0, ROWS), :], scratch.at[slot], sems.at[slot]
                ).wait()
                q = q_ref[j]
                w = scratch[slot]
                comp = jnp.sum(
                    (w < q).astype(jnp.int32) + ((w == q).astype(jnp.int32) << 12)
                )

                @pl.when(j + NBUF < Lc)
                def _():
                    start(j + NBUF)

                row = jax.lax.div(j, 128)
                lane = jax.lax.rem(j, 128)
                cur = comp_ref[pl.ds(row, 1), :]
                mask = lanes_i[0:1, :] == lane
                comp_ref[pl.ds(row, 1), :] = jnp.where(mask, comp, cur)
                return 0

            jax.lax.fori_loop(0, Lc, body2, 0)
        else:

            def body(j, _):
                slot = jax.lax.rem(j, NBUF)
                pltpu.make_async_copy(
                    hbm_ref.at[pl.ds(0, ROWS), :], scratch.at[slot], sems.at[slot]
                ).wait()
                q = q_ref[j]
                w = scratch[slot]
                comp_ref[j] = jnp.sum(
                    (w < q).astype(jnp.int32) + ((w == q).astype(jnp.int32) << 12)
                )

                @pl.when(j + NBUF < Lc)
                def _():
                    start(j + NBUF)

                return 0

            jax.lax.fori_loop(0, Lc, body, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM)
            if vmem_out
            else pl.BlockSpec(memory_space=pltpu.SMEM)
        ],
        scratch_shapes=[
            pltpu.VMEM((NBUF, ROWS, 128), jnp.uint32),
            pltpu.SemaphoreType.DMA((NBUF,)),
        ],
    )
    out_shape = (
        jax.ShapeDtypeStruct((Lc // 128, 128), jnp.int32)
        if vmem_out
        else jax.ShapeDtypeStruct((Lc,), jnp.int32)
    )
    comp = pl.pallas_call(kernel, grid_spec=grid_spec, out_shape=(out_shape,))(
        blk, queries, hashes2d
    )[0]
    return comp.reshape(-1)


def main():
    rng = np.random.default_rng(0)
    hashes = jnp.arange(N, dtype=jnp.uint32)
    hashes2d = hashes.reshape(-1, 128)
    nblk = N // BLOCK
    blk = jnp.asarray(rng.integers(1, nblk - 1, L), jnp.int32)
    q = jnp.asarray(rng.integers(0, 2**32, L, dtype=np.uint32))

    # Parity first (small L)
    comp_dma = jax.jit(lambda h, b, qq: dma_lookup(h, b, qq, False))(hashes2d, blk, q)
    lo_p, cnt_p = jax.jit(block_lookup)(hashes, blk, q)
    lt = np.asarray(comp_dma) & 0xFFF
    eq = np.asarray(comp_dma) >> 12
    assert np.array_equal(np.asarray(lo_p), np.asarray(blk) * BLOCK + lt), "lo mismatch"
    assert np.array_equal(np.asarray(cnt_p), eq), "cnt mismatch"
    print("parity ok", flush=True)

    variants = {
        "prod": lambda h, b, qq: jnp.sum(block_lookup(h.reshape(-1), b, qq)[1].astype(jnp.uint32)),
        "dma1": lambda h, b, qq: jnp.sum(dma_lookup(h, b, qq, False).astype(jnp.uint32)),
        "dma1v": lambda h, b, qq: jnp.sum(dma_lookup(h, b, qq, True).astype(jnp.uint32)),
    }
    for name, fn in variants.items():
        @functools.partial(jax.jit, static_argnums=(0,))
        def runK(K, h, b0, q0, fn=fn):
            def body(i, carry):
                acc, b, qq = carry
                s = fn(h, b, qq)
                b = jnp.where(
                    jnp.arange(L) % 7 == (s % 7).astype(jnp.int32), (b + 1) % (nblk - 2), b
                ).astype(jnp.int32)
                qq = qq + (s & jnp.uint32(1))
                return (acc + s, b, qq)

            acc, _, _ = jax.lax.fori_loop(0, K, body, (jnp.uint32(0), b0, q0))
            return acc

        times = {}
        try:
            for K in (2, 12):
                int(jax.device_get(runK(K, hashes2d, blk, q)))
                t0 = time.time()
                int(jax.device_get(runK(K, hashes2d, blk, q)))
                times[K] = time.time() - t0
            slope = (times[12] - times[2]) / 10
            print(f"{name}: {slope*1000:.2f} ms / {L} lookups = {slope/L*1e9:.0f} ns/lookup", flush=True)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
