"""Explicit-DMA lookup kernel probe: one contiguous (16,128) HBM->VMEM copy
per lookup (blocks b0 and b0+1 are adjacent), NBUF-deep software pipeline,
SMEM scalar output.  Compared against the grid-pipelined production kernel
(~166ns/lookup, cost dominated by per-operand grid bookkeeping)."""
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK = 1024
ROWS = BLOCK // 128  # 8
NBUF = int(os.environ.get("NBUF", "8"))


def block_lookup_pair_dma(hashes, blk0, flag, queries):
    """hashes must carry one sentinel block of padding past the last real
    block (the fixed window is [b0, b0+1]).  flag gates the second block."""
    L = queries.shape[0]
    hashes2d = hashes.reshape(-1, 128)

    def kernel(blk0_ref, flag_ref, q_ref, hbm_ref, comp_ref, scratch, sems):
        def start(j):
            slot = jax.lax.rem(j, NBUF)
            row0 = blk0_ref[j] * ROWS
            pltpu.make_async_copy(
                hbm_ref.at[pl.ds(row0, 2 * ROWS), :],
                scratch.at[slot],
                sems.at[slot],
            ).start()

        def wait_and_compute(j):
            slot = jax.lax.rem(j, NBUF)
            pltpu.make_async_copy(
                hbm_ref.at[pl.ds(0, 2 * ROWS), :], scratch.at[slot], sems.at[slot]
            ).wait()
            q = q_ref[j]
            flag = flag_ref[j]
            w = scratch[slot]
            v = (w < q).astype(jnp.int32) + ((w == q).astype(jnp.int32) << 12)
            rows = jax.lax.broadcasted_iota(jnp.int32, (2 * ROWS, 128), 0)
            gate = jnp.where(rows < ROWS, 1, flag)
            comp_ref[j] = jnp.sum(v * gate)

        for j in range(min(NBUF, L)):
            start(j)

        def body(j, _):
            wait_and_compute(j)

            @pl.when(j + NBUF < L)
            def _():
                start(j + NBUF)

            return 0

        jax.lax.fori_loop(0, L, body, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,  # blk0, flag, queries
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        scratch_shapes=[
            pltpu.VMEM((NBUF, 2 * ROWS, 128), jnp.uint32),
            pltpu.SemaphoreType.DMA((NBUF,)),
        ],
    )
    comp = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(jax.ShapeDtypeStruct((L,), jnp.int32),),
    )(blk0, flag, queries, hashes2d)[0]
    lt = comp & jnp.int32(0xFFF)
    eq = comp >> 12
    lo = blk0 * BLOCK + lt
    return lo, eq


N = 1 << 28
nblk = N // BLOCK
# one sentinel block of padding for the fixed two-block window
hashes = jnp.concatenate(
    [jnp.arange(N, dtype=jnp.uint32), jnp.full(BLOCK, 0xFFFFFFFF, jnp.uint32)]
)
L = 32768
rng = np.random.default_rng(0)
b0 = jnp.asarray(rng.integers(1, nblk - 1, L), jnp.int32)
flag = jnp.asarray(rng.integers(0, 2, L), jnp.int32)
q = jnp.asarray(rng.integers(0, 2**32, L, dtype=np.uint32))

fn = jax.jit(block_lookup_pair_dma)
lo, cnt = fn(hashes, b0, flag, q)
lo.block_until_ready()

# reference: production kernel on the same inputs (flag -> blk1)
from probes._pairkernel import block_lookup_pair

b1 = jnp.where(flag > 0, jnp.minimum(b0 + 1, nblk - 1), 0)
lo_a, cnt_a = jax.jit(block_lookup_pair)(hashes[:N], b0, b1, q)
assert np.array_equal(np.asarray(lo_a), np.asarray(lo)), "lo mismatch"
assert np.array_equal(np.asarray(cnt_a), np.asarray(cnt)), "cnt mismatch"
print("parity ok", flush=True)


@jax.jit
def run(h, b0, f, q):
    lo, cnt = block_lookup_pair_dma(h, b0, f, q)
    return lo.sum() + cnt.sum()


r = run(hashes, b0, flag, q)
r.block_until_ready()
t0 = time.time()
for _ in range(10):
    r = run(hashes, b0, flag, q)
r.block_until_ready()
dt = (time.time() - t0) / 10
print(f"dma NBUF={NBUF}: {dt*1000:.2f}ms ({dt/L*1e9:.0f}ns/lookup)", flush=True)
