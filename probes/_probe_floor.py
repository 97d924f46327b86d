"""Bisect the per-lookup cost floor of the pipelined block kernel."""
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK = 1024
ROWS = BLOCK // 128
G = int(os.environ.get("G", "8"))
VARIANT = sys.argv[1] if len(sys.argv) > 1 else "full"


def make(variant):
    def lookup(hashes, blk0, blk1, queries):
        L = queries.shape[0]
        hashes2d = hashes.reshape(-1, 128)

        def kernel(blk0_ref, blk1_ref, q_ref, *refs):
            h_refs = refs[: 2 * G]
            comp_ref = refs[2 * G]
            i = pl.program_id(0)
            base = i * G
            for k in range(G):
                j = base + k
                b0 = h_refs[2 * k][:, :]
                if variant == "empty":
                    comp = jnp.int32(k)
                elif variant == "noreduce":
                    q = q_ref[j]
                    v0 = (b0 < q).astype(jnp.int32)
                    comp = v0[0, 0]
                elif variant == "oneblock":
                    q = q_ref[j]
                    v0 = (b0 < q).astype(jnp.int32) + ((b0 == q).astype(jnp.int32) << 12)
                    comp = jnp.sum(v0)
                else:  # full
                    q = q_ref[j]
                    flag = (blk1_ref[j] > 0).astype(jnp.int32)
                    b1 = h_refs[2 * k + 1][:, :]
                    v0 = (b0 < q).astype(jnp.int32) + ((b0 == q).astype(jnp.int32) << 12)
                    v1 = (b1 < q).astype(jnp.int32) + ((b1 == q).astype(jnp.int32) << 12)
                    comp = jnp.sum(v0 + flag * v1)
                comp_ref[j] = comp

        def in_spec(k):
            half = k % 2
            idx = k // 2
            if half == 0:
                return pl.BlockSpec((ROWS, 128), lambda i, b0, b1, q, idx=idx: (b0[i * G + idx], 0))
            return pl.BlockSpec((ROWS, 128), lambda i, b0, b1, q, idx=idx: (b1[i * G + idx], 0))

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(L // G,),
            in_specs=[in_spec(k) for k in range(2 * G)],
            out_specs=[pl.BlockSpec(None, lambda i, b0, b1, q: (0,), memory_space=pltpu.MemorySpace.SMEM)],
        )
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=(jax.ShapeDtypeStruct((L,), jnp.int32),),
        )(blk0, blk1, queries, *([hashes2d] * (2 * G)))[0]

    return lookup


N = 1 << 28
hashes = jnp.arange(N, dtype=jnp.uint32)
nblk = N // BLOCK
L = 32768
rng = np.random.default_rng(0)
b0 = jnp.asarray(rng.integers(1, nblk - 1, L), jnp.int32)
b1 = jnp.asarray(np.minimum(np.asarray(b0) + 1, nblk - 1), jnp.int32)
q = jnp.asarray(rng.integers(0, 2**32, L, dtype=np.uint32))

fn = jax.jit(make(VARIANT))
r = fn(hashes, b0, b1, q).sum()
r.block_until_ready()
t0 = time.time()
for _ in range(10):
    r = fn(hashes, b0, b1, q).sum()
r.block_until_ready()
dt = (time.time() - t0) / 10
print(f"{VARIANT} G={G}: {dt*1000:.2f}ms ({dt/L*1e9:.0f}ns/lookup)", flush=True)
