"""Can XLA row-gathers replace the Pallas block lookup?

The Pallas per-lookup floor is ~133-171ns of pipeline bookkeeping.  If
`table2d[blk_ids]` (gather of whole 1024-entry rows) lowers to efficient
dynamic slices, a gather + fused compare-sum could beat it: 32768 rows x
4KB = 128MB of HBM reads ~ 0.2ms at full bandwidth.
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

BLOCK = 1024
N = 1 << 28  # 268M postings
L = 32768

hashes2d = jnp.arange(N, dtype=jnp.uint32).reshape(-1, BLOCK)
nblk = N // BLOCK
rng = np.random.default_rng(0)
blk = jnp.asarray(rng.integers(1, nblk - 1, L), jnp.int32)
q = jnp.asarray(rng.integers(0, 2**32, L, dtype=np.uint32))


@jax.jit
def rowgather_count(table2d, blk, q):
    rows = table2d[blk]  # (L, BLOCK) row gather
    lt = jnp.sum((rows < q[:, None]).astype(jnp.int32), axis=1)
    eq = jnp.sum((rows == q[:, None]).astype(jnp.int32), axis=1)
    return (lt + (eq << 12)).sum()


@jax.jit
def rowgather_pair_count(table2d, blk, q):
    r0 = table2d[blk]
    r1 = table2d[jnp.minimum(blk + 1, table2d.shape[0] - 1)]
    rows = jnp.concatenate([r0, r1], axis=1)  # (L, 2*BLOCK)
    lt = jnp.sum((rows < q[:, None]).astype(jnp.int32), axis=1)
    eq = jnp.sum((rows == q[:, None]).astype(jnp.int32), axis=1)
    return (lt + (eq << 12)).sum()


from acoustid_index_tpu.ops.pallas_lookup import block_lookup


@jax.jit
def pallas_count(table, blk, q):
    lo, cnt = block_lookup(table, blk, q)
    return (lo + (cnt << 12)).sum()


def bench(name, fn, table, blk, q):
    r = fn(table, blk, q)
    r.block_until_ready()
    qs = [q + np.uint32(i) for i in range(10)]
    blks = [jnp.minimum(blk + i, table.shape[0] - 2 if table.ndim == 2 else (N // BLOCK) - 2) for i in range(10)]
    for b in blks:
        b.block_until_ready()
    t0 = time.time()
    for i in range(10):
        r = fn(table, blks[i], qs[i])
    r.block_until_ready()
    dt = (time.time() - t0) / 10
    print(f"{name}: {dt*1000:.2f}ms ({dt/L*1e9:.0f}ns/lookup) result={int(r)}", flush=True)


bench("rowgather(1 block)", rowgather_count, hashes2d, blk, q)
bench("rowgather(2 blocks)", rowgather_pair_count, hashes2d, blk, q)
bench("pallas single", pallas_count, hashes2d.reshape(-1), blk, q)
