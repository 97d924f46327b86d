"""Is the ~170ns/lookup floor bytes-bound or latency-bound?  Gather rows of
varying width + fused compare-reduce, forced execution."""
import time
import numpy as np
import jax
import jax.numpy as jnp

N = 1 << 28
L = 32768
rng = np.random.default_rng(0)
base = jnp.arange(N, dtype=jnp.uint32)

@jax.jit
def fold(acc, lt, eq):
    return acc + jnp.sum(lt.astype(jnp.uint32)) + jnp.sum(eq.astype(jnp.uint32))

for W in (128, 256, 512, 1024, 2048, 4096):
    table = base.reshape(-1, W)
    nrow = table.shape[0]

    @jax.jit
    def per_lookup(t, blk, q):
        rows = t[blk]
        lt = jnp.sum((rows < q[:, None]).astype(jnp.int32), axis=1)
        eq = jnp.sum((rows == q[:, None]).astype(jnp.int32), axis=1)
        return lt, eq

    blks = [jnp.asarray(rng.integers(1, nrow - 2, L), jnp.int32) for _ in range(10)]
    qs = [jnp.asarray(rng.integers(0, 2**32, L, dtype=np.uint32)) for _ in range(10)]
    jax.block_until_ready(blks); jax.block_until_ready(qs)
    lt, eq = per_lookup(table, blks[0], qs[0])
    jax.block_until_ready((lt, eq))
    t0 = time.time()
    acc = jnp.uint32(0)
    for i in range(10):
        lt, eq = per_lookup(table, blks[i], qs[i])
        acc = fold(acc, lt, eq)
    int(jax.device_get(acc))
    dt = (time.time() - t0) / 10
    print(f"W={W}: {dt*1000:.2f}ms ({dt/L*1e9:.0f}ns/lookup, {L*W*4/dt/1e9:.0f}GB/s)", flush=True)
