import time
import numpy as np
import jax, jax.numpy as jnp
from probes._pairkernel import block_lookup_pair
from acoustid_index_tpu.ops.pallas_lookup import block_lookup, BLOCK

N = 1 << 28
hashes = jnp.arange(N, dtype=jnp.uint32)
nblk = N // BLOCK
L = 32768
rng = np.random.default_rng(0)
blk = jnp.asarray(rng.integers(1, nblk - 1, L), jnp.int32)
q = jnp.asarray(rng.integers(0, 2**32, L, dtype=np.uint32))

@jax.jit
def run_single(h, b, q):
    lo, cnt = block_lookup(h, b, q)
    return lo.sum() + cnt.sum()

@jax.jit
def run_pair(h, b, q):
    lo, cnt = block_lookup_pair(h, b, jnp.zeros_like(b), q)
    return lo.sum() + cnt.sum()

a = run_single(hashes, blk, q); a.block_until_ready()
b = run_pair(hashes, blk, q); b.block_until_ready()
assert int(a) == int(b), (int(a), int(b))
for name, fn in (("single", run_single), ("pair", run_pair)):
    t0 = time.time()
    for _ in range(10):
        r = fn(hashes, blk, q)
    r.block_until_ready()
    dt = (time.time() - t0) / 10
    print(f"{name}: {dt*1000:.2f}ms ({dt/L*1e9:.0f}ns/lookup)", flush=True)
