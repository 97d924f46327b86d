import time
import numpy as np
import jax, jax.numpy as jnp
from probes._pairkernel import block_lookup_pair
from acoustid_index_tpu.ops.pallas_lookup import BLOCK

N = 1 << 28  # 268M postings => 262144 blocks
hashes = jnp.arange(N, dtype=jnp.uint32)
nblk = N // BLOCK
L = 32768
rng = np.random.default_rng(0)

cases = {
  "random+pair": (rng.integers(1, nblk - 1, L), None),          # 2 DMAs per lookup
  "random+solo": (rng.integers(1, nblk - 1, L), 0),             # 1 DMA per lookup
  "const0": (np.zeros(L, np.int64), 0),                          # all DMAs skipped
}

@jax.jit
def run(h, b0, b1, q):
    lo, cnt = block_lookup_pair(h, b0, b1, q)
    return lo.sum() + cnt.sum()

for name, (b0, b1flag) in cases.items():
    b0 = jnp.asarray(b0, jnp.int32)
    b1 = jnp.zeros(L, jnp.int32) if b1flag == 0 else jnp.asarray(np.minimum(np.asarray(b0) + 1, nblk - 1), jnp.int32)
    q = jnp.asarray(rng.integers(0, 2**32, L, dtype=np.uint32))
    r = run(hashes, b0, b1, q); r.block_until_ready()
    t0 = time.time()
    for _ in range(10):
        r = run(hashes, b0, b1, q)
    r.block_until_ready()
    dt = (time.time() - t0) / 10
    print(f"{name}: {dt*1000:.2f}ms  ({dt/L*1e9:.0f}ns/lookup)", flush=True)
