"""Row-gather probe round 2: bandwidth calibration + per-lookup outputs +
pair via two fused gathers (no concat)."""
import time

import numpy as np
import jax
import jax.numpy as jnp

BLOCK = 1024
N = 1 << 28
L = 32768

hashes2d = jnp.arange(N, dtype=jnp.uint32).reshape(-1, BLOCK)
nblk = N // BLOCK
rng = np.random.default_rng(0)
blk = jnp.asarray(rng.integers(1, nblk - 2, L), jnp.int32)
q = jnp.asarray(rng.integers(0, 2**32, L, dtype=np.uint32))


@jax.jit
def full_sum(t):
    return t.sum()


@jax.jit
def per_lookup(table2d, blk, q):
    rows = table2d[blk]
    lt = jnp.sum((rows < q[:, None]).astype(jnp.int32), axis=1)
    eq = jnp.sum((rows == q[:, None]).astype(jnp.int32), axis=1)
    return lt, eq


@jax.jit
def pair_two_gathers(table2d, blk, q):
    r0 = table2d[blk]
    lt0 = jnp.sum((r0 < q[:, None]).astype(jnp.int32), axis=1)
    eq0 = jnp.sum((r0 == q[:, None]).astype(jnp.int32), axis=1)
    r1 = table2d[blk + 1]
    lt1 = jnp.sum((r1 < q[:, None]).astype(jnp.int32), axis=1)
    eq1 = jnp.sum((r1 == q[:, None]).astype(jnp.int32), axis=1)
    return lt0 + lt1, eq0 + eq1


@jax.jit
def fold(acc, parts):
    for p in parts:
        acc = acc + jnp.sum(p.astype(jnp.uint32))
    return acc


def bench(name, fn, args_list, per=L):
    r = fn(*args_list[0])
    jax.block_until_ready(r)
    int(jax.device_get(fold(jnp.uint32(0), jax.tree_util.tree_leaves(r))))
    t0 = time.time()
    acc = jnp.uint32(0)
    for a in args_list:
        r = fn(*a)
        acc = fold(acc, jax.tree_util.tree_leaves(r))
    v = int(jax.device_get(acc))
    dt = (time.time() - t0) / len(args_list)
    print(f"{name}: {dt*1000:.2f}ms ({dt/per*1e9:.0f}ns/unit) acc={v}", flush=True)


# HBM bandwidth calibration: full 1GB reduction
bench("full_sum(1GB)", full_sum, [(hashes2d,)] * 5, per=1)

blks = [jnp.asarray(rng.integers(1, nblk - 2, L), jnp.int32) for _ in range(10)]
qs = [jnp.asarray(rng.integers(0, 2**32, L, dtype=np.uint32)) for _ in range(10)]
jax.block_until_ready(blks)
jax.block_until_ready(qs)
args = [(hashes2d, b, qq) for b, qq in zip(blks, qs)]
bench("per_lookup(1 block)", per_lookup, args)
bench("pair_two_gathers", pair_two_gathers, args)

# correctness vs pallas
from probes._pairkernel import block_lookup_pair

lt, eq = pair_two_gathers(hashes2d, blk, q)
lo_p, cnt_p = jax.jit(block_lookup_pair)(hashes2d.reshape(-1), blk, blk + 1, q)
lt_p = np.asarray(lo_p) - np.asarray(blk) * BLOCK
assert np.array_equal(np.asarray(lt), lt_p), "lt mismatch"
assert np.array_equal(np.asarray(eq), np.asarray(cnt_p)), "eq mismatch"
print("parity ok (pair vs pallas)", flush=True)
