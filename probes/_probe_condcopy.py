"""Does a data-dependent lax.cond whose branches merely TOUCH a large HBM
array force a runtime copy of it?  attrib cond2/condsame showed the real
cascade's cond costing ~6.7ms at a 2GB table regardless of which branch
runs; this isolates the mechanism with trivial branches.

Run on the TPU session: python -u probes/_probe_condcopy.py
"""
import functools
import os as _os
import sys as _sys
import time

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(_sys.argv[0]))))

import numpy as np
import jax
import jax.numpy as jnp

N = 1 << 29  # 2GB of u32


def slope(fn, label, *args, klo=4, khi=64, reps=3):
    @functools.partial(jax.jit, static_argnums=(0,))
    def run_k(k, *a):
        def body(i, acc):
            return acc + fn(acc, *a)

        return jax.lax.fori_loop(0, k, body, jnp.uint32(0))

    ts = {klo: [], khi: []}
    for k in (klo, khi):
        int(jax.device_get(run_k(k, *args)))
        for _ in range(reps):
            t0 = time.time()
            int(jax.device_get(run_k(k, *args)))
            ts[k].append(time.time() - t0)
    per = (sorted(ts[khi])[reps // 2] - sorted(ts[klo])[reps // 2]) / (khi - klo)
    print(f"{label}: {per*1000:.3f} ms/iter", flush=True)
    return per


def main():
    table = jnp.arange(N, dtype=jnp.uint32)
    table.block_until_ready()

    def nocond(acc, t):
        return t[acc & jnp.uint32(1023)] + jnp.uint32(1)

    def cond_touch(acc, t):
        pred = (acc & jnp.uint32(1)) == 0

        def a(_):
            return t[acc & jnp.uint32(1023)] + jnp.uint32(1)

        def b(_):
            return t[(acc + 7) & jnp.uint32(1023)] + jnp.uint32(2)

        return jax.lax.cond(pred, a, b, None)

    def cond_arg(acc, t):
        # table passed as an explicit operand instead of a closure capture
        pred = (acc & jnp.uint32(1)) == 0
        return jax.lax.cond(
            pred,
            lambda tt: tt[acc & jnp.uint32(1023)] + jnp.uint32(1),
            lambda tt: tt[(acc + 7) & jnp.uint32(1023)] + jnp.uint32(2),
            t,
        )

    def cond_gather(acc, t):
        # branches gather a few hundred elements (the cascade's shape)
        pred = (acc & jnp.uint32(1)) == 0
        idx = (jnp.arange(320, dtype=jnp.uint32) * jnp.uint32(65537) + acc) & jnp.uint32(N - 1)

        def a(_):
            return jnp.sum(t[idx])

        def b(_):
            return jnp.sum(t[idx + jnp.uint32(1)])

        return jax.lax.cond(pred, a, b, None)

    slope(nocond, "nocond   (baseline)", table)
    slope(cond_touch, "cond     (closure) ", table)
    slope(cond_arg, "cond     (operand) ", table)
    slope(cond_gather, "cond     (gather)  ", table)


if __name__ == "__main__":
    main()
