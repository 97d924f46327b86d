"""Fused-kernel diagnosis: is the 4x slowdown the (16,128) operand or the
one-hot docid extraction?

Variants (fori-slope):
    land_g256          — baseline (8,128) hash-only operand, comp out
    fusedrm_g256_e0    — row-major interleave (16,128), comp only
    fusedrm_g256_e2    — + 2 one-hot docid extractions (as probe 1)
    fusedrm_slice_e2   — + 2 extractions via dynamic row slice + lane onehot
    fusedlm_g256_e0    — lane-major interleave (8,256), comp only
    fusedlm_g256_e2    — + 2 one-hot extractions
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
N = 1 << 27
NBLK = N // BLOCK


def make_kernel(layout, E, mode="onehot", G=256):
    """layout: 'plain' (8,128) hashes only; 'rm' (16,128) rows 0-7 hash,
    8-15 docid; 'lm' (8,256) cols 0-127 hash, 128-255 docid."""
    if layout == "plain":
        shape = (ROWS, 128)
    elif layout == "rm":
        shape = (2 * ROWS, 128)
    else:
        shape = (ROWS, 256)

    def lookup(table2d, blk, queries):
        Lc = queries.shape[0]

        def kernel(blk_ref, q_ref, *refs):
            t_refs = refs[:G]
            comp_ref = refs[G]
            d_refs = refs[G + 1 : G + 1 + E]
            i = pl.program_id(0)
            base = i * G
            if E and mode == "onehot":
                flat = (
                    jax.lax.broadcasted_iota(jnp.int32, (ROWS, 128), 0) * 128
                    + jax.lax.broadcasted_iota(jnp.int32, (ROWS, 128), 1)
                )
            for k in range(G):
                j = base + k
                q = q_ref[j]
                tile = t_refs[k]
                if layout == "plain":
                    hh = tile[:, :]
                    dd = None
                elif layout == "rm":
                    hh = tile[0:ROWS, :]
                    dd = tile[ROWS : 2 * ROWS, :]
                else:
                    hh = tile[:, 0:128]
                    dd = tile[:, 128:256]
                comp = jnp.sum(
                    (hh < q).astype(jnp.int32) + ((hh == q).astype(jnp.int32) << 12)
                )
                comp_ref[j] = comp
                if not E:
                    continue
                ddi = jax.lax.bitcast_convert_type(dd, jnp.int32)
                lt = comp & 0xFFF
                if mode == "onehot":
                    for e in range(E):
                        d_refs[e][j] = jnp.sum(jnp.where(flat == lt + e, ddi, 0))
                else:  # row slice + lane onehot
                    lanes = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
                    for e in range(E):
                        p = lt + e
                        r = jnp.clip(p // 128, 0, ROWS - 1)
                        c = p % 128
                        row = jax.lax.dynamic_slice(ddi, (r, 0), (1, 128))
                        d_refs[e][j] = jnp.sum(jnp.where(lanes == c, row, 0))

        def in_spec(idx):
            return pl.BlockSpec(shape, lambda i, b, q, idx=idx: (b[i * G + idx], 0))

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(Lc // G,),
            in_specs=[in_spec(k) for k in range(G)],
            out_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * (1 + E),
        )
        outs = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=tuple([jax.ShapeDtypeStruct((Lc,), jnp.int32)] * (1 + E)),
        )(blk, queries, *([table2d] * G))
        r = outs[0]
        for o in outs[1:]:
            r = r + o
        return r

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
        print(f"{name}: FAILED {type(e).__name__}: {str(e)[:300]}", flush=True)


def main():
    hashes = np.arange(N, dtype=np.uint32)
    docids = (np.arange(N, dtype=np.uint32) * 2654435761) & np.uint32(0xFFFFFFFF)
    plain2d = jnp.asarray(hashes.reshape(-1, 128))
    rm = np.empty((NBLK, 2 * ROWS, 128), np.uint32)
    rm[:, :ROWS, :] = hashes.reshape(NBLK, ROWS, 128)
    rm[:, ROWS:, :] = docids.reshape(NBLK, ROWS, 128)
    rm2d = jnp.asarray(rm.reshape(-1, 128))
    del rm
    lm = np.empty((NBLK, ROWS, 256), np.uint32)
    lm[:, :, :128] = hashes.reshape(NBLK, ROWS, 128)
    lm[:, :, 128:] = docids.reshape(NBLK, ROWS, 128)
    lm2d = jnp.asarray(lm.reshape(-1, 256))
    del lm

    bench("land_g256", make_kernel("plain", 0), plain2d, NBLK)
    bench("fusedrm_g256_e0", make_kernel("rm", 0), rm2d, NBLK)
    bench("fusedrm_g256_e2", make_kernel("rm", 2), rm2d, NBLK)
    bench("fusedrm_slice_e2", make_kernel("rm", 2, mode="slice"), rm2d, NBLK)
    bench("fusedlm_g256_e0", make_kernel("lm", 0), lm2d, NBLK)
    bench("fusedlm_g256_e2", make_kernel("lm", 2), lm2d, NBLK)
    bench("fusedlm_slice_e2", make_kernel("lm", 2, mode="slice"), lm2d, NBLK)
    print("FUSED2DONE", flush=True)


if __name__ == "__main__":
    main()
