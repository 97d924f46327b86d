"""Batched-reduction wave lookup: can MXU matmuls replace the per-lookup
cross-lane reductions that keep block_lookup_wave at 15.6ns/lookup vs the
~10ns 8KB-tile HBM floor (SERVING.md device-ceiling notes)?

The production wave kernel's per-wave compute is g serialized
(ROWS,128)->scalar reductions (~10 dependent VPU ops each: 3 sublane steps
+ 7 cross-lane steps + extract) + g SMEM scalar stores.  Here each lookup
only STORES its compare mask into a (g*ROWS, 128) scratch (1 vector store),
and the whole wave reduces with two f32 matmuls:

    rowsum (g*ROWS, 1) = mask @ ones(128, 1)         # cross-lane on MXU
    comp   (g,)        = rowsum.reshape(g, ROWS).sum(axis=1)  # band sums, VPU

Values stay exact: mask elements are {0, 1, 4096} (all bf16-exact, so the
MXU matmul is exact even at DEFAULT precision — accumulation is f32 and
totals stay < 2^24); the band sum runs in int32 on the VPU.  An earlier
variant did the band sum as a second matmul (onehot_bands @ rowsum) and
FAILED parity: rowsum values like 4196 are not bf16-representable, and
TPU DEFAULT-precision f32 matmuls truncate their inputs to bf16.
comp lands in a VMEM (n_waves, g) output row (no SMEM scalar stores).

Run on the TPU session:  python -u probes/_probe_wavemm.py [g64 g128 prod]
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
from acoustid_index_tpu.ops.pallas_lookup import BLOCK, ROWS, block_lookup

N = 256 * 1024 * 1024 // 4  # 256MB of hashes
L = 32768


def lookup_wave_mm(hashes2d, blk, queries, g=64, nbuf=4):
    Lc = queries.shape[0]
    n_w = Lc // g

    def kernel(blk_ref, q_ref, hbm_ref, comp_ref, scratch, mask_s, sems):
        def start(w):
            slot = jax.lax.rem(w, nbuf)
            for k in range(g):
                row0 = blk_ref[w * g + k] * ROWS
                pltpu.make_async_copy(
                    hbm_ref.at[pl.ds(row0, ROWS), :],
                    scratch.at[slot, pl.ds(k * ROWS, ROWS), :],
                    sems.at[slot],
                ).start()

        def wait_and_compute(w):
            slot = jax.lax.rem(w, nbuf)
            for k in range(g):
                pltpu.make_async_copy(
                    hbm_ref.at[pl.ds(0, ROWS), :],
                    scratch.at[slot, pl.ds(k * ROWS, ROWS), :],
                    sems.at[slot],
                ).wait()
            tile = scratch[slot]
            for k in range(g):
                q = q_ref[w * g + k]
                hh = tile[k * ROWS : (k + 1) * ROWS, :]
                mask_s[k * ROWS : (k + 1) * ROWS, :] = (
                    (hh < q).astype(jnp.float32)
                    + (hh == q).astype(jnp.float32) * 4096.0
                )
            rowsum = jnp.dot(
                mask_s[...],
                jnp.ones((128, 1), jnp.float32),
                preferred_element_type=jnp.float32,
            )  # (g*ROWS, 1); exact: inputs {0,1,4096} are bf16-exact, acc f32
            comp = rowsum.astype(jnp.int32).reshape(g, ROWS).sum(axis=1)  # (g,)
            comp_ref[w, :] = comp

        for w in range(min(nbuf, n_w)):
            start(w)

        def body(w, _):
            wait_and_compute(w)

            @pl.when(w + nbuf < n_w)
            def _():
                start(w + nbuf)

            return 0

        jax.lax.fori_loop(0, n_w, body, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[pl.BlockSpec((n_w, g), lambda i, b, q: (0, 0))],
        scratch_shapes=[
            pltpu.VMEM((nbuf, g * ROWS, 128), jnp.uint32),
            pltpu.VMEM((g * ROWS, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((nbuf,)),
        ],
    )
    comp = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(jax.ShapeDtypeStruct((n_w, g), jnp.int32),),
    )(blk, queries, hashes2d)[0]
    return comp.reshape(-1)


rng = np.random.default_rng(11)
hashes_np = np.sort(rng.integers(0, 2**32, N, dtype=np.uint32))
nblk = N // BLOCK
blk_np = rng.integers(0, nblk, L).astype(np.int32)
starts = hashes_np[blk_np * BLOCK]
q_np = (starts + rng.integers(0, 800, L).astype(np.uint32)).astype(np.uint32)

hashes2d = jnp.asarray(hashes_np.reshape(-1, 128))
blk_j = jnp.asarray(blk_np)
q_j = jnp.asarray(q_np)


def slope(run1, label, table=None):
    tbl_arg = hashes2d if table is None else table

    @functools.partial(jax.jit, static_argnums=(0,))
    def runK(K, tbl, blk0, q0):
        def body(i, acc):
            b = jax.lax.rem(blk0 + (acc & jnp.int32(1)), jnp.int32(nblk))
            comp = run1(tbl, b, q0)
            return acc + comp[0] + comp[L - 1]

        return jax.lax.fori_loop(0, K, body, jnp.int32(0))

    KLO, KHI, REPS = 4, 64, 3
    ts = {KLO: [], KHI: []}
    for K in (KLO, KHI):
        int(jax.device_get(runK(K, tbl_arg, blk_j, q_j)))
        for r in range(REPS):
            t0 = time.time()
            int(jax.device_get(runK(K, tbl_arg, blk_j + 1 + r, q_j)))
            ts[K].append(time.time() - t0)
    per = (sorted(ts[KHI])[REPS // 2] - sorted(ts[KLO])[REPS // 2]) / (KHI - KLO)
    print(f"{label}: {per*1000:.3f}ms / {L} lookups = {per/L*1e9:.1f}ns/lookup", flush=True)
    return per


if __name__ == "__main__":
    which = sys.argv[1:] or ["parity", "g64", "g128"]
    if "parity" in which:
        lo_p, eq_p = jax.jit(lambda t, b, q: block_lookup(t.reshape(-1), b, q))(
            hashes2d, blk_j, q_j
        )
        comp_m = jax.jit(lambda t, b, q: lookup_wave_mm(t, b, q, g=64))(
            hashes2d, blk_j, q_j
        )
        lt_m = np.asarray(comp_m) & 0xFFF
        eq_m = np.asarray(comp_m) >> 12
        assert np.array_equal(np.asarray(lo_p), blk_np * BLOCK + lt_m), "lo mismatch"
        assert np.array_equal(np.asarray(eq_p), eq_m), "eq mismatch"
        print("parity ok", flush=True)
    if "prod" in which:
        slope(
            lambda t, b, q: jax.lax.bitcast_convert_type(
                block_lookup(t.reshape(-1), b, q)[1], jnp.int32
            ),
            "prod wave g=64",
        )
    for g, nbuf in ((64, 4), (128, 2), (128, 4), (32, 8)):
        if f"g{g}" in which or f"g{g}n{nbuf}" in which:
            slope(
                lambda t, b, q, g=g, n=nbuf: lookup_wave_mm(t, b, q, g=g, nbuf=n),
                f"wave_mm g={g} nbuf={nbuf}",
            )
