"""Fori-slope comparison of the grid-pipelined production lookup kernel vs
an explicit-DMA kernel (grid=1, software-pipelined make_async_copy, NBUF
slots).  The production kernel's floor is per-operand-per-step grid
bookkeeping (~41ns/lookup at G=256); if manual DMA issue is cheaper the
landing phase can approach the HBM bandwidth floor (~10ns/lookup for an
8KB interleaved tile).

Timing is the dedup-proof fori-slope method: K kernel invocations inside
one jitted fori_loop, the block-id input perturbed by the previous result,
slope of K=2 vs K=12.
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

NBUF = int(os.environ.get("NBUF", "8"))


def lookup_dma(hashes2d, blk, queries, nbuf=NBUF):
    """Single-block manual-DMA lookup: one (ROWS,128) HBM->VMEM copy per
    lookup, nbuf in flight, scalar compute per lookup."""
    L = queries.shape[0]

    def kernel(blk_ref, q_ref, hbm_ref, comp_ref, scratch, sems):
        def start(j):
            slot = jax.lax.rem(j, nbuf)
            row0 = blk_ref[j] * ROWS
            pltpu.make_async_copy(
                hbm_ref.at[pl.ds(row0, ROWS), :],
                scratch.at[slot],
                sems.at[slot],
            ).start()

        def wait_and_compute(j):
            slot = jax.lax.rem(j, nbuf)
            pltpu.make_async_copy(
                hbm_ref.at[pl.ds(0, ROWS), :], scratch.at[slot], sems.at[slot]
            ).wait()
            q = q_ref[j]
            w = scratch[slot]
            comp_ref[j] = jnp.sum(
                (w < q).astype(jnp.int32) + ((w == q).astype(jnp.int32) << 12)
            )

        for j in range(min(nbuf, L)):
            start(j)

        def body(j, _):
            wait_and_compute(j)

            @pl.when(j + nbuf < L)
            def _():
                start(j + nbuf)

            return 0

        jax.lax.fori_loop(0, L, body, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        scratch_shapes=[
            pltpu.VMEM((nbuf, ROWS, 128), jnp.uint32),
            pltpu.SemaphoreType.DMA((nbuf,)),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(jax.ShapeDtypeStruct((L,), jnp.int32),),
    )(blk, queries, hashes2d)[0]


def lookup_dma_vec(hashes2d, blk, queries, g=8, nbuf=4):
    """Group-vectorized manual DMA: G copies started per wave, one stacked
    (G*ROWS,128) compare per wave (the per-lookup q broadcast to its
    ROWS-row band), segment-sum reduction."""
    L = queries.shape[0]
    W = g * ROWS

    def kernel(blk_ref, q_ref, hbm_ref, comp_ref, scratch, sems):
        def start(w):
            slot = jax.lax.rem(w, nbuf)
            for k in range(g):
                row0 = blk_ref[w * g + k] * ROWS
                pltpu.make_async_copy(
                    hbm_ref.at[pl.ds(row0, ROWS), :],
                    scratch.at[slot, pl.ds(k * ROWS, ROWS), :],
                    sems.at[slot],
                ).start()

        band = jax.lax.broadcasted_iota(jnp.int32, (W, 128), 0) // ROWS

        def wait_and_compute(w):
            slot = jax.lax.rem(w, nbuf)
            for k in range(g):
                pltpu.make_async_copy(
                    hbm_ref.at[pl.ds(0, ROWS), :],
                    scratch.at[slot, pl.ds(k * ROWS, ROWS), :],
                    sems.at[slot],
                ).wait()
            # per-band query broadcast: sum over one-hot bands (G vec ops)
            qb = jnp.zeros((W, 128), jnp.uint32)
            for k in range(g):
                qb = jnp.where(band == k, q_ref[w * g + k], qb)
            tile = scratch[slot]
            v = (tile < qb).astype(jnp.int32) + ((tile == qb).astype(jnp.int32) << 12)
            # segment sum per band -> G scalars
            for k in range(g):
                comp_ref[w * g + k] = jnp.sum(jnp.where(band == k, v, 0))

        n_w = L // g
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
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        scratch_shapes=[
            pltpu.VMEM((nbuf, W, 128), jnp.uint32),
            pltpu.SemaphoreType.DMA((nbuf,)),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(jax.ShapeDtypeStruct((L,), jnp.int32),),
    )(blk, queries, hashes2d)[0]


def lookup_dma_vec2(hashes2d, blk, queries, g=16, nbuf=4):
    """Like lookup_dma_vec but with STATIC per-band slices: each lookup's
    (ROWS,128) band is compared against its own scalar q and reduced
    directly — no one-hot qb construction, no full-tile segment sums."""
    L = queries.shape[0]
    W = g * ROWS

    def kernel(blk_ref, q_ref, hbm_ref, comp_ref, scratch, sems):
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
                comp_ref[w * g + k] = jnp.sum(
                    (hh < q).astype(jnp.int32) + ((hh == q).astype(jnp.int32) << 12)
                )

        n_w = L // g
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
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        scratch_shapes=[
            pltpu.VMEM((nbuf, W, 128), jnp.uint32),
            pltpu.SemaphoreType.DMA((nbuf,)),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(jax.ShapeDtypeStruct((L,), jnp.int32),),
    )(blk, queries, hashes2d)[0]


def lookup_dma_emit(inter2d, blk, queries, g=64, nbuf=4, nout=2):
    """Emit-wave kernel over the INTERLEAVED layout: per lookup one
    (2*ROWS,128) manual DMA (hash rows + docid rows), static per-band
    compare, and the two leading docid rows emitted to HBM via one
    VMEM->HBM DMA per wave."""
    L = queries.shape[0]
    TR = 2 * ROWS
    W = g * TR

    def kernel(blk_ref, q_ref, hbm_ref, comp_ref, rows_ref, scratch, rows_s, sems, osems):
        rows_iota = jax.lax.broadcasted_iota(jnp.int32, (ROWS, 128), 0)

        def start(w):
            slot = jax.lax.rem(w, nbuf)
            for k in range(g):
                row0 = blk_ref[w * g + k] * TR
                pltpu.make_async_copy(
                    hbm_ref.at[pl.ds(row0, TR), :],
                    scratch.at[slot, pl.ds(k * TR, TR), :],
                    sems.at[slot],
                ).start()

        def wait_and_compute(w):
            slot = jax.lax.rem(w, nbuf)
            oslot = jax.lax.rem(w, nout)

            @pl.when(w >= nout)
            def _():
                pltpu.make_async_copy(
                    rows_s.at[oslot], rows_ref.at[pl.ds(0, 2 * g), :], osems.at[oslot]
                ).wait()

            for k in range(g):
                pltpu.make_async_copy(
                    hbm_ref.at[pl.ds(0, TR), :],
                    scratch.at[slot, pl.ds(k * TR, TR), :],
                    sems.at[slot],
                ).wait()
            tile = scratch[slot]
            for k in range(g):
                q = q_ref[w * g + k]
                hh = tile[k * TR : k * TR + ROWS, :]
                dd = jax.lax.bitcast_convert_type(
                    tile[k * TR + ROWS : (k + 1) * TR, :], jnp.int32
                )
                comp = jnp.sum(
                    (hh < q).astype(jnp.int32) + ((hh == q).astype(jnp.int32) << 12)
                )
                comp_ref[w * g + k] = comp
                lt = comp & 0xFFF
                r = jnp.minimum(lt >> 7, ROWS - 1)
                r2 = jnp.minimum(r + 1, ROWS - 1)
                rows_s[oslot, 2 * k : 2 * k + 1, :] = jnp.sum(
                    jnp.where(rows_iota == r, dd, 0), axis=0, keepdims=True
                )
                rows_s[oslot, 2 * k + 1 : 2 * k + 2, :] = jnp.sum(
                    jnp.where(rows_iota == r2, dd, 0), axis=0, keepdims=True
                )
            pltpu.make_async_copy(
                rows_s.at[oslot], rows_ref.at[pl.ds(w * 2 * g, 2 * g), :], osems.at[oslot]
            ).start()

        n_w = L // g
        for w in range(min(nbuf, n_w)):
            start(w)

        def body(w, _):
            wait_and_compute(w)

            @pl.when(w + nbuf < n_w)
            def _():
                start(w + nbuf)

            return 0

        jax.lax.fori_loop(0, n_w, body, 0)
        # drain the tail rows DMAs
        for t in range(min(nout, n_w)):
            w = n_w - min(nout, n_w) + t
            oslot = jax.lax.rem(jnp.int32(w), nout)
            pltpu.make_async_copy(
                rows_s.at[oslot], rows_ref.at[pl.ds(0, 2 * g), :], osems.at[oslot]
            ).wait()

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        scratch_shapes=[
            pltpu.VMEM((nbuf, W, 128), jnp.uint32),
            pltpu.VMEM((nout, 2 * g, 128), jnp.int32),
            pltpu.SemaphoreType.DMA((nbuf,)),
            pltpu.SemaphoreType.DMA((nout,)),
        ],
    )
    comp, rows = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((L,), jnp.int32),
            jax.ShapeDtypeStruct((2 * L, 128), jnp.int32),
        ),
    )(blk, queries, inter2d)
    return comp, rows


N = 1 << 28  # 268M postings => 262144 blocks
nblk = N // BLOCK
hashes = jnp.arange(N, dtype=jnp.uint32)
hashes2d = hashes.reshape(-1, 128)
L = 32768
rng = np.random.default_rng(0)
blk_np = rng.integers(0, nblk, L).astype(np.int32)
q_np = rng.integers(0, 2**32, L, dtype=np.uint32)
blk_j = jnp.asarray(blk_np)
q_j = jnp.asarray(q_np)


def slope(run1, label, table=None):
    """K invocations inside one jitted fori loop, inputs perturbed by the
    previous result; report the median slope per invocation.  The table is
    an ARGUMENT (closed-over device arrays become HLO constants and blow
    the axon remote-compile size limit)."""
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
        int(jax.device_get(runK(K, tbl_arg, blk_j, q_j)))  # compile+warm
        for r in range(REPS):
            t0 = time.time()
            int(jax.device_get(runK(K, tbl_arg, blk_j + 1 + r, q_j)))
            ts[K].append(time.time() - t0)
    per = (sorted(ts[KHI])[REPS // 2] - sorted(ts[KLO])[REPS // 2]) / (KHI - KLO)
    print(f"{label}: {per*1000:.3f}ms / {L} lookups = {per/L*1e9:.1f}ns/lookup", flush=True)
    return per


if __name__ == "__main__":
    which = os.environ.get("DMA2", "parity,prod,vec16").split(",")
    if "parity" in which:
        # correctness of the DMA kernels vs the production kernel
        lo_p, eq_p = jax.jit(lambda t, b, q: block_lookup(t.reshape(-1), b, q))(
            hashes2d, blk_j, q_j
        )
        comp_v = jax.jit(lambda t, b, q: lookup_dma_vec(t, b, q, g=16))(
            hashes2d, blk_j, q_j
        )
        lt_v, eq_v = np.asarray(comp_v) & 0xFFF, np.asarray(comp_v) >> 12
        assert np.array_equal(np.asarray(lo_p), blk_np * BLOCK + lt_v), "vec lo mismatch"
        assert np.array_equal(np.asarray(eq_p), eq_v), "vec eq mismatch"
        print("parity ok", flush=True)

    if "prod" in which:
        slope(lambda t, b, q: jax.lax.bitcast_convert_type(
            block_lookup(t.reshape(-1), b, q)[1], jnp.int32), "prod G=256")
    for nbuf in (4, 8, 16):
        if f"dma{nbuf}" in which:
            slope(lambda t, b, q, n=nbuf: lookup_dma(t, b, q, nbuf=n), f"dma nbuf={nbuf}")
    for g, nbuf in ((8, 4), (16, 4), (32, 4), (16, 8)):
        if f"vec{g}n{nbuf}" in which:
            slope(
                lambda t, b, q, g=g, n=nbuf: lookup_dma_vec(t, b, q, g=g, nbuf=n),
                f"dma_vec g={g} nbuf={nbuf}",
            )
    if "parity2" in which:
        lo_p, eq_p = jax.jit(lambda t, b, q: block_lookup(t.reshape(-1), b, q))(
            hashes2d, blk_j, q_j
        )
        comp_v = jax.jit(lambda t, b, q: lookup_dma_vec2(t, b, q, g=16))(
            hashes2d, blk_j, q_j
        )
        lt_v, eq_v = np.asarray(comp_v) & 0xFFF, np.asarray(comp_v) >> 12
        assert np.array_equal(np.asarray(lo_p), blk_np * BLOCK + lt_v), "vec2 lo mismatch"
        assert np.array_equal(np.asarray(eq_p), eq_v), "vec2 eq mismatch"
        print("parity2 ok", flush=True)
    for g, nbuf in ((16, 4), (32, 4), (64, 4), (32, 8), (128, 4), (128, 2), (64, 8)):
        if f"v2g{g}n{nbuf}" in which:
            slope(
                lambda t, b, q, g=g, n=nbuf: lookup_dma_vec2(t, b, q, g=g, nbuf=n),
                f"dma_vec2 g={g} nbuf={nbuf}",
            )

    if any(w.startswith("emit") for w in which):
        # interleaved table: hashes ascend; docids = entry index ^ 0x5A5A5A
        docids = (jnp.arange(N, dtype=jnp.uint32) ^ jnp.uint32(0x5A5A5A)).reshape(-1, 128)
        inter2d = (
            jnp.stack(
                [hashes2d.reshape(-1, ROWS, 128),
                 docids.reshape(-1, ROWS, 128)], axis=1
            ).reshape(-1, 128)
        )
        if "emitparity" in which:
            comp_e, rows_e = jax.jit(lambda t, b, q: lookup_dma_emit(t, b, q, g=64))(
                inter2d, blk_j, q_j
            )
            lt_e = np.asarray(comp_e) & 0xFFF
            eq_e = np.asarray(comp_e) >> 12
            lo_p, eq_p = jax.jit(lambda t, b, q: block_lookup(t.reshape(-1), b, q))(
                hashes2d, blk_j, q_j
            )
            assert np.array_equal(np.asarray(lo_p), blk_np * BLOCK + lt_e), "emit lo"
            assert np.array_equal(np.asarray(eq_p), eq_e), "emit eq"
            rows_np = np.asarray(rows_e).astype(np.uint32)
            dd_np = np.asarray(docids).reshape(-1, ROWS, 128)
            r_np = np.minimum(lt_e >> 7, ROWS - 1)
            ok = np.array_equal(rows_np[0::2], dd_np[blk_np, r_np]) and np.array_equal(
                rows_np[1::2], dd_np[blk_np, np.minimum(r_np + 1, ROWS - 1)]
            )
            assert ok, "emit rows mismatch"
            print("emitparity ok", flush=True)
        for g, nbuf in ((64, 4), (128, 4), (128, 2)):
            if f"emitg{g}n{nbuf}" in which:
                def run_e(t, b, q, g=g, n=nbuf):
                    comp, rows = lookup_dma_emit(t, b, q, g=g, nbuf=n)
                    return comp + rows[:L, 0]

                slope(run_e, f"dma_emit g={g} nbuf={nbuf}", table=inter2d)
    print("DMA2DONE", flush=True)
