"""Pallas two-level postings lookup.

The XLA range phase binary-searches the full HBM postings array: 32
dependent random gathers per (segment, hash) lookup — the measured
bottleneck.  This module replaces it with the TPU-native version of the
reference's block index (/root/reference/src/block.zig: 512-byte blocks +
a per-block max-hash index, built for memory-system friendliness):

  1. XLA binary-searches a sampled top index `hashes[::BLOCK]` (one u32 per
     block, ~1MB per 268M postings — small and cache-friendly), restricted
     to each segment's block range, to get a block id per lookup;
  2. a Pallas kernel streams the identified blocks HBM->VMEM through the
     pipeline's scalar-prefetch machinery (block ids feed the BlockSpec
     index_map, so the DMA for lookup i+1 overlaps the compare for lookup
     i) and emits (lo, count) per lookup from vectorized compares.

A hash run can straddle a block boundary (when the run's tail begins a
block, the top index points there and the head lives in the previous
block).  The top index identifies those lookups up front (the landing
block's first sampled hash equals the query), and each one gets an extra
single-block scan of the previous block appended to the same landing
stream; the two scans compose exactly (see tier_ranges_blocked).  Runs
longer than that two-block window are truncated and flagged — the
analogue of the reference's MAX_DOCS_PER_HASH / MAX_BLOCKS_PER_HASH scan
bounds.

Tiers are packed as ONE merged hash-sorted run (the comb layout,
engine/segments.py pack_tier), so the lookup stream is (batch, hash) —
independent of the tier's segment count; a single pallas_call serves the
whole batch — pallas calls never sit under vmap.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from .binsearch import steps_for, upper_bound

from .layout import BLOCK  # postings per block; 4KB of hashes = (8, 128) tiles
ROWS = BLOCK // 128


def _use_interpret() -> bool:
    # Decided at trace time: pallas compiles natively on TPU, interprets on
    # the CPU test backend.
    return jax.default_backend() != "tpu"


# Lookups per pallas_call.  The per-lookup scalar-prefetch arrays live in
# SMEM (~1MB/core budget): 3 arrays x 65536 x 4B = 768KB fits, but a
# multi-segment serving stream (B*S*Q lookups — e.g. 262144 at B=256, S=8
# slots, Q=128) does NOT fit in one call (measured: "Ran out of memory in
# memory space smem. Used 2.00M of 1.00M"), so streams are split into
# TILE-aligned chunks and the per-chunk comp outputs concatenated.
MAX_STREAM = 65536


def _chunked_stream(call, scalars, L, max_stream: int = MAX_STREAM):
    """TILE-pad the per-lookup scalar arrays, run `call` over <= max_stream
    chunks, and return (concatenated output, padded scalars).  `call` may
    return one array or a tuple of arrays (each with a leading dim that
    scales with the chunk length — concatenated element-wise)."""
    TILE = 1024
    L_pad = -(-L // TILE) * TILE
    padded = []
    for a in scalars:
        if L_pad != a.shape[0]:
            a = jnp.concatenate([a, jnp.zeros(L_pad - a.shape[0], a.dtype)])
        padded.append(a)
    if L_pad <= max_stream:
        return call(*padded), padded
    outs = []
    for s in range(0, L_pad, max_stream):
        e = min(s + max_stream, L_pad)
        outs.append(call(*[a[s:e] for a in padded]))
    if isinstance(outs[0], tuple):
        return tuple(jnp.concatenate(parts) for parts in zip(*outs)), padded
    return jnp.concatenate(outs), padded


def block_lookup_emit(inter: jax.Array, blk: jax.Array, queries: jax.Array):
    """Landing-block lookup over the INTERLEAVED layout that ALSO emits each
    lookup's docid rows: returns (lo, cnt, rows (L, 2, 128) u32) where
    rows[j] are docid sublane rows r and min(r+1, ROWS-1) of lookup j's
    landing block, r = lt(j) // 128.  Those two rows cover table positions
    [blk*BLOCK + 128*r, blk*BLOCK + 128*(r+2)) — a superset of [lo, lo+128]
    — so the caller can extract a run's leading docids with pure elementwise
    one-hot lane selection instead of per-posting HBM gathers (the measured
    second-biggest cost of the search program after this kernel itself).

    The emission is free: the docid rows already sit in the operand tile
    (that is the point of the interleave) and the row selection + two
    aligned (1, 128) vector stores measured 41ns/lookup vs the 41-44ns
    landing baseline (probes/_probe_fused3.py).  SMEM scalar stores of
    extracted docids, by contrast, measured +64ns per value — scalar
    emission is the one shape the kernel must avoid.
    """
    if _use_wave():
        return block_lookup_emit_wave(inter, blk, queries)
    from jax.experimental.pallas import tpu as pltpu

    G = int(os.environ.get("AITPU_EMIT_G", "128"))
    L = queries.shape[0]
    inter2d = inter.reshape(-1, 128)

    def kernel(blk_ref, q_ref, *refs):
        t_refs = refs[:G]
        comp_ref = refs[G]
        rows_ref = refs[G + 1]
        i = pl.program_id(0)
        rows_iota = jax.lax.broadcasted_iota(jnp.int32, (ROWS, 128), 0)
        base = i * G
        for k in range(G):
            j = base + k
            q = q_ref[j]
            tile = t_refs[k]
            hh = tile[0:ROWS, :]
            dd = jax.lax.bitcast_convert_type(tile[ROWS : 2 * ROWS, :], jnp.int32)
            comp = jnp.sum(
                (hh < q).astype(jnp.int32) + ((hh == q).astype(jnp.int32) << 12)
            )
            comp_ref[j] = comp
            lt = comp & 0xFFF
            r = jnp.minimum(lt >> 7, ROWS - 1)
            r2 = jnp.minimum(r + 1, ROWS - 1)
            row0 = jnp.sum(jnp.where(rows_iota == r, dd, 0), axis=0, keepdims=True)
            row1 = jnp.sum(jnp.where(rows_iota == r2, dd, 0), axis=0, keepdims=True)
            rows_ref[2 * k : 2 * k + 1, :] = row0
            rows_ref[2 * k + 1 : 2 * k + 2, :] = row1

    def in_spec(idx):
        return pl.BlockSpec(
            (2 * ROWS, 128), lambda i, b, q, idx=idx: (b[i * G + idx], 0)
        )

    def call(bc, qc):
        Lc = qc.shape[0]
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(Lc // G,),
            in_specs=[in_spec(k) for k in range(G)],
            out_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((2 * G, 128), lambda i, b, q: (i, 0)),
            ],
        )
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=(
                jax.ShapeDtypeStruct((Lc,), jnp.int32),
                jax.ShapeDtypeStruct((2 * Lc, 128), jnp.int32),
            ),
            interpret=_use_interpret(),
        )(bc, qc, *([inter2d] * G))

    (comp, rows), (blk, queries) = _chunked_stream(call, (blk, queries), L)
    rows = jax.lax.bitcast_convert_type(
        rows.reshape(blk.shape[0], 2, 128)[:L], jnp.uint32
    )
    comp = comp[:L]
    lt = comp & jnp.int32(0xFFF)
    lo = blk[:L] * BLOCK + lt
    return lo, comp >> 12, rows


def block_lookup(hashes: jax.Array, blk: jax.Array, queries: jax.Array, stride: int = 1):
    """Single-block (lo, count) lookup — for lookups that never need a
    two-block window: tables of UNIQUE keys (the mention tables, where a key
    never spans blocks), the top-index search, and the landing stream
    (whose rare straddlers get an extra single-block tail slot — see
    tier_ranges_blocked).

    A two-block-window variant was measured and retired: the kernel's cost
    floor is the pipeline's per-operand-per-step bookkeeping (~44-51ns,
    measured body-content- and DMA-pattern-insensitive — an empty body
    costs the same), so a second operand doubles the price of every lookup
    to serve the rare straddling ones (probes/_pairkernel.py keeps it for
    the probes).  Outputs are SMEM scalars (one scalar store per lookup;
    measured faster than one-hot tile merges at every G —
    probes/_probe_kernelvariants.py).

    `stride=2` reads the interleaved layout (ops/layout.py): each operand
    covers 2*ROWS rows, hashes in the first ROWS."""
    if _use_wave():
        return block_lookup_wave(hashes, blk, queries, stride=stride)
    from jax.experimental.pallas import tpu as pltpu

    # G=256 measured 41ns/lookup vs 52 at G=64 (probes/_probe_kernelvariants).
    G = int(os.environ.get("AITPU_LOOKUP_G", "256"))

    L = queries.shape[0]
    hashes2d = hashes.reshape(-1, 128)

    def kernel(blk_ref, q_ref, *refs):
        h_refs = refs[:G]
        comp_ref = refs[G]
        i = pl.program_id(0)
        base = i * G
        for k in range(G):
            j = base + k
            q = q_ref[j]
            b0 = h_refs[k][0:ROWS, :]
            comp_ref[j] = jnp.sum(
                (b0 < q).astype(jnp.int32) + ((b0 == q).astype(jnp.int32) << 12)
            )

    def in_spec(idx):
        return pl.BlockSpec(
            (stride * ROWS, 128), lambda i, b, q, idx=idx: (b[i * G + idx], 0)
        )

    def call(bc, qc):
        Lc = qc.shape[0]
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,  # blk, queries
            grid=(Lc // G,),
            in_specs=[in_spec(k) for k in range(G)],
            out_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        )
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=(jax.ShapeDtypeStruct((Lc,), jnp.int32),),
            interpret=_use_interpret(),
        )(bc, qc, *([hashes2d] * G))[0]

    comp, (blk, queries) = _chunked_stream(call, (blk, queries), L)
    comp = comp.reshape(-1)[:L]
    lt = comp & jnp.int32(0xFFF)
    eq = comp >> 12
    lo = blk[:L] * BLOCK + lt
    return lo, eq


def _use_wave() -> bool:
    # The wave kernels (explicit-DMA, measured ~16ns/lookup vs the grid
    # pipeline's ~41ns — probes/_probe_dma2.py) are the default on real
    # TPUs; the grid kernels remain the interpret-mode (CPU test) path and
    # the AITPU_WAVE=0 escape hatch.  tests/test_wave_lookup.py pins the
    # wave kernels' numerics under interpret directly.
    return os.environ.get("AITPU_WAVE", "1") == "1" and not _use_interpret()


def _wave_geometry():
    g = int(os.environ.get("AITPU_WAVE_G", "64"))
    nbuf = int(os.environ.get("AITPU_WAVE_NBUF", "4"))
    return g, nbuf


def block_lookup_wave(hashes: jax.Array, blk: jax.Array, queries: jax.Array, stride: int = 1):
    """Explicit-DMA single-block lookup: same contract as block_lookup, but
    instead of riding the grid pipeline (whose per-operand-per-step
    bookkeeping floors at ~41ns/lookup regardless of body or DMA pattern),
    the kernel runs grid=1 and software-pipelines its own HBM->VMEM block
    copies in WAVES: g copies started per wave onto one scratch slot (one
    shared DMA semaphore per slot — sflag memory is ~2KB, a per-copy
    semaphore array does not fit), nbuf wave slots in flight, then g static
    per-band (ROWS,128) compares.  Measured 15.6ns/lookup at g=64 nbuf=4 on
    a 1GB table (probes/_probe_dma2.py), 2.6x the grid kernel.
    """
    from jax.experimental.pallas import tpu as pltpu

    g, nbuf = _wave_geometry()
    # Only the hash rows are compared; in the interleaved layout (stride=2)
    # they are the FIRST ROWS rows of each 2*ROWS-row tile, so the copy is
    # always ROWS rows — stride only scales the source offset.
    R = stride * ROWS

    L = queries.shape[0]
    hashes2d = hashes.reshape(-1, 128)

    def kernel(blk_ref, q_ref, hbm_ref, comp_ref, scratch, sems):
        def start(w):
            slot = jax.lax.rem(w, nbuf)
            for k in range(g):
                row0 = blk_ref[w * g + k] * R
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

        n_w = comp_ref.shape[0] // g
        for w in range(min(nbuf, n_w)):
            start(w)

        def body(w, _):
            wait_and_compute(w)

            @pl.when(w + nbuf < n_w)
            def _():
                start(w + nbuf)

            return 0

        jax.lax.fori_loop(0, n_w, body, 0)

    def call(bc, qc):
        Lc = qc.shape[0]
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(1,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
            scratch_shapes=[
                pltpu.VMEM((nbuf, g * ROWS, 128), jnp.uint32),
                pltpu.SemaphoreType.DMA((nbuf,)),
            ],
        )
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=(jax.ShapeDtypeStruct((Lc,), jnp.int32),),
            interpret=_use_interpret(),
        )(bc, qc, hashes2d)[0]

    comp, (blk, queries) = _chunked_stream(call, (blk, queries), L)
    comp = comp.reshape(-1)[:L]
    lt = comp & jnp.int32(0xFFF)
    eq = comp >> 12
    lo = blk[:L] * BLOCK + lt
    return lo, eq


def block_lookup_emit_wave(inter: jax.Array, blk: jax.Array, queries: jax.Array):
    """Explicit-DMA variant of block_lookup_emit (same contract): per lookup
    one (2*ROWS,128) interleaved-tile copy, wave-pipelined as in
    block_lookup_wave, and each lookup's two leading docid rows emitted to
    HBM with one VMEM->HBM rows DMA per wave (double-buffered)."""
    from jax.experimental.pallas import tpu as pltpu

    g, nbuf = _wave_geometry()
    nout = 2
    TR = 2 * ROWS

    L = queries.shape[0]
    inter2d = inter.reshape(-1, 128)

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

            # The rows slot is reused every `nout` waves: wait out the DMA
            # that last used it before overwriting.
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
                rows_s.at[oslot],
                rows_ref.at[pl.ds(w * 2 * g, 2 * g), :],
                osems.at[oslot],
            ).start()

        n_w = comp_ref.shape[0] // g
        for w in range(min(nbuf, n_w)):
            start(w)

        def body(w, _):
            wait_and_compute(w)

            @pl.when(w + nbuf < n_w)
            def _():
                start(w + nbuf)

            return 0

        jax.lax.fori_loop(0, n_w, body, 0)
        # Drain the trailing rows DMAs before the kernel returns.
        for t in range(min(nout, n_w)):
            w = n_w - min(nout, n_w) + t
            oslot = w % nout
            pltpu.make_async_copy(
                rows_s.at[oslot], rows_ref.at[pl.ds(0, 2 * g), :], osems.at[oslot]
            ).wait()

    def call(bc, qc):
        Lc = qc.shape[0]
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(1,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            scratch_shapes=[
                pltpu.VMEM((nbuf, g * TR, 128), jnp.uint32),
                pltpu.VMEM((nout, 2 * g, 128), jnp.int32),
                pltpu.SemaphoreType.DMA((nbuf,)),
                pltpu.SemaphoreType.DMA((nout,)),
            ],
        )
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=(
                jax.ShapeDtypeStruct((Lc,), jnp.int32),
                jax.ShapeDtypeStruct((2 * Lc, 128), jnp.int32),
            ),
            interpret=_use_interpret(),
        )(bc, qc, inter2d)

    (comp, rows), (blk, queries) = _chunked_stream(call, (blk, queries), L)
    rows = jax.lax.bitcast_convert_type(
        rows.reshape(blk.shape[0], 2, 128)[:L], jnp.uint32
    )
    comp = comp[:L]
    lt = comp & jnp.int32(0xFFF)
    lo = blk[:L] * BLOCK + lt
    return lo, comp >> 12, rows


def _resident_max_bytes() -> int:
    # VMEM is ~16MB/core on v5e; the resident operand may be double-buffered
    # by the pipeline, so cap the table at 6MB (covers the sampled top index
    # of a ~1.6B-posting table).
    return int(os.environ.get("AITPU_RESIDENT_MAX_BYTES", str(6 << 20)))


def block_lookup_resident(hashes: jax.Array, blk: jax.Array, queries: jax.Array, lo_b=None, hi_b=None):
    """(lt, eq) per lookup with the WHOLE table VMEM-resident.

    The DMA-pipeline kernels above are bookkeeping-bound: ~83ns per operand
    per grid step no matter what the body does or whether the DMA is
    skipped.  For small tables — the sampled top index is ~1MB per 268M
    postings — that floor is avoidable entirely: the table becomes ONE
    operand with a CONSTANT index map (the pipeline loads it once; every
    later grid step hits the same-block skip) and each lookup
    dynamic-slices its 1024-entry chunk straight out of VMEM, so the
    per-lookup cost is pure VPU compare work.

    With `lo_b`/`hi_b` (per-lookup absolute entry bounds), only table
    entries in [lo_b, hi_b) are counted — this serves MULTI-SEGMENT tiers,
    where the top index is a concatenation of per-segment sorted runs and
    a chunk can span segments.  Four scalar arrays then chunk at 32768
    lookups to keep SMEM at 512KB.

    Returns (lt, eq): entries < q and entries == q within the (masked)
    chunk `blk`.  Caller guarantees hashes.nbytes <= _resident_max_bytes()
    and that hashes is padded to a multiple of BLOCK entries."""
    from jax.experimental.pallas import tpu as pltpu

    # Pure VPU work with no DMA per lookup: a much larger G amortizes the
    # per-step grid cost.  SMEM scalar outputs instead of one-hot tile
    # merges took this kernel from ~58ns to ~5-10ns per lookup (measured,
    # probes/_probe_kernelvariants.py: res_g128_smem 5ns vs res_g32_onehot
    # 58ns) — the merge was most of the kernel.
    G = int(os.environ.get("AITPU_RESIDENT_G", "128"))
    masked = lo_b is not None

    L = queries.shape[0]
    hashes2d = hashes.reshape(-1, 128)
    r_all = hashes2d.shape[0]
    n_scalars = 4 if masked else 2

    def kernel(*refs):
        scalar_refs = refs[:n_scalars]
        h_ref, comp_ref = refs[n_scalars], refs[n_scalars + 1]
        i = pl.program_id(0)
        base = i * G
        if masked:
            rows = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
            lanes = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
        for k in range(G):
            j = base + k
            q = scalar_refs[1][j]
            c = scalar_refs[0][j]
            b0 = h_ref[pl.ds(c * ROWS, ROWS), :]
            v = (b0 < q).astype(jnp.int32) + ((b0 == q).astype(jnp.int32) << 12)
            if masked:
                e = c * BLOCK + rows * 128 + lanes  # absolute entry index
                in_r = jnp.logical_and(e >= scalar_refs[2][j], e < scalar_refs[3][j])
                v = jnp.where(in_r, v, 0)
            comp_ref[j] = jnp.sum(v)

    def call(*chunks):
        Lc = chunks[1].shape[0]
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=n_scalars,
            grid=(Lc // G,),
            in_specs=[pl.BlockSpec((r_all, 128), lambda i, *_s: (0, 0))],
            out_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        )
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=(jax.ShapeDtypeStruct((Lc,), jnp.int32),),
            interpret=_use_interpret(),
        )(*chunks, hashes2d)[0]

    scalars = (blk, queries, lo_b, hi_b) if masked else (blk, queries)
    comp, _ = _chunked_stream(call, scalars, L, max_stream=32768 if masked else MAX_STREAM)
    comp = comp.reshape(-1)[:L]
    lt = comp & jnp.int32(0xFFF)
    eq = comp >> 12
    return lt, eq


def tier_ranges_resident(tier, queries, valid_q, cap_k):
    """Range phase for a MID-SIZE tier whose whole merged postings run fits
    VMEM (4096 < cap <= _resident_max_bytes()/4 entries — the serving
    memory tier between checkpoints): a dense mini compare over a
    1024x-sampled mini index picks each query's landing chunk, and TWO
    resident lookups per query (chunks c-1 and c) bound its run exactly —
    pure VPU work at ~6-10ns per resident lookup, no per-lookup DMA.

    Equal-hash runs longer than the two-chunk window truncate with the
    flag set, like the blocked path's scan bounds."""
    B, Q = queries.shape
    assert "hashes" in tier, "interleaved tiers always take the blocked path"
    hp = tier["hashes"]  # cap is a BLOCK multiple, sentinel padded
    n_items = jnp.sum(tier["seg_len"]).astype(jnp.int32)
    nchunks = hp.shape[0] // BLOCK
    qf = queries.reshape(-1)

    mini = hp[::BLOCK]  # first entry of each chunk
    ub2 = jnp.sum((mini[None, :] <= qf[:, None]).astype(jnp.int32), axis=1)
    c = jnp.clip(ub2 - 1, 0, nchunks - 1)
    c0 = jnp.maximum(c - 1, 0)

    # One resident stream of 2L lookups: chunk below + landing chunk.
    cc = jnp.concatenate([c0, c]).astype(jnp.int32)
    qq = jnp.concatenate([qf, qf])
    lt2, eq2 = block_lookup_resident(hp, cc, qq)
    L = qf.shape[0]
    lt_b, eq_b = lt2[:L], eq2[:L]  # chunk c-1
    lt_c, eq_c = lt2[L:], eq2[L:]  # chunk c

    has_below = jnp.logical_and(eq_b > 0, c > 0)  # run starts before chunk c
    lo = jnp.where(has_below, c0 * BLOCK + lt_b, c * BLOCK + lt_c)
    cnt = jnp.where(has_below, eq_b + eq_c, eq_c)
    # Run may extend below the window: chunk c-1's FIRST entry equals q
    # (and a chunk below exists) — conservative truncation flag.
    spill = jnp.logical_and(has_below, jnp.logical_and(c0 > 0, mini[c0] == qf))

    live = jnp.logical_and(valid_q.reshape(-1), n_items > 0)
    lo = jnp.clip(lo, 0, n_items)
    cnt = jnp.minimum(cnt, n_items - lo)
    cnt = jnp.where(live, cnt, 0)
    kcap = jnp.int32(min(cap_k, 2 * BLOCK))
    cnt = jnp.minimum(cnt, kcap)
    truncated = jnp.logical_or(
        jnp.any(jnp.logical_and(cnt >= kcap, live)),
        jnp.any(jnp.logical_and(spill, live)),
    )
    return lo.reshape(B, Q), cnt.reshape(B, Q), truncated


def tier_ranges_blocked(tier, queries, valid_q, cap_k, emit: bool = False):
    """Two-level replacement for the tier's range phase over its MERGED
    sorted postings run.

    `queries`/`valid_q` are (B, Q); returns lo/counts of shape (B, Q) plus
    a truncation flag.  Requires tier["block_index"].  One lookup per
    query hash regardless of the tier's segment count — the comb layout
    (engine/segments.py pack_tier) makes the range phase S-independent.

    `emit=True` (interleaved tiers only) additionally returns each lookup's
    landing-block docid rows and a covered mask — see block_lookup_emit;
    the return becomes (lo, cnt, trunc, rows (B*Q, 2, 128) u32, covered
    (B, Q) bool).

    The whole top index is one sorted run, so its search is itself a
    two-level lookup — a dense compare over a 1024x-sampled mini index
    (VPU work, not per-element gathers) picks the top-index chunk, and a
    Pallas block kernel counts entries <= q inside it (VMEM-resident when
    the table fits, per-chunk DMA otherwise).  Every chunk before the
    landing chunk is wholly <= q (its first entry is the mini sample), so
    ub = chunk_lower_bound + equals.
    """
    B, Q = queries.shape
    block_index = tier["block_index"]
    nblk = block_index.shape[0]
    if "inter" in tier:
        postings, stride = tier["inter"], 2  # interleaved blocks (ops/layout.py)
    else:
        assert not emit, "emit requires the interleaved layout"
        postings, stride = tier["hashes"], 1
    n_items = jnp.sum(tier["seg_len"]).astype(jnp.int32)
    blk_last = jnp.maximum((n_items - 1) // BLOCK, 0)

    # Stage 1: landing block per (batch, hash) from the small top index.
    # `blk` is the LAST block whose first sampled hash is <= q, so a run
    # never extends past it; it can extend BEFORE it exactly when that
    # first sample == q, in which case the window steps back one block.
    qf = queries.reshape(-1)
    nblk_pad = -(-nblk // BLOCK) * BLOCK
    resident_fits = nblk_pad * 4 <= _resident_max_bytes()
    bi = block_index
    if nblk_pad != nblk:
        bi = jnp.concatenate([bi, jnp.full(nblk_pad - nblk, 0xFFFFFFFF, bi.dtype)])
    mini = bi[::BLOCK]
    ub2 = jnp.sum((mini[None, :] <= qf[:, None]).astype(jnp.int32), axis=1)
    c = jnp.clip(ub2 - 1, 0, mini.shape[0] - 1)
    if resident_fits:
        lt_c, cnt_c = block_lookup_resident(bi, c, qf)
        ub = (c * BLOCK + lt_c + cnt_c).reshape(B, Q)
    else:
        lo_c, cnt_c = block_lookup(bi, c, qf)
        ub = (lo_c + cnt_c).reshape(B, Q)
    eq_top = cnt_c.reshape(B, Q)  # equal top entries in landing chunk
    blk = jnp.clip(jnp.clip(ub - 1, 0, blk_last), 0, nblk - 1).astype(jnp.int32)

    # Gather-free window decisions: equal top-index entries occupy
    # [ub - eq, ub), so block_index[blk] == q  <=>  eq_top > 0 (the last
    # equal is at ub-1, which the landing chunk contains and counts),
    # block_index[b1] == q holds exactly in the step-back case, and
    # block_index[b0-...]: the run reaches below the window iff a second
    # equal exists (eq_top >= 2), flagged conservatively when the last
    # equal sits at a chunk boundary and the chunk below is invisible.
    step_back = jnp.logical_and(eq_top > 0, blk > 0)
    b0 = jnp.where(step_back, blk - 1, blk)
    b1 = jnp.minimum(b0 + 1, nblk - 1)
    enabled = jnp.logical_and(step_back, jnp.logical_and(b1 <= blk_last, b1 != b0))
    spill = jnp.logical_and(
        jnp.logical_and(step_back, b0 > 0),
        jnp.logical_or(eq_top >= 2, (ub - 1) % BLOCK == 0),
    )

    # Padded query lanes don't need their blocks: point them at block 0 so
    # they form constant runs — the pipeline skips the DMA when consecutive
    # grid steps map to the same block, making dead lookups nearly free
    # (their counts are masked to 0 below anyway).
    live = jnp.logical_and(valid_q, n_items > 0)
    b0 = jnp.where(live, b0, 0)
    b1 = jnp.where(jnp.logical_and(live, enabled), b1, 0)

    # Stage 2: single-operand Pallas scan of each lookup's LANDING block,
    # with the straddle fixup riding the SAME stream.  Only straddling runs
    # need to see the previous block, and the top index already told us
    # which lookups those are (step_back): for a straddler the landing
    # block's first entry == q, so nothing in it is < q and the two-block
    # window result decomposes exactly as
    #     lo  = b0*BLOCK + lt(b0)          (lt+eq == BLOCK in b0, so this
    #                                       equals the landing lo when the
    #                                       run starts at the boundary)
    #     cnt = eq(b0) + eq(landing)
    # i.e. one extra SINGLE-block scan of b0 per straddler.  Those extra
    # scans are appended to the landing stream as a compacted W_CAP-slot
    # tail — one pallas launch, one operand-slot each, instead of the
    # former separate two-operand pair-kernel pass at twice the per-lookup
    # cost (the kernel is operand-bookkeeping-bound, see block_lookup).
    lookups = qf
    L = lookups.shape[0]
    window = jnp.logical_and(live, jnp.logical_or(step_back, enabled)).reshape(-1)
    blk_main = jnp.where(live, blk, 0).reshape(-1)

    # The fixup tail must cover realistic straddler loads: a hot hash
    # whose run crosses a block boundary consumes one slot per batch row
    # that queries it, so the cap scales with the stream (L/16 = full
    # coverage of 16 such hashes shared across a whole batch) with a 2048
    # floor.  Overflow degrades to flagged truncation, never corruption.
    w_cap = min(max(int(os.environ.get("AITPU_WINDOW_CAP", "2048")), L // 16), L)
    r = jnp.cumsum(window.astype(jnp.int32)) - 1
    slot = jnp.where(jnp.logical_and(window, r < w_cap), r, w_cap)
    sel = (
        jnp.zeros(w_cap + 1, jnp.int32)
        .at[slot]
        .set(jnp.arange(L, dtype=jnp.int32), mode="drop")[:w_cap]
    )
    n_w = jnp.sum(window.astype(jnp.int32))
    valid_w = jnp.arange(w_cap, dtype=jnp.int32) < n_w
    fb0 = jnp.where(valid_w, b0.reshape(-1)[sel], 0)
    fq = jnp.where(valid_w, lookups[sel], jnp.uint32(0))

    ext_blk = jnp.concatenate([blk_main, fb0])
    ext_q = jnp.concatenate([lookups, fq])
    rows = None
    if emit:
        # Emitting variant: the landing pass also returns each lookup's two
        # docid rows (see block_lookup_emit).  `covered` marks lookups whose
        # (lo, cnt) still describe the landing block after the straddle
        # fixup below — only those may read their leading docids from the
        # rows; straddlers' values move to the previous block.  The fixup
        # tail's rows are dead weight (sliced off) but cost nothing extra —
        # the emission is free against the landing baseline.
        lo_all, cnt_all, rows_all = block_lookup_emit(postings, ext_blk, ext_q)
        rows = rows_all[:L]
    else:
        lo_all, cnt_all = block_lookup(postings, ext_blk, ext_q, stride=stride)
    lo_flat, cnt_flat = lo_all[:L], cnt_all[:L]

    # Compose each straddler's exact (lo, cnt) from its b0 tail scan + its
    # landing scan (see the decomposition above), then scatter over the
    # landing-truncated values.  Dead tail slots target index L -> dropped.
    lo_fix = lo_all[L : L + w_cap]
    cnt_fix = cnt_all[L : L + w_cap] + cnt_flat[jnp.clip(sel, 0, L - 1)]
    tgt = jnp.where(valid_w, sel, L)
    lo_flat = lo_flat.at[tgt].set(lo_fix, mode="drop")
    cnt_flat = cnt_flat.at[tgt].set(cnt_fix, mode="drop")
    # Straddlers beyond w_cap keep their landing-block-truncated values —
    # flagged below like every other scan-bound truncation.
    w_over = n_w > w_cap

    lo = lo_flat.reshape(B, Q)
    cnt = cnt_flat.reshape(B, Q)

    # Clamp into the live run [0, n_items).
    lo = jnp.clip(lo, 0, n_items)
    cnt = jnp.minimum(cnt, n_items - lo)
    cnt = jnp.where(valid_q, cnt, 0)
    kcap = jnp.int32(min(cap_k, 2 * BLOCK))
    cnt = jnp.minimum(cnt, kcap)
    # Truncation: the window cap clipped a long run, or the run started
    # before the two-block window (the reference's scan bounds truncate the
    # same way, surfaced the same way).
    truncated = jnp.logical_or(
        jnp.logical_or(
            jnp.any(jnp.logical_and(cnt >= kcap, live)),
            jnp.any(jnp.logical_and(spill, live)),
        ),
        w_over,
    )
    if emit:
        # A lookup is covered exactly when its (lo, cnt) still point into
        # the landing block the emitted rows came from: every non-straddler
        # (a run never extends past its landing block — see the top-index
        # invariant above — so rows r, r+1 always span [lo, lo+128]).
        covered = jnp.logical_and(live, jnp.logical_not(window.reshape(B, Q)))
        return lo, cnt, truncated, rows, covered
    return lo, cnt, truncated


def _pad_to_block(a):
    n = a.shape[0]
    n_pad = -(-n // BLOCK) * BLOCK
    if n_pad != n:
        a = jnp.concatenate([a, jnp.full(n_pad - n, 0xFFFFFFFF, a.dtype)])
    return a


def mention_lookup_blocked(tier, cand_flat, valid=None):
    """Bool: the tier mentions each candidate doc (membership test; the
    kernel resolves within-tier supersession at pack time, so membership
    is all it ever needs — see search_kernel._batch_newest).

    Mention ids are UNIQUE per doc (a key never spans blocks; the in-block
    equality count is 0 or 1), so the lookup has no straddle cases:

      * table fits VMEM (<= _resident_max_bytes()): dense mini compare
        picks each candidate's chunk, ONE resident scan bounds it — pure
        VPU work, no per-candidate DMA at all;
      * bigger tables: the sampled top index (ids[::BLOCK]) is made
        VMEM-resident and searched the same two-level way (mini compare +
        resident chunk scan — an XLA binary search here cost ~10 dependent
        per-element gathers per candidate, measured ~20ms for a 64k
        candidate stream), then one pipelined block DMA per candidate
        scans the landing block.
    """
    ids = tier["mention_ids"]
    cap = ids.shape[0]
    if cap % BLOCK == 0 and cap * 4 <= _resident_max_bytes():
        mini = ids[::BLOCK]
        ub2 = jnp.sum((mini[None, :] <= cand_flat[:, None]).astype(jnp.int32), axis=1)
        c = jnp.clip(ub2 - 1, 0, mini.shape[0] - 1)
        lt, eq = block_lookup_resident(ids, c, cand_flat)
        lo = c * BLOCK + lt
        return jnp.logical_and(eq > 0, lo < tier["mention_len"])

    top = _pad_to_block(ids[::BLOCK])
    nblk = ids.shape[0] // BLOCK
    if top.shape[0] * 4 <= _resident_max_bytes():
        # Two-level top-index search, VMEM-resident: ub = #top entries <=
        # cand (keys unique, so entries before the landing chunk are all
        # strictly below the first chunk entry <= cand).
        mini = top[::BLOCK]
        ub2 = jnp.sum((mini[None, :] <= cand_flat[:, None]).astype(jnp.int32), axis=1)
        c = jnp.clip(ub2 - 1, 0, mini.shape[0] - 1)
        lt_c, eq_c = block_lookup_resident(top, c, cand_flat)
        ub = c * BLOCK + lt_c + eq_c
    else:
        ub = upper_bound(
            top, cand_flat, jnp.int32(0), jnp.int32(nblk), steps=steps_for(nblk)
        ).astype(jnp.int32)
    blk = jnp.clip(ub - 1, 0, nblk - 1).astype(jnp.int32)
    if valid is not None:
        # Dead candidates point at block 0 so consecutive grid steps share
        # the block and the pipeline skips their DMA.
        blk = jnp.where(valid, blk, 0)
    lo, cnt = block_lookup(ids, blk, cand_flat)
    return jnp.logical_and(cnt > 0, lo < tier["mention_len"])
