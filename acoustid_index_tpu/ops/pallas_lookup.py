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

Per-lookup scan is capped at one block (BLOCK postings) — the analogue of
the reference's MAX_DOCS_PER_HASH / MAX_BLOCKS_PER_HASH scan bounds.

Segments must be packed BLOCK-aligned (pack_tier pads each segment's run
with sentinels) so one block never spans two segments.  The batch serving
path flattens (batch, segment, hash) into one lookup stream so a single
pallas_call serves the whole batch — pallas calls never sit under vmap.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from .binsearch import upper_bound

BLOCK = 1024  # postings per block; 4KB of hashes = (8, 128) tiles
ROWS = BLOCK // 128


def _use_interpret() -> bool:
    # Decided at trace time: pallas compiles natively on TPU, interprets on
    # the CPU test backend.
    return jax.default_backend() != "tpu"


def block_lookup(hashes: jax.Array, blk: jax.Array, queries: jax.Array):
    """(lo, count) per lookup within the given block of `hashes`.

    `hashes` has length a multiple of BLOCK (sentinel padded); `blk` is the
    block id per lookup (precomputed from the top index); `queries` the u32
    lookup keys.  lo is the absolute index of the first posting >= query in
    the block; count the number of equal postings inside the block.
    """
    from jax.experimental.pallas import tpu as pltpu

    G = 8  # lookups per grid step (one pipelined block DMA per operand slot)
    TILE = 1024  # lookups per (8, 128) output tile

    L = queries.shape[0]
    L_pad = -(-L // TILE) * TILE
    if L_pad != L:
        blk = jnp.concatenate([blk, jnp.zeros(L_pad - L, blk.dtype)])
        queries = jnp.concatenate([queries, jnp.zeros(L_pad - L, queries.dtype)])
    hashes2d = hashes.reshape(-1, 128)

    # G lookups per grid step (G operand slots on the same postings array,
    # each with its own scalar-prefetched block id, so the pipeline keeps G
    # block DMAs in flight per step).  Outputs use the block-revisiting
    # pattern: TILE consecutive lookups share one (8, 128) output tile,
    # written via vectorized one-hot merges (scalar VMEM stores don't
    # lower); every lane is owned by exactly one lookup, so the tile is
    # fully defined when it flushes.
    def kernel(blk_ref, q_ref, *refs):
        h_refs = refs[:G]
        lo_ref, cnt_ref = refs[G], refs[G + 1]
        i = pl.program_id(0)
        base = i * G
        rows = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
        lanes = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
        lo_tile = lo_ref[:, :]
        cnt_tile = cnt_ref[:, :]
        for k in range(G):
            j = base + k
            q = q_ref[j]
            block = h_refs[k][:, :]
            lt = jnp.sum((block < q).astype(jnp.int32))
            eq = jnp.sum((block == q).astype(jnp.int32))
            row = (j % TILE) // 128
            lane = j % 128
            mask = jnp.logical_and(rows == row, lanes == lane)
            lo_tile = jnp.where(mask, blk_ref[j] * BLOCK + lt, lo_tile)
            cnt_tile = jnp.where(mask, eq, cnt_tile)
        lo_ref[:, :] = lo_tile
        cnt_ref[:, :] = cnt_tile

    def in_spec(k):
        return pl.BlockSpec((ROWS, 128), lambda i, blk_ref, q_ref, k=k: (blk_ref[i * G + k], 0))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # block ids + queries
        grid=(L_pad // G,),
        in_specs=[in_spec(k) for k in range(G)],
        out_specs=[
            pl.BlockSpec((8, 128), lambda i, blk_ref, q_ref: (i * G // TILE, 0)),
            pl.BlockSpec((8, 128), lambda i, blk_ref, q_ref: (i * G // TILE, 0)),
        ],
    )
    lo, cnt = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((L_pad // TILE * 8, 128), jnp.int32),
            jax.ShapeDtypeStruct((L_pad // TILE * 8, 128), jnp.int32),
        ),
        interpret=_use_interpret(),
    )(blk, queries, *([hashes2d] * G))
    return lo.reshape(-1)[:L], cnt.reshape(-1)[:L]


def tier_ranges_blocked(tier, queries, valid_q, cap_k):
    """Two-level replacement for the per-tier range phase.

    `queries`/`valid_q` are (B, Q); returns lo/counts of shape (B, S, Q)
    plus a truncation flag.  Requires tier["block_index"] and BLOCK-aligned
    segment packing.
    """
    B, Q = queries.shape
    S = tier["seg_start"].shape[0]
    block_index = tier["block_index"]
    nblk = block_index.shape[0]

    # Stage 1: block id per (batch, segment, hash) from the small top
    # index, restricted to the segment's block range.
    blk_start = (tier["seg_start"] // BLOCK)[None, :, None]  # (1, S, 1)
    blk_len = ((tier["seg_len"] + BLOCK - 1) // BLOCK)[None, :, None]
    q3 = queries[:, None, :]  # (B, 1, Q)
    ub = upper_bound(block_index, q3, blk_start, blk_len)  # (B, S, Q)
    blk = jnp.clip(ub - 1, blk_start, jnp.maximum(blk_start, blk_start + blk_len - 1))
    blk = jnp.clip(blk, 0, nblk - 1).astype(jnp.int32)
    # Padded query lanes and empty slots don't need their block: point them
    # at block 0 so they form constant runs — the pipeline skips the DMA
    # when consecutive grid steps map to the same block, making dead
    # lookups nearly free (their counts are masked to 0 below anyway).
    live = jnp.logical_and(valid_q[:, None, :], (tier["seg_len"] > 0)[None, :, None])
    blk = jnp.where(live, blk, 0)

    # Stage 2: Pallas block scan over the flattened lookup stream.
    lookups = jnp.broadcast_to(q3, (B, S, Q)).reshape(-1)
    lo_flat, cnt_flat = block_lookup(tier["hashes"], blk.reshape(-1), lookups)
    lo = lo_flat.reshape(B, S, Q)
    cnt = cnt_flat.reshape(B, S, Q)

    # Clamp into the owning segment's [start, end).
    start3 = tier["seg_start"][None, :, None]
    end3 = start3 + tier["seg_len"][None, :, None]
    lo = jnp.clip(lo, start3, end3)
    cnt = jnp.minimum(cnt, end3 - lo)
    cnt = jnp.where(valid_q[:, None, :], cnt, 0)
    kcap = jnp.int32(min(cap_k, BLOCK))
    cnt = jnp.minimum(cnt, kcap)
    # A hash run can spill past its block; the single-block scan bound is
    # the reference's own truncation behavior, surfaced the same way.
    truncated = jnp.any(cnt >= kcap)
    return lo, cnt, truncated


def mention_lookup_blocked(tier, cand_flat, valid=None):
    """Newest tier-local mention ordinal per candidate via the same
    two-level pattern: top index over mention_ids[::BLOCK] (XLA, tiny),
    one pipelined block DMA per candidate (skipped for runs of dead
    candidates), and a single ord gather.  Mention ids are unique per doc,
    so the in-block equality count is 0 or 1."""
    ids = tier["mention_ids"]
    top = ids[::BLOCK]
    nblk = top.shape[0]
    blk = jnp.clip(
        jnp.searchsorted(top, cand_flat, side="right").astype(jnp.int32) - 1, 0, nblk - 1
    )
    if valid is not None:
        # Dead candidates point at block 0 so consecutive grid steps share
        # the block and the pipeline skips their DMA.
        blk = jnp.where(valid, blk, 0)
    lo, cnt = block_lookup(ids, blk, cand_flat)
    lo_c = jnp.clip(lo, 0, ids.shape[0] - 1)
    found = jnp.logical_and(cnt > 0, lo < tier["mention_len"])
    return jnp.where(found, tier["mention_ord"][lo_c], -1)
