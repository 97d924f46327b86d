"""The retired two-block-window pair kernel, kept ONLY for the probes that
measured it (the production straddle fixup now rides the landing stream as
single-block tail slots — see ops/pallas_lookup.py tier_ranges_blocked).
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from acoustid_index_tpu.ops.pallas_lookup import (
    BLOCK,
    ROWS,
    _chunked_stream,
    _use_interpret,
)


def block_lookup_pair(hashes: jax.Array, blk0: jax.Array, blk1: jax.Array, queries: jax.Array, stride: int = 1):
    """(lo, count) per lookup over the two-block window [blk0, blk1].

    `hashes` has length a multiple of BLOCK (sentinel padded); `blk0`/`blk1`
    are per-lookup block ids.  blk1 == 0 DISABLES the second block (a real
    second block is always blk0+1 >= 1); disabled lookups then form
    constant runs the pipeline's same-block skip makes free.  Scalar
    prefetch arrays live in SMEM (1MB total), so the flag rides inside blk1
    rather than a fourth array.  lo is the absolute index of the first
    posting >= query within the window; count the number of equal postings
    inside it.

    `stride=2` reads the interleaved layout (ops/layout.py): each block
    operand covers 2*ROWS rows of which the first ROWS are the hashes.
    """
    from jax.experimental.pallas import tpu as pltpu

    # Lookups per grid step (2 pipelined block DMAs each).  Bigger G
    # amortizes the fixed per-step cost over more lookups; must divide
    # TILE.  The pair kernel carries 2G block operands per step, so its
    # sweet spot is lower than the single-block kernel's.
    G = int(os.environ.get("AITPU_PAIR_G", "64"))
    TILE = 1024

    L = queries.shape[0]
    hashes2d = hashes.reshape(-1, 128)

    # G lookups per grid step, two block operands each (the pipeline keeps
    # 2G block DMAs in flight per step, and skips a DMA when consecutive
    # steps map an operand to the same block — dead lookups point at block
    # 0 so their runs collapse).  Outputs are SMEM scalars: one scalar
    # store per lookup, which measured ~15% cheaper than the former
    # (8, 128) one-hot tile merges (probes/_probe_kernelvariants.py) —
    # this kernel is DMA-issue-bound, so the body must stay minimal: lt
    # and eq are encoded in ONE composite per element ((x<q) + (x==q)<<12;
    # both sums <= 2048 so the fields never carry) giving ONE cross-lane
    # reduction per lookup; the (lo, cnt) decode happens in XLA outside
    # the kernel where it is free elementwise work.
    def kernel(blk0_ref, blk1_ref, q_ref, *refs):
        h_refs = refs[: 2 * G]
        comp_ref = refs[2 * G]
        i = pl.program_id(0)
        base = i * G
        for k in range(G):
            j = base + k
            q = q_ref[j]
            flag = (blk1_ref[j] > 0).astype(jnp.int32)
            b0 = h_refs[2 * k][0:ROWS, :]
            b1 = h_refs[2 * k + 1][0:ROWS, :]
            v0 = (b0 < q).astype(jnp.int32) + ((b0 == q).astype(jnp.int32) << 12)
            v1 = (b1 < q).astype(jnp.int32) + ((b1 == q).astype(jnp.int32) << 12)
            comp_ref[j] = jnp.sum(v0 + flag * v1)

    def in_spec(k):
        half = k % 2
        idx = k // 2
        if half == 0:
            return pl.BlockSpec(
                (stride * ROWS, 128), lambda i, b0, b1, q, idx=idx: (b0[i * G + idx], 0)
            )
        return pl.BlockSpec(
            (stride * ROWS, 128), lambda i, b0, b1, q, idx=idx: (b1[i * G + idx], 0)
        )

    def call(b0c, b1c, qc):
        Lc = qc.shape[0]
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,  # blk0, blk1 (0 = second block disabled), queries
            grid=(Lc // G,),
            in_specs=[in_spec(k) for k in range(2 * G)],
            out_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        )
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=(jax.ShapeDtypeStruct((Lc,), jnp.int32),),
            interpret=_use_interpret(),
        )(b0c, b1c, qc, *([hashes2d] * (2 * G)))[0]

    # 3 scalar arrays + the SMEM output must fit the ~1MB SMEM budget.
    comp, (blk0, blk1, queries) = _chunked_stream(
        call, (blk0, blk1, queries), L, max_stream=32768
    )
    comp = comp.reshape(-1)[:L]
    lt = comp & jnp.int32(0xFFF)
    eq = comp >> 12
    lo = blk0[:L] * BLOCK + lt
    return lo, eq


