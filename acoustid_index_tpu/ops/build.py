"""Device-side term-table construction and segment merging.

The reference builds memory segments with a host pdq sort
(/root/reference/src/MemorySegment.zig:139) and compacts segments with a
k-way streaming merger (/root/reference/src/segment_merger.zig).  Here both
become device sorts over padded static buffers:

  * `sort_postings` — sort an ingest batch's (hash, docid) pairs; the basis
    of every new memory segment.
  * `merge_postings_live` — merge a packed run of segments into one, dropping
    postings of docs that a newer segment in the run mentions (the merger's
    `skip_docs` rule) and collapsing the per-segment mentioned-doc maps to
    newest-wins (tombstones are kept, exactly like the reference merger).

Both are shape-stable: callers pad to bucketed capacities and pass live
counts as scalars, so XLA compiles a handful of programs total.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .binsearch import lower_bound

# numpy scalar ON PURPOSE — see ops/search_kernel.py SENTINEL: a module-level
# jnp scalar becomes a device-array jaxpr constant fetched at every lowering.
import numpy as _np

SENTINEL = _np.uint32(0xFFFFFFFF)


@jax.jit
def sort_postings(hashes: jax.Array, ids: jax.Array, n: jax.Array):
    """Sort padded (hash, id) pairs by (hash, id); invalid tail sorts last.

    Returns (hashes_sorted, ids_sorted) with the `n` valid entries in front
    and SENTINEL padding behind them.
    """
    size = hashes.shape[0]
    inv = (jnp.arange(size, dtype=jnp.int32) >= n).astype(jnp.int32)
    h = jnp.where(inv == 1, SENTINEL, hashes.astype(jnp.uint32))
    d = jnp.where(inv == 1, SENTINEL, ids.astype(jnp.uint32))
    inv, h, d = jax.lax.sort((inv, h, d), num_keys=3)
    return h, d


@jax.jit
def merge_postings_live(
    hashes: jax.Array,  # u32[CAP] packed postings, contiguous in ordinal order
    docids: jax.Array,  # u32[CAP]
    seg_start: jax.Array,  # i32[S] (contiguous: start[k+1] == start[k]+len[k])
    seg_len: jax.Array,  # i32[S]
    docs_ids: jax.Array,  # u32[DCAP] packed per-segment sorted mentioned docs
    docs_alive: jax.Array,  # i32[DCAP] 1=live, 0=tombstone
    docs_start: jax.Array,  # i32[S]
    docs_len: jax.Array,  # i32[S]
):
    """Merge every segment in the packed view into one sorted segment.

    Returns (hashes', docids', n_postings, docs_ids', docs_alive', n_docs)
    in the same padded shapes.
    """

    cap = hashes.shape[0]
    S = seg_start.shape[0]
    n_total = jnp.sum(seg_len)

    # Ordinal of each posting position (segments are packed contiguously).
    pos = jnp.arange(cap, dtype=jnp.int32)
    bounds = jnp.cumsum(seg_len)  # inclusive ends
    ordinal = jnp.searchsorted(bounds, pos, side="right").astype(jnp.int32)
    in_range = pos < n_total

    # Mentioned-docs map first: newest (id, ordinal) wins; tombstones
    # survive.  The merged table also answers the posting skip rule below
    # with ONE binary search per posting (newest mention ordinal > posting
    # ordinal <=> a newer in-run segment mentions the doc) — O(CAP log D)
    # instead of the naive O(CAP * S log) per-segment membership scan.
    dcap = docs_ids.shape[0]
    dpos = jnp.arange(dcap, dtype=jnp.int32)
    dbounds = jnp.cumsum(docs_len)
    dn_total = jnp.sum(docs_len)
    dord = jnp.searchsorted(dbounds, dpos, side="right").astype(jnp.int32)
    d_in = dpos < dn_total

    dinv = jnp.logical_not(d_in).astype(jnp.int32)
    did = jnp.where(d_in, docs_ids, SENTINEL)
    dinv, did, dord2, dalive = jax.lax.sort((dinv, did, dord, docs_alive), num_keys=3)
    d_in = dinv == 0

    nxt_id = jnp.concatenate([did[1:], jnp.full((1,), 0, did.dtype)])
    nxt_in = jnp.concatenate([d_in[1:], jnp.zeros((1,), bool)])
    last_pos = jnp.arange(dcap, dtype=jnp.int32) == dcap - 1
    is_last = jnp.logical_and(
        d_in,
        jnp.logical_or(last_pos, jnp.logical_or(did != nxt_id, jnp.logical_not(nxt_in))),
    )
    linv = jnp.logical_not(is_last).astype(jnp.int32)
    out_id = jnp.where(is_last, did, SENTINEL)
    _, out_id, out_alive, out_ord = jax.lax.sort((linv, out_id, dalive, dord2), num_keys=2)
    n_docs = jnp.sum(is_last.astype(jnp.int32))

    # Drop a posting iff a newer segment in the run mentions its doc
    # (segment_merger.zig's skip_docs / hasNewerCommit rule): every posting's
    # doc is mentioned by its own segment, so its merged-table entry exists
    # and carries the NEWEST in-run mention ordinal.
    loc = lower_bound(out_id, docids, jnp.int32(0), n_docs)
    loc_c = jnp.clip(loc, 0, dcap - 1)
    newest = jnp.where(
        jnp.logical_and(loc < n_docs, out_id[loc_c] == docids), out_ord[loc_c], -1
    )
    dead = newest > ordinal
    keep = jnp.logical_and(in_range, jnp.logical_not(dead))

    inv = jnp.logical_not(keep).astype(jnp.int32)
    h = jnp.where(keep, hashes, SENTINEL)
    d = jnp.where(keep, docids, SENTINEL)
    _, h, d = jax.lax.sort((inv, h, d), num_keys=3)
    n_kept = jnp.sum(keep.astype(jnp.int32))

    return h, d, n_kept, out_id, out_alive, n_docs
