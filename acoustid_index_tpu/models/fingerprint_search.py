"""The flagship "model": the exact-scoring fingerprint search program.

This wraps the search kernel, table construction, and (optionally) the
mesh-sharded execution into one object with an ML-framework-shaped API:
`ingest` builds the device-resident term table (the "weights"), `forward`
runs the batched search program over queries (the "inference step").  The
HTTP engine (engine/index.py) uses the same kernels through its snapshot
machinery; this module is the direct, embedding-friendly surface for bulk
workloads and benchmarks.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Sequence

import numpy as np

from ..ops.build import sort_postings
from ..ops.search_kernel import SearchParams, search_segments, search_segments_batch
FILE_SLOTS = 1  # bulk-load shape: one segment
MEMORY_SLOTS = 1


from ..engine.segments import _bucket as _bucket_impl


def _bucket(n: int, minimum: int = 1024) -> int:
    return _bucket_impl(n, minimum)


@dataclass
class TermTable:
    """A single-segment packed device view (file tier) with an empty memory
    tier — the bulk-load shape: one immutable sorted table."""

    file_tier: dict
    mem_tier: dict
    n_postings: int
    n_docs: int


class FingerprintSearchModel:
    def __init__(self, params: Optional[SearchParams] = None):
        self.params = params or SearchParams(query_len=64, postings_budget=8192)

    # ---- "training": build the table on device ----

    def ingest(self, hashes, doc_ids) -> TermTable:
        """Build a device term table from (hash, doc_id) pairs via a device
        sort.  `hashes`/`doc_ids` are 1-D u32 arrays (one row per posting)."""
        import jax.numpy as jnp

        doc_ids_np = np.asarray(doc_ids, np.uint32)
        if doc_ids_np.size and int(doc_ids_np.min()) == 0:
            # Doc id 0 is reserved engine-wide: the scoring kernel's sort key
            # is docid-1 and 0 would alias the invalid sentinel.
            raise ValueError("fingerprint id 0 is reserved")
        hashes = jnp.asarray(hashes, jnp.uint32)
        doc_ids = jnp.asarray(doc_ids_np)
        n = int(hashes.shape[0])
        h_sorted, d_sorted = sort_postings(hashes, doc_ids, n)

        cap = _bucket(max(n, 1))
        docs = jnp.unique(doc_ids, size=None)  # sorted unique doc ids
        m = int(docs.shape[0])
        dcap = _bucket(max(m, 1))

        def pad(a, size):
            out = jnp.full((size,), 0xFFFFFFFF, jnp.uint32)
            return out.at[: a.shape[0]].set(a)

        hashes_padded = pad(h_sorted[:n], cap)
        file_tier = {
            "hashes": hashes_padded,
            "docids": pad(d_sorted[:n], cap),
            "block_index": hashes_padded[::1024],
            "seg_start": jnp.zeros(FILE_SLOTS, jnp.int32),
            "seg_len": jnp.zeros(FILE_SLOTS, jnp.int32).at[0].set(n),
            "mention_ids": pad(docs, dcap),
            "mention_len": jnp.int32(m),
        }
        mem_tier = {
            "hashes": jnp.full(1024, 0xFFFFFFFF, jnp.uint32),
            "docids": jnp.full(1024, 0xFFFFFFFF, jnp.uint32),
            "block_index": jnp.full(1, 0xFFFFFFFF, jnp.uint32),
            "seg_start": jnp.zeros(MEMORY_SLOTS, jnp.int32),
            "seg_len": jnp.zeros(MEMORY_SLOTS, jnp.int32),
            "mention_ids": jnp.full(1024, 0xFFFFFFFF, jnp.uint32),
            "mention_len": jnp.int32(0),
        }
        return TermTable(file_tier=file_tier, mem_tier=mem_tier, n_postings=n, n_docs=m)

    # ---- "inference": batched search ----

    def forward(self, table: TermTable, queries: np.ndarray, q_lens: np.ndarray,
                limit: int = 10, min_score: int = 1, score_pct: int = 10):
        """Batched exact search.  `queries` is (B, Q) u32 (sorted, deduped,
        padded rows), `q_lens` is (B,).  Returns the kernel output dict."""
        B = queries.shape[0]
        return search_segments_batch(
            self.params,
            table.file_tier,
            table.mem_tier,
            queries,
            np.asarray(q_lens, np.int32),
            np.full(B, limit, np.int32),
            np.full(B, min_score, np.int32),
            np.full(B, score_pct, np.int32),
        )

    def forward_one(self, table: TermTable, query: Sequence[int],
                    limit: int = 10, min_score: int = 1, score_pct: int = 10):
        q = np.unique(np.asarray(query, np.uint32))
        padded = np.zeros(self.params.query_len, np.uint32)
        padded[: q.shape[0]] = q
        return search_segments(
            self.params,
            table.file_tier,
            table.mem_tier,
            padded,
            np.int32(q.shape[0]),
            np.int32(limit),
            np.int32(min_score),
            np.int32(score_pct),
        )
