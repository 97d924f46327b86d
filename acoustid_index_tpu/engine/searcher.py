"""Query pipeline: preprocessing, kernel dispatch, result materialization.

Queries are sorted and de-duplicated up front, matching the reference's rule
that a duplicate query hash must count once no matter which tier serves it
(IndexReader.search, /root/reference/src/Index.zig:162-177), then padded to
a bucketed static length so XLA compiles a handful of programs.
"""

from __future__ import annotations

import threading
from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..ops.search_kernel import SearchParams, make_search_fn
from .model import SearchOptions, SearchResult
from .segments import Snapshot, tier_view_for_search

QUERY_BUCKETS = (64, 256, 1024, 4096)
MAX_QUERY_HASHES = QUERY_BUCKETS[-1]


@dataclass(frozen=True)
class SearchStats:
    postings_scanned: int
    truncated: bool


def _params_for(q_bucket: int) -> SearchParams:
    budget = min(max(16384, q_bucket * 64), 65536)
    return SearchParams(
        query_len=q_bucket,
        postings_budget=budget,
        per_hash_cap=1024,
        candidate_cap=1024,
        out_len=128,
    )


class Searcher:
    """Owns compiled search programs, keyed by static params."""

    def __init__(self):
        self._fns: Dict[SearchParams, object] = {}
        self._lock = threading.Lock()

    def _fn(self, params: SearchParams):
        with self._lock:
            fn = self._fns.get(params)
            if fn is None:
                fn = make_search_fn(params)
                self._fns[params] = fn
            return fn

    def prepare_query(self, query: Sequence[int]) -> Tuple[np.ndarray, int]:
        q = np.unique(np.asarray(query, dtype=np.uint32))  # sorted + deduped
        if q.shape[0] > MAX_QUERY_HASHES:
            q = q[:MAX_QUERY_HASHES]
        return q, int(q.shape[0])

    def search(
        self,
        snapshot: Snapshot,
        query: Sequence[int],
        options: SearchOptions,
    ) -> Tuple[List[SearchResult], SearchStats]:
        q, q_len = self.prepare_query(query)
        if q_len == 0 or snapshot.file_view is None or snapshot.mem_view is None:
            return [], SearchStats(0, False)

        bucket = next(b for b in QUERY_BUCKETS if b >= q_len)
        params = _params_for(bucket)
        fn = self._fn(params)

        padded = np.zeros(bucket, dtype=np.uint32)
        padded[:q_len] = q
        out = fn(
            tier_view_for_search(snapshot.file_view),
            tier_view_for_search(snapshot.mem_view),
            padded,
            np.int32(q_len),
            np.int32(options.max_results),
            np.int32(options.min_score),
            np.int32(options.min_score_pct),
        )
        import jax

        out = jax.device_get(out)
        n = int(out["count"])
        results = [
            SearchResult(id=int(out["ids"][i]), score=int(out["scores"][i]))
            for i in range(n)
        ]
        stats = SearchStats(
            postings_scanned=int(out["postings_scanned"]),
            truncated=bool(out["truncated"]),
        )
        return results, stats


_default_searcher: Optional[Searcher] = None
_default_lock = threading.Lock()


def default_searcher() -> Searcher:
    global _default_searcher
    with _default_lock:
        if _default_searcher is None:
            _default_searcher = Searcher()
        return _default_searcher
