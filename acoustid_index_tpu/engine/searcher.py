"""Query pipeline: preprocessing, kernel dispatch, result materialization.

Queries are sorted and de-duplicated up front, matching the reference's rule
that a duplicate query hash must count once no matter which tier serves it
(IndexReader.search, /root/reference/src/Index.zig:162-177), then padded to
a bucketed static length so XLA compiles a handful of programs.
"""

from __future__ import annotations

import threading
import time
from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..ops.search_kernel import SearchParams, make_search_fn
from .model import SearchOptions, SearchResult
from .segments import Snapshot, tier_view_for_search

QUERY_BUCKETS = (64, 128, 256, 1024, 4096)  # 128: real fingerprint queries run ~120 hashes
MAX_QUERY_HASHES = QUERY_BUCKETS[-1]

# The HTTP API caps limit at 100 (-> the 128 bucket); the legacy protocol's
# session max_results defaults to 500 (legacy.zig:44) and must be honored, so
# a second bucket serves large limits.  Limits beyond the last bucket clamp.
OUT_BUCKETS = (128, 512)
MAX_RESULTS = OUT_BUCKETS[-1]


@dataclass(frozen=True)
class SearchStats:
    postings_scanned: int
    truncated: bool


def _out_bucket_for(limit: int) -> int:
    return next(b for b in OUT_BUCKETS if b >= min(limit, MAX_RESULTS))


def _params_for(q_bucket: int, out_bucket: int = 128) -> SearchParams:
    # The gather + scoring phases scale with the budget (measured: the
    # per-posting random gather dominates past P=1024), so keep it tight:
    # typical fingerprint queries gather a few postings per hash; heavier
    # queries report `truncated` (the reference's own per-hash scan caps
    # truncate far earlier, FileSegment.zig:25-26).
    budget = min(max(1024, q_bucket * 4), 16384)
    return SearchParams(
        query_len=q_bucket,
        postings_budget=budget,
        per_hash_cap=1024,
        # C bounds ranked candidates and must cover the output tile; the
        # extra headroom absorbs superseded high-scorers that finish() skips.
        candidate_cap=256 if out_bucket <= 128 else 2 * out_bucket,
        out_len=out_bucket,
    )


class Searcher:
    """Owns compiled search programs, keyed by static params.

    The searcher also owns the device LAYOUT of segment views: the engine
    calls pack_file_tier/pack_mem_tier whenever a tier's segment set changes
    (file tier only at checkpoint/merge; memory tier per write), so a
    mesh-sharded searcher can substitute hash-range-sharded views without
    the engine knowing — and view sharing across snapshots (update() reuses
    cur.file_view) makes the sharded file view incremental for free."""

    def __init__(self):
        self._fns: Dict[SearchParams, object] = {}
        self._lock = threading.Lock()

    def pack_file_tier(self, segments) -> Dict:
        from .segments import FILE_SLOTS, pack_tier

        return pack_tier(segments, FILE_SLOTS)

    def pack_mem_tier(self, segments) -> Dict:
        from .segments import MEMORY_SLOTS, pack_tier

        return pack_tier(segments, MEMORY_SLOTS)

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
        deadline: Optional[float] = None,
    ) -> Tuple[List[SearchResult], SearchStats]:
        q, q_len = self.prepare_query(query)
        if q_len == 0 or snapshot.file_view is None or snapshot.mem_view is None:
            return [], SearchStats(0, False)

        bucket = next(b for b in QUERY_BUCKETS if b >= q_len)
        params = _params_for(bucket, _out_bucket_for(options.max_results))
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


class _BatchGroup:
    __slots__ = ("key", "requests", "done", "closed", "results", "error")

    def __init__(self, key):
        self.key = key
        self.requests = []  # (padded_query, q_len, options)
        self.done = threading.Event()
        self.closed = False
        self.results = None
        self.error = None


BATCH_SIZES = (1, 2, 4, 8, 16, 32, 64, 128, 256)
MAX_BATCH = BATCH_SIZES[-1]


class BatchingSearcher(Searcher):
    """Coalesces concurrent searches against the same snapshot view into one
    batched device program (leader/follower, no dedicated thread).

    The reference's throughput comes from many CPU threads scanning
    independently; on TPU the equivalent is one vectorized program over a
    query batch — a single launch amortizes dispatch and keeps the VPU fed.
    Requests are grouped by (table identity, query bucket); the first
    request in a group becomes the leader, waits up to `max_wait` for
    followers (only when there is real concurrency), then executes.
    """

    def __init__(self, max_wait: float = 0.002):
        super().__init__()
        self.max_wait = max_wait
        self._glock = threading.Lock()
        self._groups: Dict[tuple, _BatchGroup] = {}
        self._active = 0

    def _batch_fn(self, params: SearchParams):
        from ..ops.search_kernel import search_segments_batch_packed
        import functools

        return functools.partial(search_segments_batch_packed, params)

    # A follower without a deadline still must not wait forever on a wedged
    # leader (the API caps timeouts at 10s; legacy sessions may run with
    # timeout 0 = none).
    MAX_FOLLOWER_WAIT = 120.0

    def search(
        self,
        snapshot: Snapshot,
        query: Sequence[int],
        options: SearchOptions,
        deadline: Optional[float] = None,
    ):
        q, q_len = self.prepare_query(query)
        if q_len == 0 or snapshot.file_view is None or snapshot.mem_view is None:
            return [], SearchStats(0, False)
        bucket = next(b for b in QUERY_BUCKETS if b >= q_len)
        out_bucket = _out_bucket_for(options.max_results)
        padded = np.zeros(bucket, dtype=np.uint32)
        padded[:q_len] = q
        key = (id(snapshot.file_view), id(snapshot.mem_view), bucket, out_bucket)

        with self._glock:
            self._active += 1
            group = self._groups.get(key)
            if group is not None and not group.closed and len(group.requests) < MAX_BATCH:
                idx = len(group.requests)
                group.requests.append((padded, q_len, options))
                leader = False
            else:
                group = _BatchGroup(key)
                group.requests.append((padded, q_len, options))
                self._groups[key] = group
                idx = 0
                leader = True
            concurrency = self._active

        try:
            if leader:
                # Solo traffic dispatches immediately; real concurrency waits
                # a moment for followers to coalesce.
                if concurrency > 1:
                    wait_until = time.monotonic() + self.max_wait
                    while time.monotonic() < wait_until:
                        with self._glock:
                            if len(group.requests) >= MAX_BATCH:
                                break
                        time.sleep(0.0002)
                with self._glock:
                    group.closed = True
                    if self._groups.get(key) is group:
                        del self._groups[key]
                # Deadline re-check after the coalesce wait; once dispatched,
                # the (bounded) device program runs to completion and its
                # latency does NOT count against the deadline — first-compile
                # of a cold bucket takes seconds and must not fail requests.
                expired = deadline is not None and time.monotonic() > deadline
                # The leader always executes — followers joined this group and
                # would hang otherwise.
                try:
                    group.results = self._run_batch(snapshot, bucket, out_bucket, group.requests)
                except Exception as exc:  # noqa: BLE001 — propagated per-request
                    group.error = exc
                group.done.set()
                if expired:
                    from .errors import SearchTimeout

                    raise SearchTimeout("search deadline expired while coalescing")
            else:
                wait = self.MAX_FOLLOWER_WAIT
                if deadline is not None:
                    wait = min(wait, max(0.0, deadline - time.monotonic()))
                if not group.done.wait(timeout=wait):
                    if deadline is not None and time.monotonic() > deadline:
                        # Deadline expired while coalesced behind a slow leader.
                        from .errors import SearchTimeout

                        raise SearchTimeout("search deadline expired while batched")
                    if not group.done.wait(timeout=self.MAX_FOLLOWER_WAIT):
                        raise RuntimeError("batched search leader never completed")
            if group.error is not None:
                raise group.error
            return group.results[idx]
        finally:
            with self._glock:
                self._active -= 1

    def _run_batch(self, snapshot, bucket, out_bucket, requests):
        from ..utils.profiling import trace

        params = _params_for(bucket, out_bucket)
        n = len(requests)
        with trace(f"search_batch[{n}]"):
            return self._run_batch_traced(snapshot, params, requests)

    def _run_batch_traced(self, snapshot, params, requests):
        import jax

        n = len(requests)
        b = next(x for x in BATCH_SIZES if x >= n)
        qs = np.zeros((b, params.query_len), np.uint32)
        lens = np.zeros(b, np.int32)
        limits = np.ones(b, np.int32)
        min_scores = np.zeros(b, np.int32)
        pcts = np.zeros(b, np.int32)
        for i, (padded, q_len, options) in enumerate(requests):
            qs[i] = padded
            lens[i] = q_len
            limits[i] = options.max_results
            min_scores[i] = options.min_score
            pcts[i] = options.min_score_pct
        # ONE packed output array -> one device->host sync per batch (each
        # array transfer costs a full round trip on tunneled dev chips).
        from ..ops.search_kernel import unpack_outputs_np

        packed = np.asarray(
            jax.device_get(
                self._batch_fn(params)(
                    tier_view_for_search(snapshot.file_view),
                    tier_view_for_search(snapshot.mem_view),
                    qs,
                    lens,
                    limits,
                    min_scores,
                    pcts,
                )
            )
        )
        out = unpack_outputs_np(packed, params.out_len)
        return [
            self._materialize({k: v[i] for k, v in out.items()}) for i in range(n)
        ]

    def warm(
        self,
        snapshot: Snapshot,
        q_buckets: Sequence[int] = (64, 256),
        batch_sizes: Sequence[int] = (1, 16, 256),
        out_bucket: int = 128,
    ) -> None:
        """Precompile the batch programs live traffic will hit (the
        persistent XLA cache makes later processes near-instant).  Intended
        for a background warmup thread at startup."""
        if snapshot.file_view is None or snapshot.mem_view is None:
            return
        from .model import SearchOptions

        options = SearchOptions()
        for qb in q_buckets:
            padded = np.zeros(qb, np.uint32)
            padded[:3] = (1, 2, 3)
            req = (padded, 3, options)
            params = _params_for(qb, out_bucket)
            for b in batch_sizes:
                self._run_batch_traced(snapshot, params, [req] * min(b, MAX_BATCH))

    @staticmethod
    def _materialize(out):
        n = int(out["count"])
        results = [
            SearchResult(id=int(out["ids"][i]), score=int(out["scores"][i])) for i in range(n)
        ]
        stats = SearchStats(
            postings_scanned=int(out["postings_scanned"]), truncated=bool(out["truncated"])
        )
        return results, stats


_default_searcher: Optional[Searcher] = None
_default_lock = threading.Lock()


def default_searcher() -> Searcher:
    global _default_searcher
    with _default_lock:
        if _default_searcher is None:
            _default_searcher = BatchingSearcher()
        return _default_searcher
