"""Oracle parity THROUGH the Pallas blocked-lookup path: the packed table
must exceed the 64-block gating threshold so _batch_ranges takes the
two-level route (interpret mode on the CPU test backend) — the small-table
kernel tests all fall back to the XLA range phase and would never catch a
blocked-lookup regression."""

import numpy as np

import jax.numpy as jnp

from acoustid_index_tpu.engine.memseg import build_segment
from acoustid_index_tpu.engine.model import Insert, SegmentInfo, SearchOptions
from acoustid_index_tpu.engine.searcher import Searcher
from acoustid_index_tpu.engine.segments import (
    FILE_SLOTS,
    MEMORY_SLOTS,
    Snapshot,
    pack_tier,
)
from acoustid_index_tpu.ops.pallas_lookup import BLOCK


def test_pallas_path_matches_oracle():
    rng = np.random.default_rng(9)
    n_docs = 4000
    hashes_per_doc = 24  # 96k postings > 64*BLOCK -> pallas path engages
    doc_hashes = rng.integers(0, 2**32, (n_docs, hashes_per_doc), dtype=np.uint32)
    seg = build_segment(
        [Insert(id=i + 1, hashes=doc_hashes[i].tolist()) for i in range(n_docs)],
        SegmentInfo(commit_id=1),
    )
    snap = Snapshot(
        file=(seg,),
        memory=(),
        file_view=pack_tier([seg], FILE_SLOTS),
        mem_view=pack_tier([], MEMORY_SLOTS),
    )
    assert snap.file_view["hashes"].shape[0] >= 64 * BLOCK  # pallas path gating

    searcher = Searcher()
    h_sorted = np.asarray(seg.hashes)
    d_sorted = np.asarray(seg.docids)

    for trial in range(6):
        t = int(rng.integers(1, n_docs + 1))
        q = np.unique(
            np.concatenate(
                [
                    doc_hashes[t - 1][:15],
                    doc_hashes[int(rng.integers(1, n_docs + 1)) - 1][:5],
                    rng.integers(0, 2**32, 4, dtype=np.uint32),
                ]
            )
        )
        got, _ = searcher.search(
            snap, q.tolist(), SearchOptions(max_results=10, min_score=2, min_score_pct=10)
        )
        got = [(r.id, r.score) for r in got]

        hits = {}
        for hq in q:
            lo = np.searchsorted(h_sorted, hq, "left")
            hi = np.searchsorted(h_sorted, hq, "right")
            for did in d_sorted[lo:hi]:
                hits[int(did)] = hits.get(int(did), 0) + 1
        cands = sorted(((d, s) for d, s in hits.items() if s >= 2), key=lambda x: (-x[1], x[0]))
        want = []
        ms = 2
        for d, s in cands:
            if len(want) == 10:
                break
            if s < ms:
                break
            if not want:
                ms = max(ms, s * 10 // 100)
            want.append((d, s))
        assert got == want, (trial, got[:5], want[:5])
        assert got and got[0][0] == t
