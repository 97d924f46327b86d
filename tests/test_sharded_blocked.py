"""Sharded search through the Pallas blocked-lookup path: per-shard tables
above the gating threshold so shard_map runs the two-level lookup (interpret
mode on CPU), compared against the single-device searcher."""

import numpy as np
import pytest

import jax

from acoustid_index_tpu.engine.memseg import build_segment
from acoustid_index_tpu.engine.model import Insert, SegmentInfo, SearchOptions
from acoustid_index_tpu.engine.searcher import Searcher
from acoustid_index_tpu.engine.segments import Snapshot, pack_tier, FILE_SLOTS, MEMORY_SLOTS
from acoustid_index_tpu.ops.pallas_lookup import BLOCK


def postings_cap_sharded(tier):
    return tier["inter"].shape[1] // 2 if "inter" in tier else tier["hashes"].shape[1]

from acoustid_index_tpu.ops.search_kernel import SearchParams
from acoustid_index_tpu.parallel.sharded import build_sharded_view, make_mesh, sharded_search

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")


def test_sharded_blocked_path_matches_single_device():
    rng = np.random.default_rng(21)
    n_docs = 25_000  # ~600k postings -> ~75k per shard > 64*BLOCK
    doc_hashes = rng.integers(0, 2**32, (n_docs, 24), dtype=np.uint32)
    seg = build_segment(
        [Insert(id=i + 1, hashes=doc_hashes[i].tolist()) for i in range(n_docs)],
        SegmentInfo(commit_id=1),
    )
    mesh = make_mesh(8)
    snap = Snapshot(file=(seg,), memory=())
    view = build_sharded_view(snap, mesh)
    assert postings_cap_sharded(view.file_tier) >= 64 * BLOCK  # pallas path gating

    single = Snapshot(
        file=(seg,),
        memory=(),
        file_view=pack_tier([seg], FILE_SLOTS),
        mem_view=pack_tier([], MEMORY_SLOTS),
    )
    searcher = Searcher()
    params = SearchParams(query_len=64, postings_budget=512, candidate_cap=256)

    for trial in range(3):
        t = int(rng.integers(1, n_docs + 1))
        q = np.unique(
            np.concatenate([doc_hashes[t - 1][:14], rng.integers(0, 2**32, 4, dtype=np.uint32)])
        )
        padded = np.zeros(64, np.uint32)
        padded[: q.shape[0]] = q
        out = jax.device_get(
            sharded_search(params, mesh, view, padded, int(q.shape[0]), 10, 2, 10)
        )
        got = [(int(out["ids"][i]), int(out["scores"][i])) for i in range(int(out["count"]))]
        want, _ = searcher.search(
            single, q.tolist(), SearchOptions(max_results=10, min_score=2, min_score_pct=10)
        )
        want = [(r.id, r.score) for r in want]
        assert got == want, (trial, got[:3], want[:3])
        assert got and got[0][0] == t
