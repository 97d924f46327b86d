"""Device merge kernel vs the host merger (segment_merger.zig semantics)."""

import numpy as np

import jax.numpy as jnp

from acoustid_index_tpu.engine.memseg import build_segment, merge_segments
from acoustid_index_tpu.engine.model import Delete, Insert, SegmentInfo
from acoustid_index_tpu.engine.segments import Snapshot
from acoustid_index_tpu.ops.build import merge_postings_live, sort_postings


def pack_contiguous(segments, cap, dcap):
    """Contiguous (non-aligned) packing for the merge kernel."""
    S = len(segments)
    out = {
        "hashes": np.full(cap, 0xFFFFFFFF, np.uint32),
        "docids": np.full(cap, 0xFFFFFFFF, np.uint32),
        "seg_start": np.zeros(S, np.int32),
        "seg_len": np.zeros(S, np.int32),
        "docs_ids": np.full(dcap, 0xFFFFFFFF, np.uint32),
        "docs_alive": np.zeros(dcap, np.int32),
        "docs_start": np.zeros(S, np.int32),
        "docs_len": np.zeros(S, np.int32),
    }
    pos = dpos = 0
    for k, s in enumerate(segments):
        out["seg_start"][k] = pos
        out["seg_len"][k] = s.num_items
        out["hashes"][pos : pos + s.num_items] = s.hashes
        out["docids"][pos : pos + s.num_items] = s.docids
        pos += s.num_items
        out["docs_start"][k] = dpos
        out["docs_len"][k] = s.num_docs
        out["docs_ids"][dpos : dpos + s.num_docs] = s.docs_ids
        out["docs_alive"][dpos : dpos + s.num_docs] = s.docs_alive.astype(np.int32)
        dpos += s.num_docs
    return {k: jnp.asarray(v) for k, v in out.items()}


def test_device_merge_matches_host_merger():
    rng = np.random.default_rng(1)
    segs = []
    commit = 1
    for _ in range(4):
        docs = {
            int(rng.integers(1, 50)): rng.integers(0, 1000, int(rng.integers(1, 8)), dtype=np.uint32).tolist()
            for _ in range(int(rng.integers(2, 10)))
        }
        deletes = [int(x) for x in rng.integers(1, 50, 2) if int(x) not in docs]
        segs.append(
            build_segment(
                [Insert(id=i, hashes=h) for i, h in docs.items()] + [Delete(id=i) for i in deletes],
                SegmentInfo(commit_id=commit),
            )
        )
        commit += 1

    # Host merger over the whole set (the collection IS the sources here).
    collection = Snapshot(file=tuple(segs), memory=())
    want = merge_segments(segs, collection)

    packed = pack_contiguous(segs, cap=1024, dcap=256)
    h, d, n_kept, did, dalive, n_docs = merge_postings_live(
        packed["hashes"], packed["docids"], packed["seg_start"], packed["seg_len"],
        packed["docs_ids"], packed["docs_alive"], packed["docs_start"], packed["docs_len"],
    )
    n_kept, n_docs = int(n_kept), int(n_docs)
    assert n_kept == want.num_items
    assert np.array_equal(np.asarray(h)[:n_kept], want.hashes)
    assert np.array_equal(np.asarray(d)[:n_kept], want.docids)
    assert n_docs == want.num_docs
    assert np.array_equal(np.asarray(did)[:n_docs], want.docs_ids)
    assert np.array_equal(np.asarray(dalive)[:n_docs].astype(bool), want.docs_alive)
