"""Does the mesh-sharded serving program lower natively on real TPU?
(shard_map + chunked Pallas blocked lookup + ICI collectives, 1-device
mesh — collectives degenerate but the code path is the sharded one.)"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import time

import numpy as np

import jax

from acoustid_index_tpu.engine.memseg import build_segment
from acoustid_index_tpu.engine.model import Insert, SegmentInfo
from acoustid_index_tpu.engine.segments import Snapshot
from acoustid_index_tpu.ops.search_kernel import SearchParams
from acoustid_index_tpu.parallel.sharded import build_sharded_view, make_mesh, sharded_search


def main():
    rng = np.random.default_rng(5)
    n_docs = 6000
    docs = {i: rng.integers(0, 2**32, 16, dtype=np.uint32).tolist() for i in range(1, n_docs)}
    seg = build_segment(
        [Insert(id=i, hashes=h) for i, h in docs.items()], SegmentInfo(commit_id=1)
    )
    assert seg.hashes.shape[0] >= 64 * 1024, seg.hashes.shape  # blocked path engages
    mesh = make_mesh(1)
    view = build_sharded_view(Snapshot(file=(seg,), memory=()), mesh)
    params = SearchParams(query_len=64, postings_budget=4096)

    t0 = time.time()
    ok = 0
    for probe_doc in (7, 1234, 5555):
        q = np.unique(np.asarray(docs[probe_doc], np.uint32))
        padded = np.zeros(64, np.uint32)
        padded[: q.shape[0]] = q
        out = jax.device_get(
            sharded_search(params, mesh, view, padded, int(q.shape[0]), 5, 2, 10)
        )
        top = int(out["ids"][0])
        assert top == probe_doc, (probe_doc, out)
        ok += 1
    print(f"sharded program on TPU: {ok}/3 self-retrievals ok ({time.time()-t0:.0f}s incl compile)", flush=True)


if __name__ == "__main__":
    main()
