"""Host-path ceiling probe: the serving pipeline with the device removed.

Measures e2e open-loop qps with _launch returning canned outputs — pure
host cost (submit packing, dispatcher, queues, GIL, materialize).  Runs on
the CPU backend with a small corpus: host cost per request is independent
of corpus size, so this iterates host-path optimizations without the TPU.

    AITPU_JAX_PLATFORMS=cpu python probes/_probe_hostpath.py
"""
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("AITPU_BENCH_E2E_SECONDS", "10")

import bench  # noqa: E402

bench.E2E_DOCS = 20_000
bench.E2E_SECONDS = float(os.environ["AITPU_BENCH_E2E_SECONDS"])


def main():
    import jax  # noqa: F401

    from acoustid_index_tpu.engine.model import Insert, SearchOptions
    from acoustid_index_tpu.multi.multi_index import MultiIndex

    rng = np.random.default_rng(5)
    with tempfile.TemporaryDirectory() as tmp:
        mi = MultiIndex.open(tmp, checkpoint_age=None, sync=False)
        mi.create_index("main")
        ref = mi._get_ref("main")
        idx = ref.index
        try:
            step = 10_000
            for lo in range(1, bench.E2E_DOCS + 1, step):
                ids = np.arange(lo, min(lo + step, bench.E2E_DOCS + 1), dtype=np.uint32)
                hs = bench.doc_hashes(ids, bench.HASHES_PER_DOC)
                idx.update([Insert(id=int(i), hashes=h.tolist()) for i, h in zip(ids, hs)])
            idx.checkpoint(force=True)
            options = SearchOptions(max_results=40, min_score=6, min_score_pct=10)
            t0 = time.time()
            out = bench.e2e_host_only(idx, options, rng)
            print(f"hostonly: {out['e2e_hostonly_qps']:.0f} qps "
                  f"({out['e2e_hostonly_queries']} queries, {time.time()-t0:.0f}s)")
        finally:
            mi._release_ref(ref)
            mi.close()


if __name__ == "__main__":
    main()
