"""Host-path attribution: times the serving pipeline's component functions
under the device-removed open-loop load (see _probe_hostpath.py).

    AITPU_JAX_PLATFORMS=cpu python probes/_probe_hostprof.py
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

ACC = {}


def wrap(obj, name, label=None):
    raw = obj.__dict__[name]  # preserves staticmethod-ness
    is_static = isinstance(raw, staticmethod)
    fn = raw.__func__ if is_static else raw
    label = label or name
    ACC[label] = [0, 0.0]

    def timed(*a, **k):
        t0 = time.perf_counter()
        try:
            return fn(*a, **k)
        finally:
            dt = time.perf_counter() - t0
            acc = ACC[label]
            acc[0] += 1
            acc[1] += dt

    setattr(obj, name, staticmethod(timed) if is_static else timed)


def main():
    import jax  # noqa: F401

    from acoustid_index_tpu.engine import searcher as s
    from acoustid_index_tpu.engine.model import Insert, SearchOptions
    from acoustid_index_tpu.multi.multi_index import MultiIndex

    wrap(s.BatchingSearcher, "submit")
    wrap(s.BatchingSearcher, "_materialize_row")
    wrap(s.BatchingSearcher, "_claim_locked")
    wrap(s.Searcher, "prepare_query")
    wrap(s.BatchingSearcher, "_pack_rows")
    wrap(s.BatchingSearcher, "_await")

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
            for a in ACC.values():
                a[0] = 0
                a[1] = 0.0
            out = bench.e2e_host_only(idx, options, rng)
            n = out["e2e_hostonly_queries"]
            print(f"hostonly: {out['e2e_hostonly_qps']:.0f} qps ({n} queries)")
            wall = n / out["e2e_hostonly_qps"]
            for k, (cnt, tot) in sorted(ACC.items(), key=lambda kv: -kv[1][1]):
                print(
                    f"  {k:20s} calls={cnt:8d} total={tot:7.2f}s "
                    f"per-req={tot/max(n,1)*1e6:7.1f}us share={tot/wall*100:5.1f}%"
                )
        finally:
            mi._release_ref(ref)
            mi.close()


if __name__ == "__main__":
    main()
