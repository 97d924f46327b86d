"""Attribute the REMAINING rw overhead after the mem-quiet gates + narrow
direct path (d041796): state (a) still measures ~1.6x of the merged
control even though the batch is mem-quiet (max_m_tot=0), the narrow path
engages, and the mention-range gate skips the supersession lookup.  The
suspects left are per-batch costs that do NOT depend on runtime values:

  v0: full state (a) — the measured baseline;
  v1: mem-tier RANGE phase stubbed (m_lo/m_cnt forced zero without
      looking up) — if this recovers the gap, the second per-batch
      tier_ranges_* invocation (fixed kernel cost on a tiny tier) is the
      cost, not any gated compute;
  v2: v1 + _batch_newest stubbed to "no mentions" — whatever v2 still
      loses vs the all-file control is cond-structure overhead itself.

Perf attribution only — the stubs change semantics (fine: queries here
never touch the memory tier).
"""

import functools
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from bench import HASHES_PER_DOC, device_qps_fori, doc_hashes, make_queries
from acoustid_index_tpu.engine.model import Insert
from acoustid_index_tpu.engine.searcher import _params_for
from acoustid_index_tpu.engine.segments import tier_view_for_search
from acoustid_index_tpu.multi.multi_index import MultiIndex
from acoustid_index_tpu.ops import search_kernel as sk

N_DOCS = 500_000
N_MEM_SEGS = 11
BATCH = 256


def main():
    rng = np.random.default_rng(23)
    t0 = time.time()
    with tempfile.TemporaryDirectory() as tmp:
        mi = MultiIndex.open(
            tmp,
            checkpoint_age=None,
            checkpoint_threshold=N_DOCS * HASHES_PER_DOC * 10,
            sync=False,
        )
        mi.create_index("main")
        idx = mi._get_ref("main").index
        try:
            step = 250_000
            for lo in range(1, N_DOCS + 1, step):
                ids = np.arange(lo, min(lo + step, N_DOCS + 1), dtype=np.uint32)
                idx.bulk_insert(ids, doc_hashes(ids, HASHES_PER_DOC))
            idx.checkpoint(force=True)
            base = N_DOCS + 1
            for k in range(N_MEM_SEGS):
                off = (k * 200) % 1200
                ids = np.arange(base + off, base + off + 200, dtype=np.uint32)
                hs = doc_hashes(ids, HASHES_PER_DOC)
                idx.update(
                    [Insert(id=int(i), hashes=h.tolist()) for i, h in zip(ids, hs)]
                )
            snap = idx.acquire_reader()
            print(f"[{time.time()-t0:.0f}s] rw state: S={snap.num_segments()}")

            params = _params_for(128)
            _, qs, lens = make_queries(rng, BATCH, params.query_len, N_DOCS)
            from acoustid_index_tpu.ops.search_kernel import pack_inputs_np

            pin = pack_inputs_np(
                qs,
                lens,
                np.full(BATCH, 40, np.int32),
                np.full(BATCH, 6, np.int32),
                np.full(BATCH, 10, np.int32),
            )
            ft = tier_view_for_search(snap.file_view, mentions=False)
            mt = tier_view_for_search(snap.mem_view)

            real_ranges = sk._batch_ranges
            real_newest = sk._batch_newest

            def ranges_nomem(p, file_tier, mem_tier, queries, q_lens, want_emit=False):
                # File tier only — the mem lookup is never CALLED (XLA DCE
                # of an output-zeroed Pallas call is not guaranteed).
                from acoustid_index_tpu.ops.pallas_lookup import tier_ranges_blocked

                Q, K = p.query_len, p.per_hash_cap
                valid_q = (
                    jnp.arange(Q, dtype=jnp.int32)[None, :] < q_lens[:, None]
                )
                if want_emit:
                    f_lo, f_cnt, f_tr, rows, covered = tier_ranges_blocked(
                        file_tier, queries, valid_q, K, emit=True
                    )
                    return (
                        f_lo, f_cnt,
                        jnp.zeros_like(f_lo), jnp.zeros_like(f_cnt),
                        f_tr, (rows, covered),
                    )
                f_lo, f_cnt, f_tr = tier_ranges_blocked(file_tier, queries, valid_q, K)
                return f_lo, f_cnt, jnp.zeros_like(f_lo), jnp.zeros_like(f_cnt), f_tr

            def stub_newest(mem_tier, cand_flat, valid_flat, mem_mentions_any=None):
                return jnp.full(cand_flat.shape, -1, jnp.int32)

            qps0 = device_qps_fori(jax, params, ft, mt, pin, BATCH)
            print(f"[{time.time()-t0:.0f}s] v0 full          : {qps0:,.0f} qps")

            sk._batch_ranges = ranges_nomem
            try:
                qps1 = device_qps_fori(jax, params, ft, mt, pin, BATCH)
                print(f"[{time.time()-t0:.0f}s] v1 no mem ranges : {qps1:,.0f} qps")
                sk._batch_newest = stub_newest
                try:
                    qps2 = device_qps_fori(jax, params, ft, mt, pin, BATCH)
                    print(f"[{time.time()-t0:.0f}s] v2 + no newest   : {qps2:,.0f} qps")
                finally:
                    sk._batch_newest = real_newest
            finally:
                sk._batch_ranges = real_ranges

            print(
                f"mem-range share: {qps1/max(qps0,1e-9):.2f}x | "
                f"newest share on top: {qps2/max(qps1,1e-9):.2f}x"
            )
        finally:
            mi.close()


if __name__ == "__main__":
    main()
