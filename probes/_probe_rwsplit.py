"""Split the rw-state 1.8x overhead (see _probe_rwstate.py) between its two
structural costs, measured by stubbing one at a time and re-tracing:

  - newest-off: _batch_newest stubbed to "no mentions" (kills the
    supersession lookup + its cond, keeps the mem-branch gather + the
    widened scoring matrix);
  - remainder: whatever the stub does not recover is the mem-branch
    gather + matrix width.

Also prints which mention-lookup path the real state takes (blocked /
dense / binary search) — the dense gate is cap * candidates <= 2^28 and
the rw state sits near it.
"""

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
from acoustid_index_tpu.ops.search_kernel import pack_inputs_np

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
            params = _params_for(128)
            _, qs, lens = make_queries(rng, BATCH, params.query_len, N_DOCS)
            pin = pack_inputs_np(
                qs,
                lens,
                np.full(BATCH, 40, np.int32),
                np.full(BATCH, 6, np.int32),
                np.full(BATCH, 10, np.int32),
            )
            ft = tier_view_for_search(snap.file_view, mentions=False)
            mt = tier_view_for_search(snap.mem_view)
            mcap = mt["mention_ids"].shape[0]
            n_cand = BATCH * (2 * params.query_len + sk.F_DIRECT + sk.P_MEM_DIRECT)
            from acoustid_index_tpu.ops.pallas_lookup import BLOCK

            if mcap % BLOCK == 0 and mcap > 4096:
                path = "blocked"
            elif mcap * n_cand <= (1 << 28):
                path = "dense"
            else:
                path = "BINARY-SEARCH (slow)"
            print(
                f"[{time.time()-t0:.0f}s] state S={snap.num_segments()}; mention cap={mcap}, "
                f"candidates={n_cand}, cap*cand={mcap*n_cand:,} vs 2^28={1<<28:,} -> {path}"
            )

            qps_full = device_qps_fori(jax, params, ft, mt, pin, BATCH)
            print(f"[{time.time()-t0:.0f}s] full rw state : {qps_full:,.0f} qps")

            real_newest = sk._batch_newest

            def stub_newest(mem_tier, cand_flat, valid_flat, mem_mentions_any=None):
                return jnp.full(cand_flat.shape, -1, jnp.int32)

            sk._batch_newest = stub_newest
            jax.clear_caches()
            try:
                qps_nonew = device_qps_fori(jax, params, ft, mt, pin, BATCH)
            finally:
                sk._batch_newest = real_newest
                jax.clear_caches()
            print(f"[{time.time()-t0:.0f}s] newest stubbed: {qps_nonew:,.0f} qps")
            print(
                f"newest share: {qps_nonew/max(qps_full,1e-9):.2f}x of full; "
                f"remainder (mem branch + width) = compare vs the ~1.0x all-file state"
            )
        finally:
            mi.close()


if __name__ == "__main__":
    main()
