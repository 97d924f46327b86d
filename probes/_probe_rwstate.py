"""Attribute the rw (write-heavy) device-slope overhead: BENCH r5 measured
e2e_rw_device_overhead_x = 2.75x at S=12 (file tier + 11 tiny memory
segments) vs the same corpus merged to S=1, while _probe_msphase's S=8
file-only state costs only 1.46x.  This probe rebuilds a bench-like rw
state through the real engine and measures the fori-slope across
controlled states to find where the 2.75x lives:

  a) full rw state: file tier + N mem segments (the bench's measured state)
  b) same postings, all packed as ONE file tier at the same slot count
     (isolates "mem tier present" from "segment count")
  c) merged S=1 (the bench's control)

plus the direct-path gating stats for state (a): max fallback remainder
(F_DIRECT gate) and max mem-tier postings (P_MEM_DIRECT gate) — if the
gate fails, the cascade falls back to the ~2x base path and that is the
whole story.
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
from acoustid_index_tpu.ops.search_kernel import pack_inputs_np

N_DOCS = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
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
            print(f"[{time.time()-t0:.0f}s] file tier built: {N_DOCS} docs")

            # Writer's closed window, as in bench.e2e_read_write: 200-doc
            # updates; the second half re-inserts earlier window ids so
            # later memory segments supersede earlier ones.
            base = N_DOCS + 1
            for k in range(N_MEM_SEGS):
                off = (k * 200) % 1200
                ids = np.arange(base + off, base + off + 200, dtype=np.uint32)
                hs = doc_hashes(ids, HASHES_PER_DOC)
                idx.update(
                    [Insert(id=int(i), hashes=h.tolist()) for i, h in zip(ids, hs)]
                )
            snap = idx.acquire_reader()
            print(
                f"[{time.time()-t0:.0f}s] rw state: S={snap.num_segments()} "
                f"(file={len(list(snap.file))}, mem={len(list(snap.memory))})"
            )

            params = _params_for(128)
            _, qs, lens = make_queries(rng, BATCH, params.query_len, N_DOCS)
            pin = pack_inputs_np(
                qs,
                lens,
                np.full(BATCH, 40, np.int32),
                np.full(BATCH, 6, np.int32),
                np.full(BATCH, 10, np.int32),
            )

            ft_a = tier_view_for_search(snap.file_view, mentions=False)
            mt_a = tier_view_for_search(snap.mem_view)

            # Direct-path gating stats for state (a).
            @functools.partial(jax.jit, static_argnums=0)
            def gate_stats(p, file_tier, mem_tier, queries, q_lens):
                f_lo, f_cnt, m_lo, m_cnt, trunc, emit_info = sk._batch_ranges(
                    p, file_tier, mem_tier, queries, q_lens, want_emit=True
                )
                rows, covered = emit_info
                e_direct = 2 if p.query_len <= 128 else 1
                ov_tot = jnp.sum(
                    jnp.maximum(f_cnt - jnp.where(covered, e_direct, 0), 0), axis=1
                )
                m_tot = jnp.sum(m_cnt, axis=1)
                return (
                    jnp.max(ov_tot),
                    jnp.max(m_tot),
                    jnp.max(jnp.sum(f_cnt + m_cnt, axis=1)),
                )

            ov, mt, tot = jax.device_get(
                gate_stats(
                    params,
                    ft_a,
                    mt_a,
                    jnp.asarray(qs),
                    jnp.asarray(lens.astype(np.int32)),
                )
            )
            print(
                f"gate stats (a): max_ov_tot={ov} (F_DIRECT={sk.F_DIRECT}) "
                f"max_m_tot={mt} (P_MEM_DIRECT={sk.P_MEM_DIRECT}) max_total={tot} "
                f"-> direct_ok={ov <= sk.F_DIRECT and mt <= sk.P_MEM_DIRECT}"
            )

            qps_a = device_qps_fori(jax, params, ft_a, mt_a, pin, BATCH)
            print(f"[{time.time()-t0:.0f}s] (a) full rw state     : {qps_a:,.0f} qps")

            # (b) same postings, one all-file comb at the same slot count.
            all_segs = list(snap.file) + list(snap.memory)
            ft_b = idx.searcher.pack_file_tier(all_segs)
            mt_b = idx.searcher.pack_mem_tier([])
            qps_b = device_qps_fori(
                jax,
                params,
                tier_view_for_search(ft_b, mentions=False),
                tier_view_for_search(mt_b),
                pin,
                BATCH,
            )
            print(f"[{time.time()-t0:.0f}s] (b) all-file, S={len(all_segs)} : {qps_b:,.0f} qps")

            # (c) merged S=1 (the bench control).
            from acoustid_index_tpu.engine.device_merge import merge_segments_auto

            one = merge_segments_auto(all_segs, snap)
            ft_c = idx.searcher.pack_file_tier([one])
            qps_c = device_qps_fori(
                jax,
                params,
                tier_view_for_search(ft_c, mentions=False),
                tier_view_for_search(mt_b),
                pin,
                BATCH,
            )
            print(f"[{time.time()-t0:.0f}s] (c) merged S=1        : {qps_c:,.0f} qps")

            print(
                f"overhead: full {qps_c / max(qps_a,1e-9):.2f}x | "
                f"all-file {qps_c / max(qps_b,1e-9):.2f}x | "
                f"mem-tier presence costs {qps_b / max(qps_a,1e-9):.2f}x on top"
            )
        finally:
            mi.close()


if __name__ == "__main__":
    main()
