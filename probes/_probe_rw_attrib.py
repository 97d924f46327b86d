"""Stage attribution of the LIVE write-heavy (rw) serving state on the
real device (fori-slope, tunnel-immune).

Replicates the bench e2e_rw final snapshot's structure: a 2M-doc file tier
(24 hashes/doc, 48M postings) split across NF slots + a memory tier of NM
recent-write slots packed at the sticky high-water caps the serving
searcher pins during the write window.  Phases are cumulative:

  ranges   -> file (emitting blocked) + mem (resident) range phase
  gather   -> + per-query plan+gather at P_SMALL, use_mem=True
  score    -> + matrix scoring
  newest   -> + _batch_newest over the flattened candidate stream
  full     -> the real _search_batch_impl program

Controls: full_nomem (same file tier, empty mem tier) and full_s1 (the
whole corpus merged into one slot, empty mem) — the read-only states.
"""

import functools
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from acoustid_index_tpu.engine.memseg import Segment
from acoustid_index_tpu.engine.model import SegmentInfo
from acoustid_index_tpu.engine.searcher import Searcher, _params_for
from acoustid_index_tpu.engine.segments import (
    FILE_SLOTS,
    MEMORY_SLOTS,
    pack_tier,
    tier_view_for_search,
)
from acoustid_index_tpu.ops import search_kernel as sk

B = 256
N_DOCS = 2_000_000
H_PER_DOC = 24
NF = 4  # file slots: one big + recent checkpoints
NM = 6  # memory slots (recent write batches)
MEM_DOCS_PER_SLOT = 1000
# Sticky HWM caps the serving searcher converges to during the write window
MEM_MIN_CAPS = (196608, 8192, 8192)


def doc_hashes(ids: np.ndarray, n: int) -> np.ndarray:
    j = np.arange(n, dtype=np.uint32)
    with np.errstate(over="ignore"):
        h = ids.astype(np.uint32)[:, None] * np.uint32(2654435761)
        h = h + j[None, :] * np.uint32(0x27D4EB2F) + np.uint32(12345)
        h = h ^ (h >> np.uint32(13))
        h = h * np.uint32(0x85EBCA6B)
        h = h ^ (h >> np.uint32(16))
    return h.astype(np.uint32)


def make_segment(id_lo, id_hi, commit_id):
    ids = np.arange(id_lo, id_hi, dtype=np.uint32)
    h = doc_hashes(ids, H_PER_DOC).reshape(-1)
    d = np.broadcast_to(ids[:, None], (ids.shape[0], H_PER_DOC)).reshape(-1).copy()
    key = (h.astype(np.uint64) << np.uint64(32)) | d.astype(np.uint64)
    order = np.argsort(key, kind="stable")
    return Segment(
        info=SegmentInfo(commit_id=commit_id),
        hashes=np.ascontiguousarray(h[order]),
        docids=np.ascontiguousarray(d[order]),
        docs_ids=ids,
        docs_alive=np.ones(ids.shape[0], bool),
        min_doc_id=int(ids[0]),
        max_doc_id=int(ids[-1]),
    )


def build_views():
    t0 = time.time()
    big = N_DOCS - (NF - 1) * 100_000
    bounds = [1, big + 1] + [big + 1 + k * 100_000 for k in range(1, NF)]
    file_segs = [
        make_segment(bounds[k], bounds[k + 1], commit_id=k + 1) for k in range(NF)
    ]
    mem_lo = N_DOCS + 1
    mem_segs = [
        make_segment(
            mem_lo + k * MEM_DOCS_PER_SLOT,
            mem_lo + (k + 1) * MEM_DOCS_PER_SLOT,
            commit_id=NF + 1 + k,
        )
        for k in range(NM)
    ]
    print(f"segments built {time.time()-t0:.0f}s", flush=True)

    t0 = time.time()
    file_view = pack_tier(file_segs, FILE_SLOTS)
    mem_view = pack_tier(mem_segs, MEMORY_SLOTS, min_caps=MEM_MIN_CAPS, min_slots=8)
    empty_seg = Segment(
        info=SegmentInfo(commit_id=99),
        hashes=np.empty(0, np.uint32),
        docids=np.empty(0, np.uint32),
        docs_ids=np.empty(0, np.uint32),
        docs_alive=np.empty(0, bool),
        min_doc_id=0,
        max_doc_id=0,
    )
    mem_empty = pack_tier([empty_seg], MEMORY_SLOTS)
    print(f"packed {time.time()-t0:.0f}s", flush=True)

    t0 = time.time()
    merged = make_segment(1, N_DOCS + 1, commit_id=1)
    file_s1 = pack_tier([merged], FILE_SLOTS)
    print(f"s1 packed {time.time()-t0:.0f}s", flush=True)
    return (
        tier_view_for_search(file_view),
        tier_view_for_search(mem_view),
        tier_view_for_search(mem_empty),
        tier_view_for_search(file_s1),
    )


def make_pin(rng, params):
    # bench-like queries: 20 target-doc hashes + noise; every 8th query
    # targets a memory-tier (recently written) doc.
    Q = params.query_len
    pin = np.zeros((B, Q + 4), np.uint32)
    for b in range(B):
        if b % 8 == 7:
            t = N_DOCS + 1 + rng.integers(0, NM * MEM_DOCS_PER_SLOT)
        else:
            t = rng.integers(1, N_DOCS + 1)
        q = np.unique(
            np.concatenate(
                [
                    doc_hashes(np.array([t], np.uint32), H_PER_DOC)[0][:20],
                    rng.integers(0, 2**32, 100, dtype=np.uint32),
                ]
            )
        )[:Q]
        pin[b, : q.shape[0]] = q
        pin[b, Q] = q.shape[0]
    pin[:, Q + 1] = 40
    pin[:, Q + 2] = 6
    pin[:, Q + 3] = 10
    return pin


def run_phases(tag, params, file_tier, mem_tier, pin, phases):
    p = params
    Q = p.query_len

    def make(phase):
        def one(ft, mt, pin2):
            queries = pin2[:, :Q]
            q_lens = pin2[:, Q].astype(jnp.int32)
            limits = pin2[:, Q + 1].astype(jnp.int32)
            min_scores = pin2[:, Q + 2].astype(jnp.int32)
            pcts = pin2[:, Q + 3].astype(jnp.int32)
            if phase == "full":
                out = sk._search_batch_impl(p, ft, mt, queries, q_lens, limits, min_scores, pcts)
                return jnp.sum(out["ids"].astype(jnp.uint32))
            want_emit = "inter" in ft and p.query_len <= 256
            if want_emit:
                f_lo, f_cnt, m_lo, m_cnt, trunc, _emit = sk._batch_ranges(
                    p, ft, mt, queries, q_lens, want_emit=True
                )
            else:
                f_lo, f_cnt, m_lo, m_cnt, trunc = sk._batch_ranges(p, ft, mt, queries, q_lens)
            if phase == "ranges":
                return (
                    jnp.sum(f_lo.astype(jnp.uint32))
                    + jnp.sum(f_cnt.astype(jnp.uint32))
                    + jnp.sum(m_cnt.astype(jnp.uint32))
                    + trunc.astype(jnp.uint32)
                )
            import dataclasses

            p_small = dataclasses.replace(p, postings_budget=sk.P_SMALL)

            def score_one(f_lo1, f_cnt1, m_lo1, m_cnt1, min_score):
                d, o, inv, total, over = sk._plan_and_gather(
                    p_small, ft, mt, f_lo1, f_cnt1, m_lo1, m_cnt1, use_mem=True
                )
                if phase == "gather":
                    return jnp.sum(d.astype(jnp.uint32)) + jnp.sum(o.astype(jnp.uint32)), d, d
                win, score, cand = sk._score_matrix(p_small, d, o, inv, min_score)
                if phase == "score":
                    return jnp.sum(score.astype(jnp.uint32)) + jnp.sum(d.astype(jnp.uint32)), d, cand
                return jnp.sum(score.astype(jnp.uint32)), d, cand

            accs, d, cand = jax.vmap(score_one)(f_lo, f_cnt, m_lo, m_cnt, min_scores)
            if phase in ("gather", "score"):
                return jnp.sum(accs)
            newest = sk._batch_newest(mt, d.reshape(-1), cand.reshape(-1))
            return jnp.sum(accs) + jnp.sum(newest.astype(jnp.uint32))

        @functools.partial(jax.jit, static_argnums=(0,))
        def runK(K, ft, mt, pin0):
            def body(i, acc):
                pin2 = pin0.at[:, :Q].set(pin0[:, :Q] + (acc & jnp.uint32(1)))
                return acc + one(ft, mt, pin2)

            return jax.lax.fori_loop(0, K, body, jnp.uint32(0))

        return runK

    KLO, KHI, REPS = 4, 64, 3
    for phase in phases:
        runK = make(phase)
        times = {KLO: [], KHI: []}
        try:
            for K in (KLO, KHI):
                int(jax.device_get(runK(K, file_tier, mem_tier, jnp.asarray(pin))))
                for r in range(REPS):
                    pj_t = jax.device_put(jnp.asarray(pin + np.uint32(1 + r)))
                    t0 = time.time()
                    int(jax.device_get(runK(K, file_tier, mem_tier, pj_t)))
                    times[K].append(time.time() - t0)
            slope = (sorted(times[KHI])[REPS // 2] - sorted(times[KLO])[REPS // 2]) / (KHI - KLO)
            print(
                f"{tag} {phase}: {slope*1000:.2f} ms/batch ({B/slope:.0f} qps)",
                flush=True,
            )
        except Exception as exc:  # noqa: BLE001 — keep attributing
            print(f"{tag} {phase}: FAILED {type(exc).__name__}: {exc}"[:300], flush=True)


def main():
    rng = np.random.default_rng(42)
    params = _params_for(128)
    file_view, mem_view, mem_empty, file_s1 = build_views()
    pin = make_pin(rng, params)
    run_phases("rw(S=4+6)", params, file_view, mem_view, pin, ("ranges", "gather", "score", "newest", "full"))
    run_phases("nomem(S=4+0)", params, file_view, mem_empty, pin, ("full",))
    run_phases("steady(S=1)", params, file_s1, mem_empty, pin, ("full",))


if __name__ == "__main__":
    main()
