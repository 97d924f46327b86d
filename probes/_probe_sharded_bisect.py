"""Bisect the sharded-view slowdown: the UNSHARDED program runs ~17ms/batch
on the squeezed sharded view vs ~1.8ms on the plain pack_tier view (same
segment, same kernel — probes/_probe_sharded_attrib.py).  This probe builds
BOTH views from one cached 10M-doc corpus and times _batch_ranges /
_search_batch_impl on each, plus mixed-tier and field-substituted variants,
to pin the exact layout feature that costs 10x.

Variants (argv, default all):
  usingle  — unsharded impl on the pack_tier view        (~1.8ms expected)
  ssingle  — unsharded impl on the squeezed sharded view (~17ms expected)
  uranges  — stage 1 only, pack_tier view
  sranges  — stage 1 only, sharded view
  mixfile  — sharded FILE tier + pack_tier MEM tier
  mixmem   — pack_tier FILE tier + sharded MEM tier
  sflat    — sharded view re-uploaded WITHOUT the leading (1,·) dim
             (isolates the in-jit squeeze copy at full 1.9GB scale)
  slean    — squeezed sharded view with only SEARCH_TIER_FIELDS kept

Run on the TPU session:  python -u probes/_probe_sharded_bisect.py
Corpus cache: /tmp/aitpu_seg10m.npz (first run builds it, ~4min).
"""
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from acoustid_index_tpu.engine.memseg import Segment, build_segment
from acoustid_index_tpu.engine.model import BulkInsert, SegmentInfo
from acoustid_index_tpu.engine.searcher import _params_for
from acoustid_index_tpu.engine.segments import (
    FILE_SLOTS,
    MEMORY_SLOTS,
    SEARCH_TIER_FIELDS,
    Snapshot,
    pack_tier,
    tier_view_for_search,
)
from acoustid_index_tpu.ops.search_kernel import (
    SearchParams,
    _batch_ranges,
    _search_batch_impl,
)
from acoustid_index_tpu.parallel.sharded import _pack_tier_sharded

N_DOCS = 10_000_000
K = 24
BATCH = 256
CACHE = "/tmp/aitpu_seg10m.npz"


def doc_hashes(ids, n):
    j = np.arange(n, dtype=np.uint32)
    with np.errstate(over="ignore"):
        h = ids.astype(np.uint32)[:, None] * np.uint32(2654435761)
        h = h + j[None, :] * np.uint32(0x27D4EB2F) + np.uint32(12345)
        h = h ^ (h >> np.uint32(13))
        h = h * np.uint32(0x85EBCA6B)
        h = h ^ (h >> np.uint32(16))
    return h.astype(np.uint32)


def load_segment():
    if os.path.exists(CACHE):
        z = np.load(CACHE)
        return Segment(
            info=SegmentInfo(commit_id=1),
            hashes=z["hashes"],
            docids=z["docids"],
            docs_ids=z["docs_ids"],
            docs_alive=z["docs_alive"],
            min_doc_id=1,
            max_doc_id=N_DOCS,
        )
    ids = np.arange(1, N_DOCS + 1, dtype=np.uint32)
    hs = doc_hashes(ids, K)
    offsets = np.arange(0, (N_DOCS + 1) * K, K, dtype=np.uint32)
    t0 = time.time()
    seg = build_segment(
        [BulkInsert(ids=ids, hashes=hs.reshape(-1), offsets=offsets)],
        SegmentInfo(commit_id=1),
    )
    print(f"segment built {time.time()-t0:.0f}s", flush=True)
    np.savez(
        CACHE,
        hashes=seg.hashes,
        docids=seg.docids,
        docs_ids=seg.docs_ids,
        docs_alive=seg.docs_alive,
    )
    return seg


def main():
    seg = load_segment()
    params = _params_for(128)
    rng = np.random.default_rng(23)
    targets = rng.integers(1, N_DOCS + 1, BATCH, dtype=np.uint32)
    qs = np.zeros((BATCH, params.query_len), np.uint32)
    lens = np.zeros(BATCH, np.int32)
    for b, t in enumerate(targets):
        h = doc_hashes(np.array([t], np.uint32), K)[0]
        noise = rng.integers(0, 2**32, 100, dtype=np.uint32)
        q = np.unique(np.concatenate([h[:20], noise]))[: params.query_len]
        qs[b, : q.shape[0]] = q
        lens[b] = q.shape[0]
    qs_j = jnp.asarray(qs)
    lens_j = jnp.asarray(lens)
    limits = jnp.full(BATCH, 10, jnp.int32)
    minsc = jnp.full(BATCH, 6, jnp.int32)
    pcts = jnp.full(BATCH, 10, jnp.int32)

    which = sys.argv[1:] or [
        "usingle", "ssingle", "uranges", "sranges", "mixfile", "mixmem",
        "sflat", "slean",
    ]

    need_u = any(v in which for v in ("usingle", "uranges", "mixfile", "mixmem"))
    need_s = any(v in which for v in ("ssingle", "sranges", "mixfile", "mixmem",
                                      "sflat", "slean"))

    u_file = u_mem = s_file_np = s_mem_np = None
    if need_u:
        t0 = time.time()
        u_file = tier_view_for_search(pack_tier([seg], FILE_SLOTS), mentions=False)
        u_mem = tier_view_for_search(pack_tier([], MEMORY_SLOTS))
        jax.block_until_ready(u_file.get("inter", u_file.get("hashes")))
        print(f"unsharded view built {time.time()-t0:.0f}s", flush=True)
    if need_s:
        t0 = time.time()
        s_file_np = _pack_tier_sharded([seg], 1, 16)
        s_mem_np = _pack_tier_sharded([], 1, 8)
        print(f"sharded pack {time.time()-t0:.0f}s", flush=True)

    DEVICE_FIELDS = ("hashes", "docids", "inter", "block_index", "seg_start",
                     "seg_len", "mention_ids", "mention_len")

    def put_lead(d):
        # NOTE: _pack_tier_sharded now returns device fields FLAT (the fix
        # this probe motivated); docs_* stay host-side and are dropped here.
        return {
            k: jax.device_put(np.asarray(v)) for k, v in d.items()
            if k in DEVICE_FIELDS
        }

    def squeeze(t):
        # Flat layout at mesh-1: global arrays == per-shard locals.
        return {k: (v[0] if k == "mention_len" else v) for k, v in t.items()}

    def lean(t):
        return {k: v for k, v in t.items() if k in SEARCH_TIER_FIELDS}

    def slope(fn, tiers, label, reps=3, klo=2, khi=12):
        @functools.partial(jax.jit, static_argnums=(0,))
        def run_k(k, qs0, tiers):
            def body(i, acc):
                return acc + fn(qs0 + (acc & jnp.uint32(1)), tiers)

            return jax.lax.fori_loop(0, k, body, jnp.uint32(0))

        t0 = time.time()
        times = {klo: [], khi: []}
        for k in (klo, khi):
            int(jax.device_get(run_k(k, qs_j, tiers)))
            for r in range(reps):
                t1 = time.time()
                int(jax.device_get(run_k(k, qs_j + np.uint32(1 + r), tiers)))
                times[k].append(time.time() - t1)
        per = max(
            (sorted(times[khi])[reps // 2] - sorted(times[klo])[reps // 2]) / (khi - klo),
            1e-9,
        )
        print(
            f"{label}: {per*1000:7.2f} ms/batch ({BATCH/per:8.0f} qps)"
            f"  [{time.time()-t0:.0f}s incl compile]",
            flush=True,
        )

    def ranges_fn(qs0, tiers):
        f, m = tiers
        f_lo, f_cnt, m_lo, m_cnt, tr = _batch_ranges(params, f, m, qs0, lens_j)
        return jnp.sum(f_cnt.astype(jnp.uint32)) + jnp.sum(m_cnt.astype(jnp.uint32))

    def impl_fn(qs0, tiers):
        f, m = tiers
        out = _search_batch_impl(params, f, m, qs0, lens_j, limits, minsc, pcts)
        return jnp.sum(out["ids"].astype(jnp.uint32))

    if "usingle" in which:
        slope(impl_fn, (u_file, u_mem), "usingle (pack_tier both)      ")
    if "uranges" in which:
        slope(ranges_fn, (u_file, u_mem), "uranges (pack_tier both)      ")

    if need_s and any(v in which for v in ("ssingle", "sranges", "mixfile", "mixmem", "slean")):
        s_file = put_lead(s_file_np)
        s_mem = put_lead(s_mem_np)

        def wrap(fn):
            def inner(qs0, tiers):
                f, m = tiers
                return fn(qs0, (squeeze(f), squeeze(m)))

            return inner

        if "sranges" in which:
            slope(wrap(ranges_fn), (s_file, s_mem), "sranges (sharded both)        ")
        if "ssingle" in which:
            slope(wrap(impl_fn), (s_file, s_mem), "ssingle (sharded both)        ")
        if "slean" in which:
            def lean_impl(qs0, tiers):
                f, m = tiers
                return impl_fn(qs0, (lean(squeeze(f)), lean(squeeze(m))))

            slope(lean_impl, (s_file, s_mem), "slean   (sharded, lean fields)")
        if "mixfile" in which:
            def mixf(qs0, tiers):
                f, m = tiers
                return impl_fn(qs0, (squeeze(f), m))

            slope(mixf, (s_file, u_mem), "mixfile (sharded file, u mem) ")
        if "mixmem" in which:
            def mixm(qs0, tiers):
                f, m = tiers
                return impl_fn(qs0, (f, squeeze(m)))

            slope(mixm, (u_file, s_mem), "mixmem  (u file, sharded mem) ")
        del s_file, s_mem

    if "sflat" in which:
        # With the flat layout, sflat == ssingle modulo mention_len handling;
        # kept as a regression sentinel.
        flat_file = squeeze(put_lead(s_file_np))
        flat_mem = squeeze(put_lead(s_mem_np))
        slope(impl_fn, (flat_file, flat_mem), "sflat   (sharded, no lead dim)")


if __name__ == "__main__":
    main()
