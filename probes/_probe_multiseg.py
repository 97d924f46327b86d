"""Does the blocked-lookup serving program COMPILE and run on real TPU with
a multi-segment file tier?  The scalar-prefetch arrays scale with B*S*Q
(SMEM is ~1MB); S=8 slots at B=256, Q=128 pushes 2MB unless chunked."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import time

import numpy as np

import jax
import jax.numpy as jnp

from acoustid_index_tpu.engine.searcher import _params_for
from acoustid_index_tpu.ops.build import sort_postings
from acoustid_index_tpu.ops.pallas_lookup import BLOCK
from acoustid_index_tpu.ops.search_kernel import (
    pack_inputs_np,
    search_segments_batch_packed_io,
)

B = 256
SEGS = 8
PER_SEG_DOCS = 60_000
H_PER_DOC = 8


def main():
    rng = np.random.default_rng(3)
    seg_runs = []
    base_id = 1
    for s in range(SEGS):
        ids = np.arange(base_id, base_id + PER_SEG_DOCS, dtype=np.uint32)
        base_id += PER_SEG_DOCS
        h = (ids[:, None] * np.uint32(2654435761)
             + np.arange(H_PER_DOC, dtype=np.uint32)[None, :] * np.uint32(0x27D4EB2F)
             + np.uint32(s * 7919)).astype(np.uint32)
        hs = h.reshape(-1)
        ds = np.broadcast_to(ids[:, None], (PER_SEG_DOCS, H_PER_DOC)).reshape(-1)
        order = np.argsort(hs, kind="stable")
        seg_runs.append((hs[order], ds[order], ids))

    # BLOCK-aligned packing, like pack_tier.
    total = sum(-(-r[0].shape[0] // BLOCK) * BLOCK for r in seg_runs)
    cap = 1024
    while cap < total:
        cap *= 2
    hashes = np.full(cap, 0xFFFFFFFF, np.uint32)
    docids = np.full(cap, 0xFFFFFFFF, np.uint32)
    seg_start = np.zeros(SEGS, np.int32)
    seg_len = np.zeros(SEGS, np.int32)
    pos = 0
    for s, (hs, ds, _ids) in enumerate(seg_runs):
        seg_start[s] = pos
        seg_len[s] = hs.shape[0]
        pos += hs.shape[0]
    # Comb layout: one merged sorted run + per-posting ordinal column.
    all_h = np.concatenate([r[0] for r in seg_runs])
    all_d = np.concatenate([r[1] for r in seg_runs])
    all_o = np.concatenate(
        [np.full(r[0].shape[0], s, np.int32) for s, r in enumerate(seg_runs)]
    )
    order = np.argsort(all_h, kind="stable")
    all_h, all_d, all_o = all_h[order], all_d[order], all_o[order]
    hashes[: all_h.shape[0]] = all_h
    docids[: all_d.shape[0]] = all_d
    ord_arr = np.zeros(hashes.shape[0], np.int32)
    ord_arr[: all_o.shape[0]] = all_o

    all_ids = np.sort(np.concatenate([r[2] for r in seg_runs]))
    mcap = 1024
    while mcap < all_ids.shape[0]:
        mcap *= 2
    m_ids = np.full(mcap, 0xFFFFFFFF, np.uint32)
    m_ids[: all_ids.shape[0]] = all_ids
    m_ord = np.zeros(mcap, np.int32)
    # each doc lives in exactly one segment; ord = its segment
    for s, (_h, _d, ids) in enumerate(seg_runs):
        m_ord[np.searchsorted(all_ids, ids)] = s

    file_tier = {
        "hashes": jnp.asarray(hashes),
        "docids": jnp.asarray(docids),
        "ord": jnp.asarray(ord_arr),
        "block_index": jnp.asarray(hashes[::BLOCK]),
        "seg_start": jnp.asarray(seg_start),
        "seg_len": jnp.asarray(seg_len),
        "mention_ids": jnp.asarray(m_ids),
        "mention_ord": jnp.asarray(m_ord),
        "mention_len": jnp.int32(all_ids.shape[0]),
        "docs_len": jnp.asarray(np.full(SEGS, PER_SEG_DOCS, np.int32)),
    }
    mem_tier = {
        "hashes": jnp.full(1024, 0xFFFFFFFF, jnp.uint32),
        "docids": jnp.full(1024, 0xFFFFFFFF, jnp.uint32),
        "block_index": jnp.full(1, 0xFFFFFFFF, jnp.uint32),
        "seg_start": jnp.zeros(1, jnp.int32),
        "seg_len": jnp.zeros(1, jnp.int32),
        "mention_ids": jnp.full(1024, 0xFFFFFFFF, jnp.uint32),
        "mention_ord": jnp.full(1024, -1, jnp.int32),
        "mention_len": jnp.int32(0),
        "docs_len": jnp.zeros(1, jnp.int32),
    }

    params = _params_for(128)
    # targets spread across segments
    targets = np.array([7 + s * PER_SEG_DOCS for s in range(SEGS)] * (B // SEGS), np.uint32)
    qs = np.zeros((B, 128), np.uint32)
    lens = np.zeros(B, np.int32)
    for b, t in enumerate(targets):
        s = (t - 1) // PER_SEG_DOCS
        h = (np.uint32(t) * np.uint32(2654435761)
             + np.arange(H_PER_DOC, dtype=np.uint32) * np.uint32(0x27D4EB2F)
             + np.uint32(s * 7919)).astype(np.uint32)
        q = np.unique(h)
        qs[b, : q.shape[0]] = q
        lens[b] = q.shape[0]
    pin = pack_inputs_np(
        qs, lens, np.full(B, 10, np.int32), np.full(B, 2, np.int32), np.full(B, 10, np.int32)
    )

    t0 = time.time()
    out = np.asarray(jax.device_get(
        search_segments_batch_packed_io(params, file_tier, mem_tier, jnp.asarray(pin))
    ))
    print(f"compiled+ran in {time.time()-t0:.0f}s", flush=True)
    ids0 = out[:, 0]
    hit = float(np.mean(ids0 == targets))
    print(f"S={SEGS} multi-segment blocked path: hit rate {hit}", flush=True)
    assert hit == 1.0, hit

    from bench import device_qps_fori

    qps = device_qps_fori(jax, params, file_tier, mem_tier, pin, B)
    print(f"S={SEGS} fori-slope: {B/qps*1000:.2f} ms/batch ({qps:.0f} qps)", flush=True)


if __name__ == "__main__":
    main()
