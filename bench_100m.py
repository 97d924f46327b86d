"""Large-scale benchmark: 134M fingerprints (2^27) / 1.07B postings on ONE
chip — the 100M-fingerprint scale point from BASELINE.md, which the
reference can only reach on a large-RAM single node.

The term table is built analytically (no device sort): doc ids are a
bit-reversal permutation of the sorted posting positions within each of 8
hash bands, so the table is sorted by construction.  The hash layout
includes REAL collision structure (unlike round 1's unique-hash table):

  * ~12.5% of postings share their hash with a neighboring posting of a
    DIFFERENT doc (pair runs) — multi-doc runs exercise the run-length
    scoring and block-straddle paths at scale;
  * periodic 64-posting hot-hash runs (one per 2^21 positions per band,
    band-offset so no two docs share more than one hot hash) — load skew;
  * the band offsets guarantee no two docs share more than ~2 hashes, so
    exact self-retrieval still requires the full scoring pipeline.

~9.7GB of HBM.  Prints one JSON line (metric search_qps_134M_fp_1chip).
"""

import json
import time

import numpy as np

DOC_BITS = 27
N_DOCS = 1 << DOC_BITS  # 134,217,728
HASHES_PER_DOC = 8  # 8 bands of 2^29 hash space
BAND = 1 << 29
BATCH = 256
QUERY_LEN = 64
ROUNDS = 10


def bitrev27(x):
    """Bit-reverse over 27 bits (a self-inverse permutation of [0, 2^27))."""
    import jax.numpy as jnp

    v = x.astype(jnp.uint32)
    r = jnp.zeros_like(v)
    for b in range(DOC_BITS):
        r = r | (((v >> b) & 1) << (DOC_BITS - 1 - b))
    return r


def np_bitrev27(x: np.ndarray) -> np.ndarray:
    v = x.astype(np.uint64)
    r = np.zeros_like(v)
    for b in range(DOC_BITS):
        r |= ((v >> b) & 1) << (DOC_BITS - 1 - b)
    return r.astype(np.uint32)


def _f_np(p: np.ndarray, j: int) -> np.ndarray:
    """Band-j in-band hash offset for sorted position p (monotone
    nondecreasing in p, so the table stays sorted by construction):
      * hot: every 2^21 positions (band-offset), a 64-position run collapses
        to one hash;
      * pair: positions with (p + j) % 8 == 7 share the previous position's
        hash (a 2-doc run; exactly one band pairs any given p, so two docs
        never share more than one pair hash)."""
    p = p.astype(np.uint64)
    hot = ((p >> 6) + j) % (1 << 15) == 0
    pair = np.logical_and((p + j) % 8 == 7, p > 0)
    f = np.where(hot, (p & ~np.uint64(63)) * 4, np.where(pair, (p - 1) * 4, p * 4))
    return f


def doc_hashes_np(doc_ids: np.ndarray) -> np.ndarray:
    """The 8 hashes of each doc (doc ids are 1-based)."""
    p = np_bitrev27(doc_ids - 1)  # position within each band
    out = np.empty((doc_ids.shape[0], HASHES_PER_DOC), np.uint32)
    for j in range(HASHES_PER_DOC):
        out[:, j] = (np.uint64(j) * BAND + _f_np(p, j)).astype(np.uint32)
    return out


def run(jax, jnp) -> dict:
    """Build the 134M-doc corpus and measure; returns the result fields.
    Callable from bench.py (one driver-captured JSON line for both scale
    points) or standalone via main()."""

    from acoustid_index_tpu.ops.search_kernel import (
        SearchParams,
        pack_inputs_np,
        search_segments_batch,
        search_segments_batch_packed_io,
    )
    from acoustid_index_tpu.ops.pallas_lookup import BLOCK

    dev = jax.devices()[0]
    rng = np.random.default_rng(11)
    n_postings = N_DOCS * HASHES_PER_DOC  # 2^30

    t0 = time.time()

    def hash_at(k):
        # Hash of flat posting index k (band-major: k = j*N_DOCS + p).
        j = (k >> DOC_BITS).astype(jnp.uint32)
        p = k & jnp.uint32(N_DOCS - 1)
        hot = ((p >> 6) + j) % (1 << 15) == 0
        pair = jnp.logical_and((p + j) % 8 == 7, p > 0)
        f = jnp.where(
            hot,
            (p & ~jnp.uint32(63)) * 4,
            jnp.where(pair, (p - 1) * 4, p * 4),
        )
        return j * jnp.uint32(BAND) + f

    @jax.jit
    def make_tiers():
        # Sorted by construction: band-major, position-ascending (the f_j
        # offsets are monotone nondecreasing in p — see _f_np).  The
        # interleaved array is computed as a PURE ELEMENTWISE function of
        # its own index: position i holds hashes[k] when the low 11 bits
        # select the hash half of a 1024-pair block, docids[k] otherwise,
        # with k = blk*1024 + (i & 1023) — so XLA fuses iota -> select ->
        # store into one streaming write and the build peak is exactly the
        # 8.6GB output buffer.  The earlier stack/broadcast/reshape form
        # materialized hashes (4.3GB) + docids (4.3GB) + the 8.6GB output
        # = 17GB peak: an HBM OOM that surfaced only at the next fetch.
        i = jnp.arange(2 * n_postings, dtype=jnp.uint32)
        blk = i >> 11
        w = i & jnp.uint32(2047)
        k = blk * jnp.uint32(BLOCK) + (w & jnp.uint32(BLOCK - 1))
        p = k & jnp.uint32(N_DOCS - 1)
        inter = jnp.where(w < BLOCK, hash_at(k), bitrev27(p) + 1)
        block_index = hash_at(
            jnp.arange(n_postings // BLOCK, dtype=jnp.uint32) * jnp.uint32(BLOCK)
        )
        return inter, block_index

    inter, block_index = make_tiers()
    inter.block_until_ready()

    file_tier = {
        "inter": inter,
        "block_index": block_index,
        "seg_start": jnp.zeros(1, jnp.int32),
        "seg_len": jnp.zeros(1, jnp.int32).at[0].set(n_postings),
        # Mention table: every doc alive in the single segment = ids 1..N
        # sorted, ordinal 0 — representable analytically too.
        "mention_ids": jnp.arange(1, N_DOCS + 1, dtype=jnp.uint32),
        "mention_len": jnp.int32(N_DOCS),
    }
    mem_tier = {
        "hashes": jnp.full(1024, 0xFFFFFFFF, jnp.uint32),
        "docids": jnp.full(1024, 0xFFFFFFFF, jnp.uint32),
        "block_index": jnp.full(1, 0xFFFFFFFF, jnp.uint32),
        "seg_start": jnp.zeros(1, jnp.int32),
        "seg_len": jnp.zeros(1, jnp.int32),
        "mention_ids": jnp.full(1024, 0xFFFFFFFF, jnp.uint32),
        "mention_len": jnp.int32(0),
    }
    build_s = time.time() - t0

    try:
        return _measure(jax, jnp, dev, rng, file_tier, mem_tier, build_s)
    finally:
        # Deterministic HBM release for the later bench phases: an exception
        # raised here (e.g. a tunnel-dropped compile) keeps this frame alive
        # through the caller's handler via the traceback chain, so the
        # ~9.1GB corpus would survive bench.py's gc.collect() and OOM the
        # 10M phase at RUNTIME (observed r5: "kernel table built" then
        # RESOURCE_EXHAUSTED at the first search).
        for v in list(file_tier.values()) + list(mem_tier.values()):
            if hasattr(v, "delete"):
                try:
                    v.delete()
                except Exception:
                    pass


def _measure(jax, jnp, dev, rng, file_tier, mem_tier, build_s) -> dict:
    n_postings = N_DOCS * HASHES_PER_DOC
    from acoustid_index_tpu.ops.search_kernel import (
        SearchParams,
        pack_inputs_np,
        search_segments_batch,
        search_segments_batch_packed_io,
    )

    params = SearchParams(query_len=QUERY_LEN, postings_budget=512, candidate_cap=256)

    def make_queries():
        targets = rng.integers(1, N_DOCS + 1, BATCH, dtype=np.uint32)
        qs = np.zeros((BATCH, QUERY_LEN), np.uint32)
        lens = np.zeros(BATCH, np.int32)
        hs = doc_hashes_np(targets)
        for b in range(BATCH):
            noise = rng.integers(0, 2**32, 4, dtype=np.uint32)
            q = np.unique(np.concatenate([hs[b, :6], noise]))  # 6 of 8 + noise
            qs[b, : q.shape[0]] = q
            lens[b] = q.shape[0]
        return targets, qs, lens

    limits = np.full(BATCH, 10, np.int32)
    min_scores = np.full(BATCH, 2, np.int32)
    pcts = np.full(BATCH, 10, np.int32)

    targets, qs, lens = make_queries()
    t0 = time.time()
    out = jax.device_get(search_segments_batch(params, file_tier, mem_tier, qs, lens, limits, min_scores, pcts))
    compile_s = time.time() - t0
    hit_rate = float(np.mean(out["ids"][:, 0] == targets))
    top_scores = out["scores"][:, 0]
    assert hit_rate == 1.0, f"self-retrieval hit rate {hit_rate}"
    assert np.all(top_scores == 6), top_scores[:5]

    def packed_call(qs, lens):
        pin = pack_inputs_np(qs, lens, limits, min_scores, pcts)
        return search_segments_batch_packed_io(params, file_tier, mem_tier, pin)

    jax.block_until_ready(packed_call(qs, lens))
    lat = []
    for _ in range(ROUNDS):
        targets, qs, lens = make_queries()
        t0 = time.time()
        out = packed_call(qs, lens)
        jax.block_until_ready(out)
        lat.append(time.time() - t0)
    lat_ms = np.array(lat) * 1000.0

    batches = [make_queries() for _ in range(ROUNDS)]
    t_start = time.time()
    pending = []
    for _, qs, lens in batches:
        pending.append(packed_call(qs, lens))
        if len(pending) > 3:
            np.asarray(jax.device_get(pending.pop(0)))
    for h in pending:
        np.asarray(jax.device_get(h))
    wall = time.time() - t_start
    tunneled_qps = ROUNDS * BATCH / wall

    # Device capability, measured tunnel-immune (see bench.device_qps_fori).
    from bench import device_qps_fori

    _, qs, lens = make_queries()
    qps = device_qps_fori(
        jax, params, file_tier, mem_tier, pack_inputs_np(qs, lens, limits, min_scores, pcts), BATCH
    )

    return {
        "metric": "search_qps_134M_fp_1chip",
        "value": round(qps, 1),
        "unit": "qps",
        "vs_baseline": None,
        "value_note": "device-resident inputs (attached-chip number); tunneled_pipeline_qps includes the dev tunnel's per-transfer round trips",
        "tunneled_pipeline_qps": round(tunneled_qps, 1),
        "batch": BATCH,
        "p50_batch_ms": round(float(np.percentile(lat_ms, 50)), 2),
        "p99_batch_ms": round(float(np.percentile(lat_ms, 99)), 2),
        "per_query_p50_ms": round(float(np.percentile(lat_ms, 50)) / BATCH, 3),
        "build_s": round(build_s, 1),
        "compile_s": round(compile_s, 1),
        "self_retrieval_hit_rate": hit_rate,
        "n_docs": N_DOCS,
        "n_postings": n_postings,
        "hbm_gb": round((n_postings * 8 + N_DOCS * 8) / 2**30, 1),
        "device": str(dev),
        "note": "synthetic corpus with collision structure: 25% of postings in multi-doc hash runs, periodic 64-posting hot hashes, 134M-entry mention table",
    }


def main():
    import jax
    import jax.numpy as jnp

    print(json.dumps(run(jax, jnp)))


if __name__ == "__main__":
    main()
