"""Device-only timing of the REAL serving program (packed IO, runtime
conds): device-resident inputs, K dispatches, one sync."""
import time

import numpy as np
import jax
import jax.numpy as jnp

from bench import BATCH, HASHES_PER_DOC, N_DOCS, make_queries
from acoustid_index_tpu.engine.searcher import _params_for
from acoustid_index_tpu.ops.build import sort_postings
from acoustid_index_tpu.ops.search_kernel import (
    pack_inputs_np,
    search_segments_batch_packed_io,
)


@jax.jit
def make_table():
    ids = jnp.arange(1, N_DOCS + 1, dtype=jnp.uint32)
    j = jnp.arange(HASHES_PER_DOC, dtype=jnp.uint32)
    h = ids[:, None] * jnp.uint32(2654435761)
    h = h + j[None, :] * jnp.uint32(0x27D4EB2F) + jnp.uint32(12345)
    h = h ^ (h >> jnp.uint32(13))
    h = h * jnp.uint32(0x85EBCA6B)
    h = h ^ (h >> jnp.uint32(16))
    hashes = h.reshape(-1)
    docids = jnp.broadcast_to(ids[:, None], (N_DOCS, HASHES_PER_DOC)).reshape(-1)
    return sort_postings(hashes, docids, hashes.shape[0])


h_sorted, d_sorted = make_table()
h_sorted.block_until_ready()
n_postings = N_DOCS * HASHES_PER_DOC
cap = 1
while cap < n_postings:
    cap *= 2


def pad(a, size, fill):
    out = jnp.full((size,), fill, a.dtype)
    return out.at[: a.shape[0]].set(a)


hashes_padded = pad(h_sorted, cap, jnp.uint32(0xFFFFFFFF))
file_tier = {
    "hashes": hashes_padded,
    "docids": pad(d_sorted, cap, jnp.uint32(0xFFFFFFFF)),
    "block_index": hashes_padded[::1024],
    "seg_start": jnp.zeros(1, jnp.int32),
    "seg_len": jnp.zeros(1, jnp.int32).at[0].set(n_postings),
    "mention_ids": pad(jnp.arange(1, N_DOCS + 1, dtype=jnp.uint32), 1 << 24, jnp.uint32(0xFFFFFFFF)),
    "mention_ord": jnp.zeros(1 << 24, jnp.int32),
    "mention_len": jnp.int32(N_DOCS),
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
}

params = _params_for(128)
rngq = np.random.default_rng(17)
limits = np.full(BATCH, 10, np.int32)
min_scores = np.full(BATCH, 6, np.int32)
pcts = np.full(BATCH, 10, np.int32)
targets, qs, lens = make_queries(rngq, BATCH, params.query_len, N_DOCS)
pin = jax.device_put(jnp.asarray(pack_inputs_np(qs, lens, limits, min_scores, pcts)))

out = search_segments_batch_packed_io(params, file_tier, mem_tier, pin)
out.block_until_ready()
K = 12
t0 = time.time()
for _ in range(K):
    out = search_segments_batch_packed_io(params, file_tier, mem_tier, pin)
out.block_until_ready()
dt = (time.time() - t0) / K
print(f"serving program device-only: {dt*1000:.2f}ms/batch  {BATCH/dt:.0f} qps", flush=True)
