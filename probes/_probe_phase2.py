"""Forced-execution phase attribution of the serving program."""
import time
import numpy as np
import jax
import jax.numpy as jnp
from bench import BATCH, HASHES_PER_DOC, N_DOCS, make_queries
from acoustid_index_tpu.engine.searcher import _params_for
from acoustid_index_tpu.ops.build import sort_postings
from acoustid_index_tpu.ops.search_kernel import (
    pack_inputs_np, search_segments_batch_packed_io, _batch_ranges,
)
import functools

@jax.jit
def make_table():
    ids = jnp.arange(1, N_DOCS + 1, dtype=jnp.uint32)
    j = jnp.arange(HASHES_PER_DOC, dtype=jnp.uint32)
    h = ids[:, None] * jnp.uint32(2654435761)
    h = h + j[None, :] * jnp.uint32(0x27D4EB2F) + jnp.uint32(12345)
    h = h ^ (h >> jnp.uint32(13)); h = h * jnp.uint32(0x85EBCA6B); h = h ^ (h >> jnp.uint32(16))
    hashes = h.reshape(-1)
    docids = jnp.broadcast_to(ids[:, None], (N_DOCS, HASHES_PER_DOC)).reshape(-1)
    return sort_postings(hashes, docids, hashes.shape[0])

h_sorted, d_sorted = make_table(); h_sorted.block_until_ready()
n_postings = N_DOCS * HASHES_PER_DOC
cap = 1
while cap < n_postings: cap *= 2
def pad(a, size, fill):
    out = jnp.full((size,), fill, a.dtype); return out.at[: a.shape[0]].set(a)
hp = pad(h_sorted, cap, jnp.uint32(0xFFFFFFFF))
file_tier = {"hashes": hp, "docids": pad(d_sorted, cap, jnp.uint32(0xFFFFFFFF)),
    "block_index": hp[::1024], "seg_start": jnp.zeros(1, jnp.int32),
    "seg_len": jnp.zeros(1, jnp.int32).at[0].set(n_postings),
    "mention_ids": pad(jnp.arange(1, N_DOCS + 1, dtype=jnp.uint32), 1 << 24, jnp.uint32(0xFFFFFFFF)),
    "mention_ord": jnp.zeros(1 << 24, jnp.int32), "mention_len": jnp.int32(N_DOCS)}
mem_tier = {"hashes": jnp.full(1024, 0xFFFFFFFF, jnp.uint32), "docids": jnp.full(1024, 0xFFFFFFFF, jnp.uint32),
    "block_index": jnp.full(1, 0xFFFFFFFF, jnp.uint32), "seg_start": jnp.zeros(1, jnp.int32),
    "seg_len": jnp.zeros(1, jnp.int32), "mention_ids": jnp.full(1024, 0xFFFFFFFF, jnp.uint32),
    "mention_ord": jnp.full(1024, -1, jnp.int32), "mention_len": jnp.int32(0)}

params = _params_for(128)
rngq = np.random.default_rng(17)
limits = np.full(BATCH, 10, np.int32); min_scores = np.full(BATCH, 6, np.int32); pcts = np.full(BATCH, 10, np.int32)

@functools.partial(jax.jit, static_argnums=0)
def ranges_only(p, ft, mt, qs, lens):
    f_lo, f_cnt, m_lo, m_cnt, trunc = _batch_ranges(p, ft, mt, qs, lens)
    return (jnp.sum(f_lo.astype(jnp.uint32)) + jnp.sum(f_cnt.astype(jnp.uint32))
            + jnp.sum(m_lo.astype(jnp.uint32)) + jnp.sum(m_cnt.astype(jnp.uint32)))

@jax.jit
def fold_scalar(acc, x):
    return acc + x.astype(jnp.uint32)

@jax.jit
def fold_arr(acc, x):
    return acc + jnp.sum(x.astype(jnp.uint32))

data = [make_queries(rngq, BATCH, params.query_len, N_DOCS) for _ in range(10)]

# ranges only
args = [(jnp.asarray(qs), jnp.asarray(lens)) for _, qs, lens in data]
r = ranges_only(params, file_tier, mem_tier, *args[0]); r.block_until_ready()
t0 = time.time(); acc = jnp.uint32(0)
for a in args: acc = fold_scalar(acc, ranges_only(params, file_tier, mem_tier, *a))
int(jax.device_get(acc)); dt = (time.time() - t0) / 10
print(f"ranges_only: {dt*1000:.2f}ms", flush=True)

# full serving program
pins = [jax.device_put(jnp.asarray(pack_inputs_np(qs, lens, limits, min_scores, pcts))) for _, qs, lens in data]
out = search_segments_batch_packed_io(params, file_tier, mem_tier, pins[0]); out.block_until_ready()
t0 = time.time(); acc = jnp.uint32(0)
for pin in pins: acc = fold_arr(acc, search_segments_batch_packed_io(params, file_tier, mem_tier, pin))
int(jax.device_get(acc)); dt = (time.time() - t0) / 10
print(f"full serving: {dt*1000:.2f}ms", flush=True)

# Ground truth: chain each execution's input on the previous output.
@jax.jit
def perturb(pin, out):
    return pin + (jnp.sum(out) & jnp.uint32(1))

pin = pins[0]
out = search_segments_batch_packed_io(params, file_tier, mem_tier, pin)
out.block_until_ready()
t0 = time.time()
cur = pin
for i in range(10):
    out = search_segments_batch_packed_io(params, file_tier, mem_tier, cur)
    cur = perturb(pins[(i + 1) % len(pins)], out)
np.asarray(jax.device_get(out))
dt = (time.time() - t0) / 10
print(f"full serving (chained): {dt*1000:.2f}ms", flush=True)

# And the same chain for ranges_only
t0 = time.time()
acc = jnp.uint32(0)
cur = pins[0]
for i in range(10):
    s = ranges_only(params, file_tier, mem_tier, cur[:, :128], cur[:, 128].astype(jnp.int32))
    cur = perturb(pins[(i + 1) % len(pins)], s.reshape(1, 1))
int(jax.device_get(s))
dt = (time.time() - t0) / 10
print(f"ranges_only (chained): {dt*1000:.2f}ms", flush=True)

# Decisive: K iterations inside ONE jitted fori_loop (zero host involvement).
from acoustid_index_tpu.ops.search_kernel import _search_batch_impl
import functools as ft

@ft.partial(jax.jit, static_argnums=(0, 1))
def runK(K, p, ft_, mt, pin):
    Q = p.query_len
    def body(i, acc):
        pin2 = pin.at[:, :Q].set(pin[:, :Q] + (acc & jnp.uint32(1)))
        out = _search_batch_impl(
            p, ft_, mt, pin2[:, :Q], pin2[:, Q].astype(jnp.int32),
            pin2[:, Q + 1].astype(jnp.int32), pin2[:, Q + 2].astype(jnp.int32),
            pin2[:, Q + 3].astype(jnp.int32),
        )
        return acc + jnp.sum(out["ids"].astype(jnp.uint32))
    return jax.lax.fori_loop(0, K, body, jnp.uint32(0))

for K in (2, 6, 12):
    r = runK(K, params, file_tier, mem_tier, pins[0])
    int(jax.device_get(r))  # warm/compile
    t0 = time.time()
    r = runK(K, params, file_tier, mem_tier, pins[1])
    int(jax.device_get(r))
    print(f"K={K}: total {(time.time()-t0)*1000:.1f}ms", flush=True)
