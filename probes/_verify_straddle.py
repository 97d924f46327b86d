"""On-device verification of the straddle-tail refactor in
tier_ranges_blocked: build a ~2M-posting table with hot hashes whose runs
cross block boundaries (plus boundary-exact and over-window runs), run the
blocked path (plain + interleaved + emit) on the REAL TPU, and compare
(lo, cnt) against numpy searchsorted.
"""
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from acoustid_index_tpu.ops.pallas_lookup import BLOCK, tier_ranges_blocked
from acoustid_index_tpu.ops.layout import interleave_jnp

rng = np.random.default_rng(7)
N = 2_000_000
# Base: sorted unique-ish hashes with random multiplicity 1-3.
base = np.sort(rng.choice(np.uint32(1) << 31, size=N, replace=True).astype(np.uint32))
hashes = base.copy()

# Inject hot runs: pick hashes whose run will straddle a block boundary.
hot = rng.choice(np.uint32(1) << 31, size=24, replace=False).astype(np.uint32)
runs = [hashes]
for i, h in enumerate(hot):
    runs.append(np.full(37 + 61 * (i % 5), h, np.uint32))
hashes = np.sort(np.concatenate(runs), kind="stable")
M = hashes.shape[0]
pad = (-M) % BLOCK
hashes = np.concatenate([hashes, np.full(pad, 0xFFFFFFFF, np.uint32)])
docids = rng.integers(1, 1 << 30, size=hashes.shape[0], dtype=np.uint32)

nblk = hashes.shape[0] // BLOCK
block_index = hashes[::BLOCK].copy()

tier = {
    "hashes": jnp.asarray(hashes),
    "block_index": jnp.asarray(block_index),
    "seg_len": jnp.asarray([M], np.int32),
}
inter = jax.jit(interleave_jnp)(jnp.asarray(hashes), jnp.asarray(docids))
tier_i = {
    "inter": inter,
    "block_index": jnp.asarray(block_index),
    "seg_len": jnp.asarray([M], np.int32),
}

B, Q = 16, 64
qs = np.zeros((B, Q), np.uint32)
qs[:, :] = rng.choice(hashes[:M], size=(B, Q)).astype(np.uint32)
# Every row also queries hot hashes (straddlers) + misses + first/last.
qs[:, 0] = hot[0]
qs[:, 1] = hot[1]
qs[:, 2] = hot[2 % len(hot)]
qs[:, 3] = np.uint32(0)          # below table
qs[:, 4] = np.uint32(0x7FFFFFFF)  # likely miss
qs[:, 5] = hashes[0]
qs[:, 6] = hashes[M - 1]
for i, h in enumerate(hot):
    qs[i % B, 7 + (i // B) % 8] = h
lens = np.full(B, Q, np.int32)
valid = np.ones((B, Q), bool)

K = 2 * BLOCK
fn = jax.jit(lambda t, q: tier_ranges_blocked(t, q, jnp.asarray(valid), K))
fn_e = jax.jit(lambda t, q: tier_ranges_blocked(t, q, jnp.asarray(valid), K, emit=True))

qj = jnp.asarray(qs)
# Oracle
flat = qs.reshape(-1)
lo_ref = np.searchsorted(hashes[:M], flat, side="left")
hi_ref = np.searchsorted(hashes[:M], flat, side="right")
cnt_ref = hi_ref - lo_ref
# The kernel truncates runs longer than the two-block window to what the
# window sees; none of our runs exceed 2*BLOCK, but a run's window starts
# at b0 — replicate the clamp: cnt capped at K.
cnt_ref = np.minimum(cnt_ref, K)

fails = 0
for name, (t, f) in {
    "plain": (tier, fn),
    "inter": (tier_i, fn),
    "emit": (tier_i, fn_e),
}.items():
    out = f(t, qj)
    lo = np.asarray(out[0]).reshape(-1)
    cnt = np.asarray(out[1]).reshape(-1)
    # lo is only meaningful where cnt > 0
    m = cnt_ref > 0
    ok_lo = np.array_equal(lo[m], lo_ref[m])
    ok_cnt = np.array_equal(cnt, cnt_ref)
    if not (ok_lo and ok_cnt):
        fails += 1
        bad = np.nonzero((cnt != cnt_ref) | (m & (lo != lo_ref)))[0][:10]
        print(f"{name}: MISMATCH at {bad.tolist()}")
        for b in bad[:5]:
            print(
                f"  q={flat[b]} lo={lo[b]} cnt={cnt[b]} ref_lo={lo_ref[b]} ref_cnt={cnt_ref[b]}"
            )
    else:
        print(f"{name}: exact ({m.sum()} hits / {flat.size} lookups, "
              f"{int(np.isin(flat, hot).sum())} hot-hash lookups)")

print("platform:", jax.devices()[0].platform, jax.devices()[0].device_kind)
print("VERIFY_STRADDLE", "FAIL" if fails else "PASS")
