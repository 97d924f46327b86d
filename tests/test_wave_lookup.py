"""Wave (explicit-DMA) lookup kernels vs the grid-pipelined kernels and a
numpy oracle.

Production dispatch uses the wave kernels only on real TPUs
(pallas_lookup._use_wave), so the regular suite exercises the grid path;
this module calls the wave kernels DIRECTLY so their numerics are pinned
on the CPU backend (interpret mode) too — including boundary-straddling
runs, dead (block-0) lookups, and the short-stream prologue/drain edges.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from acoustid_index_tpu.ops.layout import interleave_np
from acoustid_index_tpu.ops.pallas_lookup import (
    BLOCK,
    ROWS,
    block_lookup,
    block_lookup_emit_wave,
    block_lookup_wave,
)


def _table(nblk: int, seed: int = 3):
    rng = np.random.default_rng(seed)
    hashes = np.sort(rng.integers(0, 1 << 20, nblk * BLOCK, dtype=np.uint32))
    # force an equal run across the block 1/2 boundary
    if nblk >= 3:
        hashes[BLOCK * 2 - 7 : BLOCK * 2 + 9] = hashes[BLOCK * 2]
        hashes = np.sort(hashes)
    docids = rng.integers(1, 1 << 30, nblk * BLOCK, dtype=np.uint32)
    return hashes, docids


def _oracle(hashes, blk, q):
    lt = np.empty(len(q), np.int32)
    eq = np.empty(len(q), np.int32)
    for j in range(len(q)):
        b = hashes[blk[j] * BLOCK : (blk[j] + 1) * BLOCK]
        lt[j] = (b < q[j]).sum()
        eq[j] = (b == q[j]).sum()
    return lt, eq


@pytest.mark.parametrize("L", [64, 192, 1024])
def test_wave_matches_grid_and_oracle(L):
    nblk = 8
    hashes, _ = _table(nblk)
    rng = np.random.default_rng(11)
    blk = rng.integers(0, nblk, L).astype(np.int32)
    blk[: L // 8] = 0  # dead-lookup shape: constant block-0 runs
    q = rng.choice(hashes, L).astype(np.uint32)
    q[1::7] = rng.integers(0, 1 << 20, len(q[1::7]), dtype=np.uint32)  # misses

    hj = jnp.asarray(hashes)
    bj, qj = jnp.asarray(blk), jnp.asarray(q)
    lo_w, eq_w = jax.jit(block_lookup_wave)(hj, bj, qj)
    lo_g, eq_g = jax.jit(block_lookup)(hj, bj, qj)
    np.testing.assert_array_equal(np.asarray(lo_w), np.asarray(lo_g))
    np.testing.assert_array_equal(np.asarray(eq_w), np.asarray(eq_g))

    lt_ref, eq_ref = _oracle(hashes, blk, q)
    np.testing.assert_array_equal(np.asarray(lo_w), blk * BLOCK + lt_ref)
    np.testing.assert_array_equal(np.asarray(eq_w), eq_ref)


def test_emit_wave_rows_and_counts():
    nblk = 6
    hashes, docids = _table(nblk, seed=9)
    inter = interleave_np(hashes, docids)
    L = 256
    rng = np.random.default_rng(4)
    blk = rng.integers(0, nblk, L).astype(np.int32)
    q = rng.choice(hashes, L).astype(np.uint32)

    lo, cnt, rows = jax.jit(block_lookup_emit_wave)(
        jnp.asarray(inter), jnp.asarray(blk), jnp.asarray(q)
    )
    lt_ref, eq_ref = _oracle(hashes, blk, q)
    np.testing.assert_array_equal(np.asarray(lo), blk * BLOCK + lt_ref)
    np.testing.assert_array_equal(np.asarray(cnt), eq_ref)

    dd = docids.reshape(nblk, ROWS, 128)
    r = np.minimum(lt_ref >> 7, ROWS - 1)
    r2 = np.minimum(r + 1, ROWS - 1)
    rows_np = np.asarray(rows)
    np.testing.assert_array_equal(rows_np[:, 0, :], dd[blk, r])
    np.testing.assert_array_equal(rows_np[:, 1, :], dd[blk, r2])


def test_wave_interleaved_stride():
    nblk = 5
    hashes, docids = _table(nblk, seed=21)
    inter = interleave_np(hashes, docids)
    L = 128
    rng = np.random.default_rng(8)
    blk = rng.integers(0, nblk, L).astype(np.int32)
    q = rng.choice(hashes, L).astype(np.uint32)

    lo, eq = jax.jit(lambda t, b, qq: block_lookup_wave(t, b, qq, stride=2))(
        jnp.asarray(inter), jnp.asarray(blk), jnp.asarray(q)
    )
    lt_ref, eq_ref = _oracle(hashes, blk, q)
    np.testing.assert_array_equal(np.asarray(lo), blk * BLOCK + lt_ref)
    np.testing.assert_array_equal(np.asarray(eq), eq_ref)
