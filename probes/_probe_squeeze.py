"""Does the sharded view's leading (1, …) shard dim cost 10x?

The sharded attribution probe showed the UNSHARDED program running at
~17ms/batch on the squeezed sharded view vs 1.8ms on the plain packed view
(same corpus, same kernel).  Hypothesis: TPU tiles a (1, N) u32 array as
(8, 128) with the size-1 sublane dim padded 8x, and the in-jit squeeze
(reshape (1,N)->(N,)) materializes a full copy on every execution — so the
blocked-lookup Pallas kernel pays ~2GB of layout copies per batch.

Variants (run on the TPU session: python -u probes/_probe_squeeze.py):
  flat — tier arrays device_put as 1D (the pack_tier layout), ranges slope
  lead — same arrays with a leading (1, …) dim, squeezed INSIDE the jit
Memory stats printed after each device_put expose any 8x physical padding.
"""
import functools
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from acoustid_index_tpu.ops.layout import interleave_np
from acoustid_index_tpu.ops.pallas_lookup import BLOCK
from acoustid_index_tpu.ops.search_kernel import _batch_ranges, SearchParams
from acoustid_index_tpu.engine.searcher import _params_for

N = 64 * 1024 * 1024  # postings
B, QL = 256, 128


def mem_gb():
    try:
        s = jax.devices()[0].memory_stats()
        return s["bytes_in_use"] / 1e9
    except Exception:
        return -1.0


def main():
    rng = np.random.default_rng(3)
    hashes = np.sort(rng.integers(0, 2**32, N, dtype=np.uint32))
    docids = rng.integers(1, 2**31, N, dtype=np.uint32)
    inter = interleave_np(hashes, docids)
    blk = np.ascontiguousarray(hashes[::BLOCK])
    params = _params_for(QL)

    qs = np.zeros((B, QL), np.uint32)
    lens = np.full(B, 20, np.int32)
    qs[:, :20] = hashes[rng.integers(0, N, (B, 20))]
    qs_j = jnp.asarray(qs)
    lens_j = jnp.asarray(lens)

    S = 16
    seg_len = np.zeros(S, np.int32)
    seg_len[0] = N
    mem_tier_np = {
        "hashes": np.full(1024, 0xFFFFFFFF, np.uint32),
        "docids": np.full(1024, 0xFFFFFFFF, np.uint32),
        "seg_start": np.zeros(S, np.int32),
        "seg_len": np.zeros(S, np.int32),
        "mention_ids": np.full(1024, 0xFFFFFFFF, np.uint32),
        "mention_len": np.int32(0),
    }

    def slope(fn, tiers, label, reps=3, klo=2, khi=12):
        @functools.partial(jax.jit, static_argnums=())
        def run_k_factory():
            pass

        @functools.partial(jax.jit, static_argnums=(0,))
        def run_k(k, qs0, tiers):
            def body(i, acc):
                return acc + fn(qs0 + (acc & jnp.uint32(1)), tiers)

            return jax.lax.fori_loop(0, k, body, jnp.uint32(0))

        times = {klo: [], khi: []}
        for k in (klo, khi):
            int(jax.device_get(run_k(k, qs_j, tiers)))
            for r in range(reps):
                t0 = time.time()
                int(jax.device_get(run_k(k, qs_j + np.uint32(1 + r), tiers)))
                times[k].append(time.time() - t0)
        per = max(
            (sorted(times[khi])[reps // 2] - sorted(times[klo])[reps // 2]) / (khi - klo),
            1e-9,
        )
        print(f"{label}: {per*1000:7.2f} ms/batch", flush=True)

    which = sys.argv[1:] or ["flat", "lead"]

    if "flat" in which:
        t0 = time.time()
        file_flat = {
            "inter": jax.device_put(inter),
            "block_index": jax.device_put(blk),
            "seg_start": jax.device_put(np.zeros(S, np.int32)),
            "seg_len": jax.device_put(seg_len),
            "mention_ids": jax.device_put(np.full(1024, 0xFFFFFFFF, np.uint32)),
            "mention_len": jnp.int32(0),
        }
        mem_flat = {k: jax.device_put(v) for k, v in mem_tier_np.items()}
        jax.block_until_ready(file_flat["inter"])
        print(f"flat upload {time.time()-t0:.0f}s, mem {mem_gb():.2f} GB", flush=True)

        def ranges_flat(qs0, tiers):
            f, m = tiers
            f_lo, f_cnt, m_lo, m_cnt, tr = _batch_ranges(params, f, m, qs0, lens_j)
            return jnp.sum(f_cnt.astype(jnp.uint32))

        slope(ranges_flat, (file_flat, mem_flat), "ranges flat 1D   ")
        del file_flat, mem_flat

    if "lead" in which:
        t0 = time.time()
        file_lead = {
            "inter": jax.device_put(inter[None, :]),
            "block_index": jax.device_put(blk[None, :]),
            "seg_start": jax.device_put(np.zeros((1, S), np.int32)),
            "seg_len": jax.device_put(seg_len[None, :]),
            "mention_ids": jax.device_put(np.full((1, 1024), 0xFFFFFFFF, np.uint32)),
            "mention_len": jax.device_put(np.zeros(1, np.int32)),
        }
        mem_lead = {
            k: jax.device_put(np.asarray(v)[None, ...]) for k, v in mem_tier_np.items()
        }
        jax.block_until_ready(file_lead["inter"])
        print(f"lead upload {time.time()-t0:.0f}s, mem {mem_gb():.2f} GB", flush=True)

        def ranges_lead(qs0, tiers):
            f, m = tiers
            f = {k: v[0] for k, v in f.items()}
            m = {k: v[0] for k, v in m.items()}
            f_lo, f_cnt, m_lo, m_cnt, tr = _batch_ranges(params, f, m, qs0, lens_j)
            return jnp.sum(f_cnt.astype(jnp.uint32))

        slope(ranges_lead, (file_lead, mem_lead), "ranges lead (1,N)")


if __name__ == "__main__":
    main()
