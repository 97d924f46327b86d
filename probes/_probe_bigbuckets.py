"""Do the large-query (1024-hash bucket) and legacy 512-out programs
compile and run natively on TPU?  Legacy-protocol sessions can send
many-hash queries and max_results=500; those shapes never run in the
benches."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import time

import numpy as np

import jax
import jax.numpy as jnp

from acoustid_index_tpu.engine.searcher import _params_for
from acoustid_index_tpu.ops.build import sort_postings
from acoustid_index_tpu.ops.search_kernel import (
    pack_inputs_np,
    search_segments_batch_packed_io,
)


def main():
    N = 1_000_000
    ids = jnp.arange(1, N + 1, dtype=jnp.uint32)
    h = (
        ids[:, None] * jnp.uint32(2654435761)
        + jnp.arange(8, dtype=jnp.uint32)[None, :] * jnp.uint32(0x27D4EB2F)
    ) ^ jnp.uint32(99)
    hs, ds = sort_postings(h.reshape(-1), jnp.broadcast_to(ids[:, None], (N, 8)).reshape(-1), N * 8)
    cap = 1 << 23
    pad = lambda a: jnp.full((cap,), 0xFFFFFFFF, a.dtype).at[: a.shape[0]].set(a)
    hp = pad(hs)
    ft = {
        "hashes": hp, "docids": pad(ds), "block_index": hp[::1024],
        "seg_start": jnp.zeros(1, jnp.int32),
        "seg_len": jnp.zeros(1, jnp.int32).at[0].set(N * 8),
        "mention_ids": pad(ids), "mention_ord": jnp.zeros(cap, jnp.int32),
        "mention_len": jnp.int32(N),
    }
    mt = {
        "hashes": jnp.full(1024, 0xFFFFFFFF, jnp.uint32),
        "docids": jnp.full(1024, 0xFFFFFFFF, jnp.uint32),
        "block_index": jnp.full(1, 0xFFFFFFFF, jnp.uint32),
        "seg_start": jnp.zeros(1, jnp.int32), "seg_len": jnp.zeros(1, jnp.int32),
        "mention_ids": jnp.full(1024, 0xFFFFFFFF, jnp.uint32),
        "mention_ord": jnp.full(1024, -1, jnp.int32), "mention_len": jnp.int32(0),
    }
    h_np = np.asarray(h)

    for q_bucket, out_bucket, B in ((1024, 128, 16), (128, 512, 16)):
        params = _params_for(q_bucket, out_bucket)
        qs = np.zeros((B, q_bucket), np.uint32)
        lens = np.zeros(B, np.int32)
        rng = np.random.default_rng(1)
        targets = rng.integers(1, N + 1, B).astype(np.uint32)
        for b, t in enumerate(targets):
            noise = rng.integers(0, 2**32, q_bucket - 16, dtype=np.uint32)
            q = np.unique(np.concatenate([h_np[t - 1], noise]))[: q_bucket]
            qs[b, : q.shape[0]] = q
            lens[b] = q.shape[0]
        pin = pack_inputs_np(
            qs, lens,
            np.full(B, min(500, out_bucket), np.int32),
            np.full(B, 4, np.int32), np.full(B, 0, np.int32),
        )
        t0 = time.time()
        out = np.asarray(jax.device_get(
            search_segments_batch_packed_io(params, ft, mt, jnp.asarray(pin))
        ))
        hit = float(np.mean(out[:, 0] == targets))
        print(
            f"q_bucket={q_bucket} out={out_bucket}: compiled+ran {time.time()-t0:.0f}s, hit {hit}",
            flush=True,
        )
        assert hit == 1.0, hit


if __name__ == "__main__":
    main()
