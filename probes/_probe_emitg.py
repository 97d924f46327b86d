"""Sweep the emitting landing kernel's grid width G on the 10M interleaved
table: per-lookup cost is per-operand-per-step bookkeeping, so a larger G
amortizes per-step fixed cost — until operand-spec bloat or VMEM pressure
bites.  Dedup-proof fori-slope timing."""
import functools
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from bench import N_DOCS, make_queries
from acoustid_index_tpu.engine.searcher import _params_for
from probes._probe_phase3 import file_tier, mem_tier
from acoustid_index_tpu.ops import pallas_lookup as pla
from acoustid_index_tpu.ops.layout import interleave_jnp

params = _params_for(128)
Q = params.query_len
BATCH = 256

inter = jax.jit(interleave_jnp)(file_tier["hashes"], file_tier["docids"])
inter.block_until_ready()

rngq = np.random.default_rng(17)
_, qs, lens = make_queries(rngq, BATCH, Q, N_DOCS)
pin = np.zeros((BATCH, Q), np.uint32)
pin[:, :Q] = qs


def runner():
    @functools.partial(jax.jit, static_argnums=(0,))
    def runK(K, it, pin0):
        def body(i, acc):
            qf = (pin0 + (acc & jnp.uint32(1))).reshape(-1)
            nblk = it.shape[0] // 2048
            blk = (qf % jnp.uint32(nblk)).astype(jnp.int32)
            lo, cnt, rows = pla.block_lookup_emit(it, blk, qf)
            return acc + jnp.sum(lo.astype(jnp.uint32)) + jnp.sum(rows[:, 0, 0])

        return jax.lax.fori_loop(0, K, body, jnp.uint32(0))

    return runK


if __name__ == "__main__":
    pj = jax.device_put(jnp.asarray(pin))
    pj2 = jax.device_put(jnp.asarray(pin + np.uint32(1)))
    for g in ("64", "128", "256", "512"):
        os.environ["AITPU_EMIT_G"] = g
        runK = runner()
        times = {}
        for K in (2, 12):
            int(jax.device_get(runK(K, inter, pj)))
            t0 = time.time()
            int(jax.device_get(runK(K, inter, pj2)))
            times[K] = time.time() - t0
        slope = (times[12] - times[2]) / 10
        ns = slope / (BATCH * Q) * 1e9
        print(f"G={g}: {slope*1000:.2f} ms ({ns:.1f} ns/lookup)", flush=True)
    print("EMITGDONE", flush=True)
