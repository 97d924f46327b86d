"""Fori-slope of the FULL serving program: plain (plan+gather) vs
interleaved+direct (gather-free candidates from emitted landing rows) on
the 10M-doc single-segment steady state — the workload of VERDICT r2's
"raise the device ceiling" item.

Also cross-checks result parity between the two layouts on one batch.
"""
import functools
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from bench import N_DOCS, make_queries
from acoustid_index_tpu.engine.searcher import _params_for
from probes._probe_phase3 import file_tier, mem_tier  # 10M plain tier
from acoustid_index_tpu.ops import search_kernel as sk
from acoustid_index_tpu.ops.layout import interleave_jnp

params = _params_for(128)
Q = params.query_len

inter_tier = {k: v for k, v in file_tier.items() if k not in ("hashes", "docids")}
inter_tier["inter"] = jax.jit(interleave_jnp)(file_tier["hashes"], file_tier["docids"])
inter_tier["inter"].block_until_ready()


def run_full(ft, batch, label):
    rngq = np.random.default_rng(17)
    _, qs, lens = make_queries(rngq, batch, Q, N_DOCS)
    pin = np.zeros((batch, Q + 4), np.uint32)
    pin[:, :Q] = qs
    pin[:, Q] = lens
    pin[:, Q + 1] = 10
    pin[:, Q + 2] = 6
    pin[:, Q + 3] = 10

    @functools.partial(jax.jit, static_argnums=(0,))
    def runK(K, ft, mt, pin0):
        def body(i, acc):
            pin2 = pin0.at[:, :Q].set(pin0[:, :Q] + (acc & jnp.uint32(1)))
            out = sk._search_batch_impl(
                params,
                ft,
                mt,
                pin2[:, :Q],
                pin2[:, Q].astype(jnp.int32),
                pin2[:, Q + 1].astype(jnp.int32),
                pin2[:, Q + 2].astype(jnp.int32),
                pin2[:, Q + 3].astype(jnp.int32),
            )
            return acc + jnp.sum(out["ids"].astype(jnp.uint32))

        return jax.lax.fori_loop(0, K, body, jnp.uint32(0))

    pj = jax.device_put(jnp.asarray(pin))
    times = {}
    for K in (2, 12):
        int(jax.device_get(runK(K, ft, mem_tier, pj)))
        t0 = time.time()
        int(jax.device_get(runK(K, ft, mem_tier, pj)))
        times[K] = time.time() - t0
    slope = (times[12] - times[2]) / 10
    print(f"{label}: {slope*1000:.2f} ms/batch ({batch/slope:.0f} qps)", flush=True)


if __name__ == "__main__":
    # Parity: one batch, both layouts, identical outputs.
    rngq = np.random.default_rng(17)
    _, qs, lens = make_queries(rngq, 256, Q, N_DOCS)
    run = jax.jit(functools.partial(sk.search_segments_batch, params))
    args = (
        jnp.asarray(qs),
        jnp.asarray(lens),
        jnp.full(256, 10, jnp.int32),
        jnp.full(256, 6, jnp.int32),
        jnp.full(256, 10, jnp.int32),
    )
    a = jax.device_get(run(file_tier, mem_tier, *args))
    b = jax.device_get(run(inter_tier, mem_tier, *args))
    ok = (a["ids"] == b["ids"]).all() and (a["scores"] == b["scores"]).all()
    print(f"parity: {'OK' if ok else 'MISMATCH'}", flush=True)
    if not ok:
        bad = np.nonzero((a["ids"] != b["ids"]).any(axis=1))[0]
        print("first bad rows:", bad[:5], flush=True)
        for r in bad[:2]:
            print("plain:", a["ids"][r][:12], a["scores"][r][:12], flush=True)
            print("inter:", b["ids"][r][:12], b["scores"][r][:12], flush=True)

    for batch in (256, 512):
        run_full(file_tier, batch, f"b{batch}_plain")
        run_full(inter_tier, batch, f"b{batch}_direct")
    print("DIRECTDONE", flush=True)
