"""Fori-slope of the FULL serving program: P_MID on/off x B=256/512.

P_MID is read from the environment at trace time, so one process can sweep
both settings by mutating os.environ between (re-)jitted runs.
"""
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
from probes._probe_phase3 import file_tier, mem_tier  # reuse the 10M table
from acoustid_index_tpu.ops import search_kernel as sk

params = _params_for(128)
Q = params.query_len


def run_full(batch, pmid, label):
    os.environ["AITPU_P_MID"] = str(pmid)
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
        int(jax.device_get(runK(K, file_tier, mem_tier, pj)))
        t0 = time.time()
        int(jax.device_get(runK(K, file_tier, mem_tier, pj)))
        times[K] = time.time() - t0
    slope = (times[12] - times[2]) / 10
    print(f"{label}: {slope*1000:.2f} ms/batch ({batch/slope:.0f} qps)", flush=True)


if __name__ == "__main__":
    # report per-query posting totals once (mid-path engagement signal)
    rngq = np.random.default_rng(17)
    _, qs, lens = make_queries(rngq, 256, Q, N_DOCS)
    f_lo, f_cnt, m_lo, m_cnt, _ = jax.jit(
        functools.partial(sk._batch_ranges, params)
    )(file_tier, mem_tier, jnp.asarray(qs), jnp.asarray(lens))
    totals = np.asarray(f_cnt.sum(axis=1) + m_cnt.sum(axis=1))
    print(f"totals mean={totals.mean():.0f} max={totals.max()}", flush=True)

    for batch in (256, 512):
        for pmid in (0, 160):
            run_full(batch, pmid, f"b{batch}_pmid{pmid}")
    print("PMIDDONE", flush=True)
