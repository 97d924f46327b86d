"""Variance check of the FULL serving program's fori slope on the 10M
interleaved table: multiple K pairs, repeated, via bench.device_qps_fori's
exact code path.  Decides whether the r3attrib 'full' readings (1.66ms,
0.58ms) are real or noise."""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
import bench
from bench import N_DOCS, make_queries, device_qps_fori
from acoustid_index_tpu.engine.searcher import _params_for
from probes._probe_phase3 import file_tier, mem_tier
from acoustid_index_tpu.ops.layout import interleave_jnp

params = _params_for(128)
Q = params.query_len
BATCH = 256

inter_tier = {k: v for k, v in file_tier.items() if k not in ("hashes", "docids")}
inter_tier["inter"] = jax.jit(interleave_jnp)(file_tier["hashes"], file_tier["docids"])
inter_tier["inter"].block_until_ready()

rngq = np.random.default_rng(17)
_, qs, lens = make_queries(rngq, BATCH, Q, N_DOCS)
pin = np.zeros((BATCH, Q + 4), np.uint32)
pin[:, :Q] = qs
pin[:, Q] = lens
pin[:, Q + 1] = 10
pin[:, Q + 2] = 6
pin[:, Q + 3] = 10

if __name__ == "__main__":
    for rep in range(3):
        qps = device_qps_fori(jax, params, inter_tier, mem_tier, pin, BATCH)
        print(f"rep{rep}: {qps:.0f} qps ({BATCH/qps*1000:.2f} ms/batch)", flush=True)
    print("FULLVARDONE", flush=True)
