"""Compile-memory regression check for the 134M serving program.

The round-5 compile OOM ("16.01G of 15.75G free" — fixed in c0bb83b by the
bitcast-safe interleaved gather) showed the 134M program sits near the XLA
compiler's memory ceiling; any cascade restructure must re-prove the
compile BEFORE the bench's multi-hour corpus build depends on it.  This
probe compiles the full batch program at the bench_100m shapes with
ShapeDtypeStruct args only (no 17 GB corpus, no constants — also dodges
the axon remote-compile size limit) and prints the compile wall time.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from acoustid_index_tpu.engine.searcher import _params_for
from acoustid_index_tpu.ops.layout import BLOCK
from acoustid_index_tpu.ops.search_kernel import _search_batch_impl


def main():
    n_docs = 134_217_728
    n_postings = n_docs * 8
    params = _params_for(128)
    B, Q = 256, params.query_len

    u32 = lambda *s: jax.ShapeDtypeStruct(s, jnp.uint32)
    i32 = lambda *s: jax.ShapeDtypeStruct(s, jnp.int32)
    file_tier = {
        "inter": u32(2 * n_postings),
        "block_index": u32(n_postings // BLOCK),
        "seg_start": i32(1),
        "seg_len": i32(1),
        "mention_ids": u32(n_docs),
        "mention_len": jax.ShapeDtypeStruct((), jnp.int32),
    }
    mem_tier = {
        "hashes": u32(1024),
        "docids": u32(1024),
        "block_index": u32(1),
        "seg_start": i32(1),
        "seg_len": i32(1),
        "mention_ids": u32(1024),
        "mention_len": jax.ShapeDtypeStruct((), jnp.int32),
    }
    fn = jax.jit(
        lambda ft, mt, q, ql, lim, ms, pct: _search_batch_impl(
            params, ft, mt, q, ql, lim, ms, pct
        )
    )
    t0 = time.time()
    lowered = fn.lower(
        file_tier, mem_tier, u32(B, Q), i32(B), i32(B), i32(B), i32(B)
    )
    t1 = time.time()
    compiled = lowered.compile()
    t2 = time.time()
    print(
        f"134M compile OK on {jax.devices()[0].platform}: "
        f"lower {t1-t0:.1f}s, compile {t2-t1:.1f}s"
    )
    mem = compiled.memory_analysis()
    if mem is not None:
        print(
            f"device memory: args {getattr(mem, 'argument_size_in_bytes', 0)/2**30:.2f}G "
            f"temp {getattr(mem, 'temp_size_in_bytes', 0)/2**30:.2f}G "
            f"output {getattr(mem, 'output_size_in_bytes', 0)/2**30:.2f}G"
        )


if __name__ == "__main__":
    main()
