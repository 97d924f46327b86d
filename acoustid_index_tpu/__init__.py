"""acoustid_index_tpu — a TPU-native audio-fingerprint search engine.

A from-scratch re-design of acoustid/acoustid-index (fpindex): an inverted
index mapping u32 hashes to u32 fingerprint ids, searched by hash-set
intersection and scored by intersection size, with WAL durability, segment
checkpoints, tiered merges, an HTTP API, and changelog replication.

Unlike the reference (a Zig CPU binary built around SIMD streamvbyte block
postings, cf. /root/reference/src/block.zig), the compute path here is
JAX/XLA/Pallas: every index snapshot is a set of immutable, HBM-resident
sorted (hash, docid) term tables, and search/ingest/merge run as jitted
device kernels that scale across a TPU mesh by hash-range sharding.
"""

__version__ = "0.1.0"

import os as _os

# Persistent XLA compilation cache: the engine compiles a small, fixed set of
# programs (one per shape bucket); caching them across processes makes server
# startup and test subprocesses fast.  Set before the first jax import wins.
_os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", _os.path.expanduser("~/.cache/acoustid_index_tpu/xla")
)
_os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")
_os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
