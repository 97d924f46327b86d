"""JAX runtime configuration: persistent compilation cache.

The engine compiles a small fixed set of programs (one per shape bucket);
caching them across processes makes server startup and subprocess tests
fast.  Applied on first import of any ops module.
"""

from __future__ import annotations

import os

_done = False


def setup() -> None:
    global _done
    if _done:
        return
    _done = True
    import jax

    # Env vars are read at jax import, which a site hook may have done before
    # us with its own platform list; apply overrides through the config (valid
    # until the first backend initialization).
    force = os.environ.get("AITPU_JAX_PLATFORMS")
    if force:
        try:
            jax.config.update("jax_platforms", force)
        except Exception:
            pass
    host_devices = os.environ.get("AITPU_HOST_DEVICE_COUNT")
    if host_devices:
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + f" --xla_force_host_platform_device_count={host_devices}"
            ).strip()

    cache_dir = os.environ.get(
        "AITPU_XLA_CACHE_DIR",
        os.path.expanduser("~/.cache/acoustid_index_tpu/xla"),
    )
    try:
        # Key the cache by host CPU features: XLA's cache key covers the
        # *target* config but CPU AOT results compiled on a machine with a
        # different feature set still load ("could lead to SIGILL",
        # cpu_aot_loader.cc) when the directory is shared across
        # heterogeneous hosts (NFS $HOME, container images).  A per-feature
        # subdirectory makes a mismatched load impossible; TPU entries key
        # only on jax version (device code is host-independent).
        cache_dir = os.path.join(cache_dir, _host_key())
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:  # cache is an optimization, never fatal
        pass


def _host_key() -> str:
    """Short stable hash of the host's CPU feature set + jax version."""
    import hashlib

    feats = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    feats = " ".join(sorted(line.split(":", 1)[1].split()))
                    break
    except OSError:
        import platform

        feats = platform.machine() + platform.processor()
    import jax

    return hashlib.sha256((feats + jax.__version__).encode()).hexdigest()[:16]
