import os
import sys

# Tests run on the CPU backend with a virtual 8-device mesh so sharding paths
# compile and execute without TPU hardware.  jax may already be imported by a
# site hook with a different platform list, so override through the config
# (valid until first backend initialization), not just env vars.
os.environ.setdefault("AITPU_JAX_PLATFORMS", "cpu")
os.environ.setdefault("AITPU_HOST_DEVICE_COUNT", "8")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax

try:
    jax.config.update("jax_platforms", "cpu")
except Exception:
    pass

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


# No exit-time shield here: every thread owner (BatchingSearcher pipelines,
# Index maintenance) registers an atexit drain when its daemon threads start,
# so a normal interpreter shutdown never kills a thread inside jax/pybind11
# frames.  A clean `pytest` exit code is itself part of what the suite proves.
