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


def pytest_unconfigure(config):
    # Daemon pipeline/server threads can sit inside C++ (device_get, socket
    # accept) at interpreter shutdown; CPython killing them mid-call
    # occasionally aborts the process ("terminate called ... FATAL:
    # exception not rethrown") AFTER pytest has reported, turning a fully
    # passing run into a nonzero exit.  All reporting is done by the time
    # unconfigure runs, so exit hard with pytest's own status.
    import os as _os
    import sys as _sys

    _sys.stdout.flush()
    _sys.stderr.flush()
    status = getattr(config, "_aitpu_exitstatus", None)
    if status is not None:
        _os._exit(int(status))


def pytest_sessionfinish(session, exitstatus):
    session.config._aitpu_exitstatus = int(exitstatus)
