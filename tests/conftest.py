"""Test harness configuration.

Tests run on CPU in float64 (the reference model is float64 Fortran) with
an 8-device virtual mesh available for sharding tests.  TPU benchmarking
uses float32; the physics is validated here at full precision.

The environment pins JAX_PLATFORMS=axon (tunneled TPU) and its
sitecustomize initializes the plugin before conftest runs, so the CPU
backend is selected through jax.config rather than the environment.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# Persistent compile cache: the suite's wall time is dominated by jit
# compiles of the full step at many small shapes; cache them across
# runs (and across the driver's test invocations).


def _host_cache_dir(base):
    """CPU compile-cache directory keyed by the host CPU feature set.

    The persistent cache stores XLA:CPU AOT executables; loading one
    compiled on a host with different ISA features SIGILLs/segfaults
    (the cache key does not include the full feature set).  Deriving
    the directory from /proc/cpuinfo flags keeps caches from different
    sandbox machines apart while still reusing warm entries on the
    same machine."""
    import hashlib
    try:
        with open("/proc/cpuinfo") as fh:
            for line in fh:
                if line.startswith("flags"):
                    h = hashlib.sha1(line.encode()).hexdigest()[:8]
                    return f"{base}_cpu_{h}"
    except OSError:
        pass
    return base + "_cpu"


jax.config.update("jax_compilation_cache_dir",
                  _host_cache_dir(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running integration tests")
