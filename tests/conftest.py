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
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running integration tests")
