"""Test harness configuration.

Tests run on CPU in float64 (the reference model is float64 Fortran) with an
8-device virtual mesh available for sharding tests.  TPU benchmarking uses
float32; the physics is validated here at full precision.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_enable_x64", True)
