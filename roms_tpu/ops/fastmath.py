"""sqrt-chain replacements for general `pow` — MEASURED SLOWER, off
by default.

Hypothesis (round-5 perf lever (a)): XLA lowers ``x ** p`` to
``exp(p * log(x))``, so hardware square roots + Newton steps should
beat it for x**0.25 / x**(1/3).  The same-session BENCHMARK3 A/B
said otherwise: sqrt+Newton ON measured 45.5 ms/step vs 43.2 OFF —
the VPU's divide in the Newton step costs more than the fused
exp/log pair the compiler emits.  Default is therefore the XLA pow
path; set ROMS_TPU_FASTMATH=1 to re-enable the sqrt chains for
future hardware where the trade flips.  (BASELINE.md round-5.)
"""

from __future__ import annotations

import os

import jax.numpy as jnp


def _enabled() -> bool:
    """Trace-time gate — DEFAULT OFF (the A/B above); set
    ROMS_TPU_FASTMATH=1 to enable the sqrt chains."""
    return os.environ.get("ROMS_TPU_FASTMATH", "") == "1"


def pow14(x):
    """x**0.25 for x >= 0 as two hardware square roots."""
    if not _enabled():
        return x ** 0.25
    return jnp.sqrt(jnp.sqrt(x))


def cbrt_pos(x, newton: int = 3):
    """x**(1/3) for x >= 0.

    Seed with the sqrt-chain x**(0.25 + 1/16 + 1/64) = x**0.328125
    (6 square roots), then `newton` Newton steps
    y <- 2y/3 + x/(3 y^2).  Relative error < 1e-7 over
    x in [1e-12, 1e6] at newton=3; exactly 0 at x = 0.
    """
    if not _enabled():
        return x ** (1.0 / 3.0)
    x4 = jnp.sqrt(jnp.sqrt(x))           # x**(1/4)
    x16 = jnp.sqrt(jnp.sqrt(x4))         # x**(1/16)
    x64 = jnp.sqrt(jnp.sqrt(x16))        # x**(1/64)
    y = x4 * x16 * x64                   # x**0.328125
    safe = jnp.maximum(y, 1.0e-30)
    for _ in range(newton):
        safe = (2.0 / 3.0) * safe + x / (3.0 * safe * safe)
    return jnp.where(y > 0.0, safe, 0.0)
