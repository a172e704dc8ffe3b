"""Global Pallas-kernel gate for differentiation contexts.

`pallas_call` has no reverse-mode autodiff rule, so every TLM/ADM/
4D-Var/GST code path (jax.jvp/vjp/grad of the step) must trace the pure
jnp model even on a TPU where the fused kernels default on.  Each
kernel's `use_pallas_*` consults this gate; the assimilation drivers
and GST propagators wrap their traced regions in `no_pallas()`.

This replaces nothing in the reference — the Fortran TLM/ADM are
separate hand-written kernels (ROMS/Tangent, ROMS/Adjoint); here the
single jnp definition IS the differentiable kernel, and the Pallas
layer is a forward-only acceleration of the same arithmetic.
"""

from __future__ import annotations

import contextlib
import threading

import numpy as np

_state = threading.local()


def dtype_supported(dtype) -> bool:
    """Mosaic has no 64-bit lowering (NotImplementedError: 64-bit types
    are not supported), so float64 configs must trace the jnp path.
    Explicit ROMS_TPU_PALLAS_*=1 overrides bypass this (interpret-mode
    f64 parity tests rely on that)."""
    try:
        return np.dtype(dtype).itemsize < 8
    except TypeError:
        return True


def pallas_enabled() -> bool:
    return not getattr(_state, "disabled", False)


@contextlib.contextmanager
def no_pallas():
    """Force every kernel dispatch to the differentiable jnp path for
    functions TRACED inside this context (trace-time decision)."""
    prev = getattr(_state, "disabled", False)
    _state.disabled = True
    try:
        yield
    finally:
        _state.disabled = prev
