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

_state = threading.local()


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
