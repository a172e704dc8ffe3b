"""JEDI (Joint Effort for Data assimilation Integration) interface.

The reference exposes ROMS to the JCSDA OOPS/UFO stack through a
three-phase driver plus state/increment hooks
(ROMS/Drivers/jedi_roms.h:8-20: ROMS_initialize split into
initialize_p1/p2, ROMS_run windows, state get/set for Geometry/State/
Increment objects).  This is the TPU-native analog: the same phase
protocol over the jax Model, with the state vector exposed as a flat
array (the OOPS State/Increment contract) and the tangent-linear /
adjoint applications served by jvp/vjp — everything a JEDI
ModelInterface binding needs.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.gst import _flat, _unflat



def _ad_jvp(*a, **kw):
    """jax.jvp with the Pallas kernels disabled for the traced region
    (pallas_call has no AD rules; ops/kernel_gate.py)."""
    from ..ops.kernel_gate import no_pallas
    import jax as _jax
    with no_pallas():
        return _jax.jvp(*a, **kw)


def _ad_vjp(*a, **kw):
    """jax.vjp under no_pallas(); NOTE the returned vjp_fn retraces
    nothing — the forward trace (already kernel-free) defines it."""
    from ..ops.kernel_gate import no_pallas
    import jax as _jax
    with no_pallas():
        return _jax.vjp(*a, **kw)


class JEDIInterface:
    """Phaseful driver facade (jedi_roms.h protocol).

    Phase 1 (construction) captures configuration; phase 2 binds the
    initial state; run(window) advances; get_state/set_state exchange
    the OOPS state vector; apply_tlm/apply_adm serve the linearized
    model about the last trajectory.
    """

    def __init__(self, model, grid=None):
        # initialize_p1: configuration + geometry (jedi_roms.h phase 1)
        self.model = model
        self.grid = grid if grid is not None else model.grid
        self.state = None
        self._fields = ("zeta", "ubar", "vbar", "u", "v", "t")

    # -- phase 2: bind initial conditions --------------------------------
    def initialize_p2(self, state) -> None:
        self.state = state

    # -- geometry / state-vector contract --------------------------------
    def state_template(self):
        return {f: getattr(self.state, f) for f in self._fields}

    def get_state(self) -> np.ndarray:
        """Serialize the prognostic state (OOPS State::serialize)."""
        return np.asarray(_flat(self.state_template()))

    def set_state(self, vec) -> None:
        """Deserialize an OOPS state vector into the model state."""
        tree = _unflat(jnp.asarray(vec), self.state_template())
        self.state = self.state._replace(**tree)

    # -- phase 3: forecast windows ----------------------------------------
    def run(self, nsteps: int) -> None:
        """Advance the nonlinear model one DA window
        (jedi_roms.h ROMS_run)."""
        for _ in range(nsteps):
            self.state = self.model.step(self.state)

    # -- linearized model services (UFO/OOPS Increment ops) ---------------
    def _traj_fn(self, nsteps: int):
        base = self.state

        def traj(dtree):
            s = base._replace(**{k: getattr(base, k) + v
                                 for k, v in dtree.items()})
            for _ in range(nsteps):
                s = self.model.step_impl(s, self.grid)
            return {f: getattr(s, f) for f in self._fields}
        return traj

    def apply_tlm(self, dvec, nsteps: int) -> np.ndarray:
        """Tangent-linear propagation of an increment vector."""
        traj = self._traj_fn(nsteps)
        zero = jax.tree_util.tree_map(jnp.zeros_like,
                                      self.state_template())
        dx = _unflat(jnp.asarray(dvec), zero)
        _, out = _ad_jvp(traj, (zero,), (dx,))
        return np.asarray(_flat(out))

    def apply_adm(self, wvec, nsteps: int) -> np.ndarray:
        """Adjoint propagation (OOPS Increment adjoint contract)."""
        traj = self._traj_fn(nsteps)
        zero = jax.tree_util.tree_map(jnp.zeros_like,
                                      self.state_template())
        _, vjp_fn = _ad_vjp(traj, zero)
        w = _unflat(jnp.asarray(wvec), traj(zero))
        (out,) = vjp_fn(w)
        return np.asarray(_flat(out))

    # -- finalize ----------------------------------------------------------
    def finalize(self) -> None:
        self.state = None
