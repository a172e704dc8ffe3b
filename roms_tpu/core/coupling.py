"""Component coupling seam (ESMF/NUOPC-style import/export states).

The reference couples to atmosphere/wave/ice components through
ESMF/NUOPC or MCT (Master/ROMS/Utility esmf_* and mct couplers,
SURVEY.md 2.6): each component exchanges named 2-D fields on a clock.
Here the same contract is a pair of plain pytrees:

  ImportState  — fields the ocean consumes (winds, heat fluxes, wave
                 parameters, ...), produced by any external component
                 or file reader;
  ExportState  — fields the ocean provides (SST, SSH, surface
                 currents, ice state, ...).

`CoupledOcean` wraps a Model and advances it one coupling window at a
time, translating the import fields into the Model's forcing/wave/ice
hooks and filling the export state afterwards.  Because both states
are pytrees of arrays, a coupled driver can jit across components or
exchange them across processes (the communicator-forking equivalent is
a jax mesh/process split, not MPI_COMM_SPLIT).
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional

import jax.numpy as jnp


class ImportState(NamedTuple):
    """Fields the ocean imports each coupling window (all optional;
    None keeps the model's own forcing for that group)."""
    sustr: Any = None            # kinematic wind stress (u points)
    svstr: Any = None
    shflux: Any = None           # net surface heat flux (Celsius m/s)
    swrad: Any = None            # shortwave (Celsius m/s)
    ssflux: Any = None           # salt flux (psu m/s)
    Hwave: Any = None            # wave fields for BBL/WEC
    Dwave: Any = None
    Lwave: Any = None
    Pwave: Any = None


class ExportState(NamedTuple):
    """Fields the ocean exports after each window (wrt_cplfields
    equivalents)."""
    sst: Any
    sss: Any
    ssh: Any
    usur: Any
    vsur: Any
    ubar: Any
    vbar: Any


class CoupledOcean:
    """NUOPC-style phase driver around a Model.

    run_window(state, imports, nsteps) advances the ocean nsteps with
    the imported surface fields overriding the model's forcing, then
    returns (state, ExportState).
    """

    def __init__(self, model):
        self.model = model

    def run_window(self, state, imports: ImportState, nsteps: int):
        override = {"sustr": imports.sustr, "svstr": imports.svstr,
                    "srflx": imports.swrad,
                    "stflx0": imports.shflux,
                    "stflx1": imports.ssflux}
        for _ in range(nsteps):
            state = self.model.step_with_forcing(state, override)
        exports = ExportState(
            sst=state.t[0][-1],
            sss=state.t[1][-1] if self.model.cfg.NT > 1 else None,
            ssh=state.zeta,
            usur=state.u[-1], vsur=state.v[-1],
            ubar=state.ubar, vbar=state.vbar)
        return state, exports
