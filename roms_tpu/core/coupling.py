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
        waves = None
        if imports.Hwave is not None:
            # forward the wave-component import fields into the
            # BBL/WEC hooks (mct_roms_swan.h field exchange; the hooks
            # receive them as a jit argument each window)
            waves = {"Hwave": imports.Hwave, "Dwave": imports.Dwave,
                     "Lwave": imports.Lwave, "Pwave": imports.Pwave}
            none_keys = [k for k, v in waves.items() if v is None]
            for k in none_keys:
                waves[k] = jnp.zeros_like(imports.Hwave) + (
                    1.0 if k in ("Lwave", "Pwave") else 0.0)
        for _ in range(nsteps):
            state = self.model.step_with_forcing(state, override,
                                                 waves=waves)
        exports = ExportState(
            sst=state.t[0][-1],
            sss=state.t[1][-1] if self.model.cfg.NT > 1 else None,
            ssh=state.zeta,
            usur=state.u[-1], vsur=state.v[-1],
            ubar=state.ubar, vbar=state.vbar)
        return state, exports


class SlabAtmosphere:
    """Minimal prognostic atmosphere component for coupled runs — the
    counterpart the reference plugs in through its NUOPC/CMEPS caps
    (esmf_atm.F void/data components).  A 2-D slab with heat capacity
    Ca relaxing toward a radiative-equilibrium temperature while
    exchanging sensible heat with the exported SST:

        Ca dTa/dt = -lam_rad (Ta - Teq) + lam_as (SST - Ta)

    Exports (ImportState for the ocean): the air-sea heat flux and a
    prescribed wind stress field.
    """

    def __init__(self, cfg, Teq, sustr, svstr, Ca: float = 1.0e7,
                 lam_rad: float = 20.0, lam_as: float = 25.0,
                 rho0: float = 1025.0):
        self.cfg = cfg
        self.Teq = Teq
        self.sustr = sustr
        self.svstr = svstr
        self.Ca = Ca
        self.lam_rad = lam_rad
        self.lam_as = lam_as
        self.Hscale = rho0 * 3985.0       # flux W/m2 -> Celsius m/s

    def initial_state(self, Ta0):
        return jnp.asarray(Ta0)

    def run_window(self, Ta, sst, dt_window: float):
        """Advance the slab one coupling window against the exported
        SST; returns (Ta_new, ImportState for the ocean)."""
        q_as = self.lam_as * (sst - Ta)           # W/m2, + warms air
        dTa = (-self.lam_rad * (Ta - self.Teq) + q_as) / self.Ca
        Ta_new = Ta + dt_window * dTa
        shflux = -q_as / self.Hscale              # ocean gains -q_as
        return Ta_new, ImportState(sustr=self.sustr, svstr=self.svstr,
                                   shflux=shflux)


class CoupledDriver:
    """Two-component NUOPC-style run sequence (esmf run sequence /
    CMEPS connector): per coupling window, the atmosphere advances
    against the last ocean export, then the ocean advances with the
    atmosphere's fluxes — the standard explicit exchange ordering."""

    def __init__(self, ocean: "CoupledOcean", atmos: SlabAtmosphere,
                 steps_per_window: int):
        self.ocean = ocean
        self.atmos = atmos
        self.nsteps = steps_per_window

    def run(self, ocean_state, Ta, n_windows: int):
        dt_window = self.nsteps * self.ocean.model.cfg.dt
        exports = None
        for w in range(n_windows):
            sst = ocean_state.t[0][-1] if exports is None \
                else exports.sst
            Ta, imports = self.atmos.run_window(Ta, sst, dt_window)
            ocean_state, exports = self.ocean.run_window(
                ocean_state, imports, self.nsteps)
        return ocean_state, Ta, exports
