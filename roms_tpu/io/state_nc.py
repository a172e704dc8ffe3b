"""Initial-state ingest from HIS/INI-layout NetCDF (get_state.F analog).

The reference cold/warm-starts realistic applications from an ININAME
NetCDF file through the generic get_state reader
(ROMS/Utility/get_state.F:89-157): it locates the requested record
(NRREC, or the latest), reads each prognostic field found in the file
and leaves everything else at its initialized value.  This module does
the same for the TPU model: zeta/ubar/vbar/u/v/temp/salt (+ extra
tracers) are read when present, the derived fields (depths, vertical
averages, mixing state) are rebuilt by core.state.initial_state —
matching the reference's initial.F post-read sequence (set_depth ->
set_massflux -> omega -> rho_eos, initial.F:341,562-577), which in this
framework happens inside the first step.

For bit-perfect restart of an interrupted run use io.rst_netcdf (the
PERFECT_RESTART stream); this reader is the plain-INI path for files
produced by the reference, by tooling, or by this repo's own history
writer.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from scipy.io import netcdf_file

from ..config import ModelConfig
from ..core.state import State, initial_state


from ._ncutil import (native as _native, pad_to as _pad_to,
                      tracer_names as _tracer_names)


def read_state_netcdf(path: str, cfg: ModelConfig, grid, rec: int = -1,
                      time_name: str = "ocean_time") -> State:
    """Build the initial State from an INI/HIS-layout NetCDF record.

    rec: record index (negative = from the end, reference NRREC<=0
    "latest record" semantics).  Fields absent from the file default to
    rest (zeros) as in ana_initial cold starts.
    """
    f = netcdf_file(path, "r", mmap=False)
    nrec = f.variables[time_name].shape[0]
    if rec < 0:
        rec = nrec + rec
    time0 = float(_native(f.variables[time_name][rec]))

    def get(name):
        if name not in f.variables:
            return None
        return _pad_to(_native(f.variables[name][rec]), cfg.shape2d)

    zeta = get("zeta")
    u = get("u")
    v = get("v")
    ubar = get("ubar")
    vbar = get("vbar")
    tr = [get(nm) for nm in _tracer_names(cfg)]
    N, Mj, Li = cfg.N, *cfg.shape2d
    t = np.stack([x if x is not None else np.zeros((N, Mj, Li))
                  for x in tr])
    f.close()

    s = initial_state(cfg, grid, zeta=zeta, u=u, v=v, t=t, time0=time0)
    # The file's own vertical means take precedence over the recomputed
    # ones when stored (ini_fields.F only derives them if absent).
    repl = {}
    if ubar is not None:
        repl["ubar"] = jnp.asarray(ubar, s.ubar.dtype)
    if vbar is not None:
        repl["vbar"] = jnp.asarray(vbar, s.vbar.dtype)
    return s._replace(**repl) if repl else s
