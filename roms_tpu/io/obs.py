"""4D-Var observation file IO (the reference's s4dvar obs NetCDF
format: obs_type/obs_time/obs_Xgrid/obs_Ygrid/obs_Zgrid/obs_value/
obs_error survey variables read by obs_read.F / written by
stats_modobs.F)."""

from __future__ import annotations

import numpy as np
from scipy.io import netcdf_file

# state-variable ids (mod_ncparam isFsur..isTvar ordering)
OBS_TYPE = {"zeta": 1, "ubar": 2, "vbar": 3, "u": 4, "v": 5,
            "temp": 6, "salt": 7}
TYPE_NAME = {v: k for k, v in OBS_TYPE.items()}


def write_obs_file(path, field, times, Xgrid, Ygrid, Zgrid, values,
                   errors, provenance=None):
    """Write a survey file in the reference layout (one datum per
    record of the unlimited dimension)."""
    n = len(values)
    f = netcdf_file(path, "w", version=2)
    f.createDimension("datum", None)
    vs = {}
    for name, typ in (("obs_type", "i"), ("obs_provenance", "i"),
                      ("obs_time", "d"), ("obs_Xgrid", "d"),
                      ("obs_Ygrid", "d"), ("obs_Zgrid", "d"),
                      ("obs_value", "d"), ("obs_error", "d")):
        vs[name] = f.createVariable(name, typ, ("datum",))
    otype = OBS_TYPE[field] if isinstance(field, str) else int(field)
    for i in range(n):
        vs["obs_type"][i] = otype
        vs["obs_provenance"][i] = 0 if provenance is None \
            else int(np.asarray(provenance)[i])
        vs["obs_time"][i] = float(np.asarray(times)[i]) \
            if np.ndim(times) else float(times)
        vs["obs_Xgrid"][i] = float(np.asarray(Xgrid)[i])
        vs["obs_Ygrid"][i] = float(np.asarray(Ygrid)[i])
        vs["obs_Zgrid"][i] = float(np.asarray(Zgrid)[i])
        vs["obs_value"][i] = float(np.asarray(values)[i])
        vs["obs_error"][i] = float(np.asarray(errors)[i])
    f.flush()
    f.close()


def read_obs_file(path):
    """Read a survey file; returns a dict of numpy arrays keyed by the
    reference variable names (minus the obs_ prefix)."""
    f = netcdf_file(path, "r", mmap=False)
    out = {}
    for name in ("obs_type", "obs_provenance", "obs_time", "obs_Xgrid",
                 "obs_Ygrid", "obs_Zgrid", "obs_value", "obs_error"):
        if name in f.variables:
            out[name[4:]] = np.ascontiguousarray(
                f.variables[name][:],
                dtype=np.float64 if name not in
                ("obs_type", "obs_provenance") else np.int64)
    f.close()
    return out


def to_observations(data, field, step, dt):
    """Convert one survey's worth of read data for a single state
    variable into the assimilation Observations structure (grid-index
    observations at one model step)."""
    import jax.numpy as jnp
    from ..assim.i4dvar import Observations
    otype = OBS_TYPE[field]
    sel = data["type"] == otype
    idx = np.stack([np.rint(data["Zgrid"][sel]).astype(np.int64),
                    np.rint(data["Ygrid"][sel]).astype(np.int64),
                    np.rint(data["Xgrid"][sel]).astype(np.int64)],
                   axis=1)
    return Observations(
        field=field, step=step, indices=jnp.asarray(idx),
        values=jnp.asarray(data["value"][sel]),
        error=jnp.asarray(data["error"][sel]))
