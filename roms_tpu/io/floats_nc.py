"""FLT output stream: Lagrangian float trajectories.

The reference writes float trajectories to a dedicated NetCDF stream
(def_floats.F / wrt_floats.F): a `drifter` dimension crossed with the
unlimited `ocean_time` record dimension, carrying grid coordinates
(Xgrid/Ygrid/Zgrid), physical positions and sampled fields.  Unbounded
floats are written as the fill value (spval, wrt_floats.F).
"""

from __future__ import annotations

import numpy as np
from scipy.io import netcdf_file

from ..config import ModelConfig

SPVAL = 1.0e37


class FloatsWriter:
    """Append-per-record writer for the FLT stream.

    Records the float batch (core.floats.Floats) each call; optional
    sampled fields (temp, salt) interpolated by the caller.
    """

    def __init__(self, path: str, cfg: ModelConfig, nfloats: int,
                 sample_fields=()):
        self.cfg = cfg
        self.nrec = 0
        f = netcdf_file(path, "w", version=2)
        f.type = "ROMS/TOMS floats file"
        f.createDimension("ocean_time", None)
        f.createDimension("drifter", nfloats)
        vt = f.createVariable("ocean_time", "d", ("ocean_time",))
        vt.units = "seconds since initialization"
        self._time = vt
        dims = ("ocean_time", "drifter")
        self._vars = {}
        meta = [
            ("Xgrid", "x-grid floats locations", "nondimensional"),
            ("Ygrid", "y-grid floats locations", "nondimensional"),
            ("Zgrid", "z-grid floats locations, depth levels",
             "nondimensional"),
            ("depth", "depth of floats trajectories", "meter"),
        ] + [(name, f"{name} sampled at floats", "") for name in
             sample_fields]
        for name, long_name, units in meta:
            v = f.createVariable(name, "f", dims)
            v.long_name = long_name
            if units:
                v.units = units
            v._FillValue = np.float32(SPVAL)
            self._vars[name] = v
        self.f = f

    def write(self, floats, time, depth=None, samples=None):
        """floats: core.floats.Floats batch; depth: optional (Nf,)
        physical depths; samples: {name: (Nf,) array}."""
        i = self.nrec
        self._time[i] = float(np.asarray(time))
        bounded = np.asarray(floats.bounded)

        def masked(a):
            a = np.asarray(a, np.float32)
            return np.where(bounded, a, np.float32(SPVAL))

        self._vars["Xgrid"][i] = masked(floats.x)
        self._vars["Ygrid"][i] = masked(floats.y)
        self._vars["Zgrid"][i] = masked(floats.s)
        self._vars["depth"][i] = masked(
            depth if depth is not None else np.zeros_like(bounded,
                                                          np.float32))
        for name, val in (samples or {}).items():
            self._vars[name][i] = masked(val)
        self.nrec += 1
        self.f.flush()

    def close(self):
        self.f.close()
