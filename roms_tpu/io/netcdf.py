"""NetCDF output streams (history / quick / averages).

The reference writes NetCDF through a rank-0 gather (def_his.F/wrt_his.F
via nf_fwrite2d/3d + mp_gather, SURVEY.md 2.6).  Here device arrays are
fetched once per record (a single device-to-host copy of the pytree) and
appended to a classic NetCDF file via scipy.io.netcdf_file — dependency-
free and readable by every ROMS post-processing tool.

The CF-ish schema mirrors the reference: ocean_time unlimited record
dimension, s_rho/s_w vertical coordinates with Vtransform/Vstretching
attributes, staggered eta/xi dimensions per C-grid location.
"""

from __future__ import annotations

import numpy as np
from scipy.io import netcdf_file

from ..config import ModelConfig
from .varinfo import REGISTRY, dims_for


class HistoryWriter:
    """Append-per-record NetCDF writer (HIS/QCK streams).

    fields: list of registry keys to write each record.  Tracer entries
    'temp'/'salt' map to state.t[0]/t[1]; turbulence fields come from
    state.mix when present.
    """

    def __init__(self, path: str, cfg: ModelConfig, grid,
                 fields=("zeta", "ubar", "vbar", "u", "v", "temp",
                         "salt"), checksum: str = None):
        self.cfg = cfg
        self.grid = grid
        self.fields = fields
        self.checksum = checksum      # 'bitsum' | 'adler32' | 'crc32'
        self.nrec = 0
        self._derived_jit = None
        Mj, Li = cfg.shape2d
        N = cfg.N
        f = netcdf_file(path, "w", version=2)
        f.history = "roms_tpu history file"
        f.type = "ROMS/TOMS history file"
        f.Vtransform = cfg.vert.Vtransform
        f.Vstretching = cfg.vert.Vstretching

        # scipy's classic-format writer requires the record dimension
        # to be defined first
        f.createDimension("ocean_time", None)
        f.createDimension("xi_rho", Li)
        f.createDimension("xi_u", Li)
        f.createDimension("xi_v", Li)
        f.createDimension("eta_rho", Mj)
        f.createDimension("eta_u", Mj)
        f.createDimension("eta_v", Mj)
        f.createDimension("s_rho", N)
        f.createDimension("s_w", N + 1)

        vt = f.createVariable("ocean_time", "d", ("ocean_time",))
        vt.units = "seconds since initialization"
        self._time = vt

        for name in ("s_rho", "s_w", "Cs_r", "Cs_w"):
            dim = "s_rho" if name.endswith("_r") or name == "s_rho" \
                else "s_w"
            v = f.createVariable(name, "d", (dim,))
            src = {"s_rho": grid.sc_r, "s_w": grid.sc_w,
                   "Cs_r": grid.Cs_r, "Cs_w": grid.Cs_w}[name]
            v[:] = np.asarray(src, np.float64)

        # static grid fields
        for key in ("h", "f", "pm", "pn"):
            info = REGISTRY[key]
            v = f.createVariable(info.name, "d", dims_for(info.location, N))
            v.long_name = info.long_name
            v.units = info.units
            v[:] = np.asarray(getattr(grid, key), np.float64)

        self._vars = {}
        self._hash_vars = {}
        for key in self.fields:
            info = REGISTRY[key]
            dims = ("ocean_time",) + dims_for(info.location, N)
            v = f.createVariable(info.name, "f", dims)
            v.long_name = info.long_name
            v.units = info.units
            self._vars[key] = v
            if self.checksum:
                # get_hash.F analog: per-record field checksums stored
                # as a parallel record variable
                hv = f.createVariable(info.name + "_checksum", "i",
                                      ("ocean_time",))
                hv.long_name = f"{self.checksum} checksum of {info.name}"
                self._hash_vars[key] = hv
        self.f = f

    def _derived(self, state):
        """Diagnostic fields the reference derives at write time:
        rho (rho_eos), omega = W*pm*pn (scale_omega, wrt_his.F:992-1006)
        and the true vertical velocity w (wvelocity.F).  The barotropic
        means wvelocity needs equal the vertical integrals of the
        corrected mass fluxes (step3d_uv's DU_avg1 readjustment)."""
        if self._derived_jit is None:
            import jax

            from ..core.omega import omega as omega_fn, wvelocity
            from ..core.rho_eos import rho_eos
            from ..grid.depth import set_massflux

            def compute(s):
                rho = rho_eos(self.cfg, s.t, s.z_r, s.Hz, s.z_w)[0]
                Huon, Hvom = set_massflux(self.grid, s.u, s.v, s.Hz)
                W = omega_fn(self.cfg, self.grid, Huon, Hvom, s.z_w)
                pmn = self.grid.pm * self.grid.pn
                wvel = wvelocity(self.cfg, self.grid, s.u, s.v, W,
                                 s.z_r, s.z_w, Huon.sum(0), Hvom.sum(0))
                return {"rho": rho, "omega": W * pmn[None], "w": wvel}
            self._derived_jit = jax.jit(compute)
        return self._derived_jit(state)

    def _extract(self, state, key):
        if key in ("rho", "w", "omega"):
            # one derived-pipeline execution per state, not per key
            if getattr(self, "_derived_for", None) is not state:
                self._derived_vals = self._derived(state)
                self._derived_for = state
            return self._derived_vals[key]
        if key.endswith("_sur"):
            base = key[:-4]
            f3 = {"temp": state.t[0], "salt": state.t[1],
                  "u": state.u, "v": state.v}[base]
            return f3[-1]
        if key == "temp":
            return state.t[0]
        if key == "salt":
            return state.t[1]
        if key in ("tke", "gls", "AKv"):
            attr = {"tke": "tke", "gls": "gls", "AKv": "Akv"}[key]
            return getattr(state.mix, attr)
        if key == "AKt":
            return state.mix.Akt[0]
        return getattr(state, key)

    def write(self, state, time=None):
        i = self.nrec
        t = float(np.asarray(state.time if time is None else time))
        self._time[i] = t
        for key in self.fields:
            val = np.asarray(self._extract(state, key), np.float32)
            self._vars[key][i] = val
            if self.checksum:
                from .checksum import get_hash
                h = get_hash(val, self.checksum)
                self._hash_vars[key][i] = np.int32(h & 0x7FFFFFFF)
        self.nrec += 1
        self.f.flush()

    def close(self):
        self.f.close()


class AverageAccumulator:
    """Time-averaged output (set_avg.F / AVG stream): running mean of the
    selected fields between writes."""

    def __init__(self, cfg: ModelConfig, fields):
        self.cfg = cfg
        self.fields = fields
        self.reset()

    def reset(self):
        self._sum = None
        self._count = 0

    def accumulate(self, extract_fn, state):
        vals = {k: np.asarray(extract_fn(state, k)) for k in self.fields}
        if self._sum is None:
            self._sum = vals
        else:
            for k in self.fields:
                self._sum[k] = self._sum[k] + vals[k]
        self._count += 1

    def mean(self):
        return {k: v / self._count for k, v in self._sum.items()}


class DiagWriter:
    """DIA output stream (def_diags.F/wrt_diags.F): per-term tracer
    budget fields, one variable per (tracer, term)."""

    TERMS = ("rate", "forc", "hadv", "vadv", "vdif", "nudg")

    def __init__(self, path: str, cfg: ModelConfig, grid,
                 tracers=("temp", "salt")):
        self.cfg = cfg
        self.tracers = tracers
        self.nrec = 0
        Mj, Li = cfg.shape2d
        f = netcdf_file(path, "w", version=2)
        f.type = "ROMS/TOMS diagnostics file"
        f.createDimension("ocean_time", None)
        f.createDimension("xi_rho", Li)
        f.createDimension("eta_rho", Mj)
        f.createDimension("s_rho", cfg.N)
        vt = f.createVariable("ocean_time", "d", ("ocean_time",))
        vt.units = "seconds since initialization"
        self._time = vt
        self._vars = {}
        dims = ("ocean_time", "s_rho", "eta_rho", "xi_rho")
        for it, trc in enumerate(tracers):
            for term in self.TERMS:
                v = f.createVariable(f"{trc}_{term}", "f", dims)
                v.long_name = f"{trc} {term} term, Hz-weighted " \
                    "increment per step"
                v.units = "meter" if trc == "salt" else "Celsius meter"
                self._vars[(it, term)] = v
        self.f = f

    def write(self, diag, time):
        i = self.nrec
        self._time[i] = float(np.asarray(time))
        for (it, term), v in self._vars.items():
            v[i] = np.asarray(diag[term][it], np.float32)
        self.nrec += 1
        self.f.flush()

    def close(self):
        self.f.close()


class ExtractWriter(HistoryWriter):
    """Grid-extraction output stream (the reference's grid extraction
    utility, SURVEY 2.6): history records for a strided subdomain
    [j0 : j0+Me*stride : stride, i0 : i0+Le*stride : stride] written
    at native or decimated resolution."""

    def __init__(self, path: str, cfg: ModelConfig, grid, fields=(
            "zeta", "u", "v", "temp"), i0=0, j0=0, Le=None, Me=None,
            stride=1):
        Mj, Li = cfg.shape2d
        self.i0, self.j0, self.stride = i0, j0, stride
        self.Le = Le or (Li - i0) // stride
        self.Me = Me or (Mj - j0) // stride

        class _CfgView:
            """cfg proxy exposing the extracted shape to the base
            writer's dimension setup."""
            shape2d = (self.Me, self.Le)
            N = cfg.N
            vert = cfg.vert

        class _GridView:
            pass

        gv = _GridView()
        sl = (slice(j0, j0 + self.Me * stride, stride),
              slice(i0, i0 + self.Le * stride, stride))
        for key in ("h", "f", "pm", "pn"):
            setattr(gv, key, np.asarray(getattr(grid, key))[sl])
        for key in ("sc_r", "Cs_r", "sc_w", "Cs_w"):
            setattr(gv, key, getattr(grid, key))
        super().__init__(path, _CfgView(), gv, fields)
        self._sl = sl
        # derived fields (rho/w/omega) compute on the FULL grid before
        # slicing; the views above were only for the file schema
        self.cfg = cfg
        self.grid = grid

    def _extract(self, state, key):
        full = super()._extract(state, key)
        return np.asarray(full)[..., self._sl[0], self._sl[1]]
