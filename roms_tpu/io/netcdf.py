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
from ._ncutil import tracer_names
from .varinfo import REGISTRY, dims_for, varinfo_for

_ICE_ATTRS = {"ice_a": "ai", "ice_h": "hi", "ice_u": "ui",
              "ice_v": "vi", "ice_t": "ti", "ice_hsn": "hsn"}
_BED_ATTRS = {"bed_thickness": "thick", "bed_age": "age",
              "bed_porosity": "poro"}
_DIAGNOSED = ("sustr", "svstr", "shflux", "ssflux", "swrad", "bustr",
              "bvstr", "hsbl", "hbbl", "lwrad", "latent", "sensible",
              "evaporation", "rain", "EminusP", "Pair", "Tair",
              "Uwind", "Vwind")


def supported_keys(cfg: ModelConfig, model=None) -> set:
    """Every registry key the writers can extract for this
    configuration — replaces the old fixed whitelist (wrt_his.F field
    dispatch).  `model` unlocks the write-time diagnostics (forcing,
    bottom stress, KPP depths) via Model.diagnose."""
    keys = {"zeta", "ubar", "vbar", "u", "v", "rho", "w", "omega",
            "u_sur", "v_sur"}
    tn = tracer_names(cfg)
    keys |= set(tn)
    keys |= {f"{n}_sur" for n in tn}
    if cfg.mixing.vmix in ("gls", "my25"):
        keys |= {"tke", "gls", "AKv", "AKt", "AKk", "Lscale"}
        if cfg.NT > 1:
            keys.add("AKs")
    if model is not None:
        keys |= {"sustr", "svstr", "shflux", "swrad", "bustr", "bvstr"}
        if cfg.NT > 1:
            keys.add("ssflux")
        if hasattr(getattr(model, "forcing_fn", None), "components"):
            keys |= {"lwrad", "latent", "sensible", "evaporation",
                     "rain", "EminusP", "Pair", "Tair", "Uwind",
                     "Vwind"}
        if cfg.mixing.vmix == "lmd":
            keys |= {"AKv", "AKt", "hsbl"}
            if cfg.NT > 1:
                keys.add("AKs")
            if cfg.mixing.bkpp:
                keys.add("hbbl")
        elif cfg.mixing.vmix not in ("gls", "my25"):
            keys |= {"AKv", "AKt"}
            if cfg.NT > 1:
                keys.add("AKs")
        if getattr(model, "ice_fn", None) is not None:
            keys |= set(_ICE_ATTRS)
        if getattr(model, "sed_fn", None) is not None:
            keys |= set(_BED_ATTRS)
        if getattr(model, "wec_fn", None) is not None and \
                hasattr(model.wec_fn, "stokes"):
            keys |= {"ubar_stokes", "vbar_stokes"}
    return keys


class HistoryWriter:
    """Append-per-record NetCDF writer (HIS/QCK streams).

    fields: list of registry keys to write each record.  Tracer keys
    map through the cfg tracer-name table to state.t slices; turbulence
    fields come from state.mix; forcing/stress/KPP diagnostics come
    from `model.diagnose` when a Model is provided.
    """

    def __init__(self, path: str, cfg: ModelConfig, grid,
                 fields=("zeta", "ubar", "vbar", "u", "v", "temp",
                         "salt"), checksum: str = None, model=None,
                 nbed: int = 0):
        self.cfg = cfg
        self.grid = grid
        self.fields = fields
        self.checksum = checksum      # 'bitsum' | 'adler32' | 'crc32'
        self.model = model
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
        if any(varinfo_for(k, cfg).location == "b3" for k in fields):
            f.createDimension("Nbed", nbed or 1)

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
            info = varinfo_for(key, cfg)
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

    def _diagnosed(self, state):
        """model.diagnose output, one evaluation per state."""
        if getattr(self, "_diag_for", None) is not state:
            self._diag_vals = self.model.diagnose(state)
            self._diag_for = state
        return self._diag_vals

    def _extract(self, state, key):
        if key in ("rho", "w", "omega"):
            # one derived-pipeline execution per state, not per key
            if getattr(self, "_derived_for", None) is not state:
                self._derived_vals = self._derived(state)
                self._derived_for = state
            return self._derived_vals[key]
        if key.endswith("_sur"):
            return self._extract(state, key[:-4])[-1]
        tn = tracer_names(self.cfg)
        if key in tn:
            return state.t[tn.index(key)]
        mix = state.mix
        if mix is not None:
            if key in ("tke", "gls", "Lscale"):
                return getattr(mix, key)
            if key == "AKk":
                return mix.Akk
            if key == "AKv":
                return mix.Akv
            if key == "AKt":
                return mix.Akt[0]
            if key == "AKs":
                return mix.Akt[1]
        if self.model is not None and (
                key in _DIAGNOSED or key in ("AKv", "AKt", "AKs")):
            return self._diagnosed(state)[key]
        if key in _ICE_ATTRS and state.ice is not None:
            return getattr(state.ice, _ICE_ATTRS[key])
        if key in _BED_ATTRS and state.sed is not None:
            return getattr(state.sed, _BED_ATTRS[key])
        if key in ("ubar_stokes", "vbar_stokes"):
            # Stokes transports -> depth-averaged drift (mod_ocean
            # ubar_stokes semantics)
            from ..ops import stencil as st
            DU_st, DV_st, _, _ = self.model.wec_fn.stokes(
                state.time, state.Hz, state.z_r, state.z_w)
            D = state.zeta + self.grid.h
            if key == "ubar_stokes":
                D_u = 0.5 * (D + st.im1(D))
                return DU_st / (D_u * self.grid.on_u)
            D_v = 0.5 * (D + st.jm1(D))
            return DV_st / (D_v * self.grid.om_v)
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
        tn = tracer_names(cfg)
        dims = ("ocean_time", "s_rho", "eta_rho", "xi_rho")
        for trc in tracers:
            it = tn.index(trc) if trc in tn else tracers.index(trc)
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


class DiagUVWriter:
    """DIAGNOSTICS_UV output stream (set_diags.F + wrt_diags.F momentum
    budgets): one variable per (component, term), Hz-weighted per-step
    increments on the native staggers."""

    TERMS = ("rate", "pre", "prsgrd", "cor", "hadv", "vadv", "hvisc",
             "vvisc", "cpl")

    def __init__(self, path: str, cfg: ModelConfig, grid,
                 terms=None):
        self.cfg = cfg
        self.terms = tuple(terms or self.TERMS)
        self.nrec = 0
        Mj, Li = cfg.shape2d
        f = netcdf_file(path, "w", version=2)
        f.type = "ROMS/TOMS diagnostics file"
        f.createDimension("ocean_time", None)
        f.createDimension("xi_u", Li)
        f.createDimension("eta_u", Mj)
        f.createDimension("xi_v", Li)
        f.createDimension("eta_v", Mj)
        f.createDimension("s_rho", cfg.N)
        vt = f.createVariable("ocean_time", "d", ("ocean_time",))
        vt.units = "seconds since initialization"
        self._time = vt
        self._vars = {}
        for mom, dims in (("u", ("ocean_time", "s_rho", "eta_u",
                                 "xi_u")),
                          ("v", ("ocean_time", "s_rho", "eta_v",
                                 "xi_v"))):
            for term in self.terms:
                key = f"{mom}_{term}"
                info = varinfo_for(key, cfg)
                v = f.createVariable(key, "f", dims)
                v.long_name = info.long_name
                v.units = "meter2 second-1"   # Hz-weighted m/s per step
                self._vars[key] = v
        self.f = f

    def write(self, diag_uv, time):
        i = self.nrec
        self._time[i] = float(np.asarray(time))
        for key, v in self._vars.items():
            v[i] = np.asarray(diag_uv[key], np.float32)
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


class InterpExtractWriter(HistoryWriter):
    """Interpolated grid-extraction stream (GRID_EXTRACT with
    ExtractFlag < 0 in the reference: output on a SEPARATE
    coarser/finer target grid via interpolation, mod_extract.F +
    extract_field.F — the round-3 writer only supported the decimated
    ExtractFlag > 0 form).

    target_x/target_y: 1-D physical coordinates of the target grid's
    rho points in the source grid's xr/yr system (rectilinear source
    grids; the analytic application family).  Fields are sampled with
    bilinear weights in fractional index space — the same contact
    machinery as nesting (core/nesting.bilinear).
    """

    def __init__(self, path: str, cfg: ModelConfig, grid, target_x,
                 target_y, fields=("zeta", "u", "v", "temp")):
        import numpy as _np
        xr = _np.asarray(grid.xr)
        yr = _np.asarray(grid.yr)
        xv = xr[xr.shape[0] // 2, :]
        yv = yr[:, yr.shape[1] // 2]
        if not (_np.all(_np.diff(xv) > 0) and
                _np.all(_np.diff(yv) > 0)):
            raise ValueError("InterpExtractWriter needs a rectilinear "
                             "source grid (monotonic xr/yr)")
        tx = _np.asarray(target_x, _np.float64)
        ty = _np.asarray(target_y, _np.float64)
        # fractional source indices of the target points
        self._fi = _np.interp(tx, xv, _np.arange(len(xv)))
        self._fj = _np.interp(ty, yv, _np.arange(len(yv)))

        Me, Le = len(ty), len(tx)

        class _CfgView:
            shape2d = (Me, Le)
            N = cfg.N
            vert = cfg.vert

        class _GridView:
            pass

        gv = _GridView()
        from ..core.nesting import bilinear as _bilin
        import jax.numpy as _jnp
        fj = _jnp.asarray(self._fj)
        fi = _jnp.asarray(self._fi)
        for key in ("h", "f", "pm", "pn"):
            setattr(gv, key,
                    _np.asarray(_bilin(_jnp.asarray(
                        getattr(grid, key)), fj, fi)))
        for key in ("sc_r", "Cs_r", "sc_w", "Cs_w"):
            setattr(gv, key, getattr(grid, key))
        super().__init__(path, _CfgView(), gv, fields)
        self.cfg = cfg
        self.grid = grid
        self._bilin = _bilin
        self._fjj = fj
        self._fii = fi

    def _extract(self, state, key):
        full = super()._extract(state, key)
        return self._bilin(full, self._fjj, self._fii)
