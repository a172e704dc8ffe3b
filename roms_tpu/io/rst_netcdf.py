"""NetCDF restart stream in reference-compatible layout.

The reference writes restart records through def_rst.F/wrt_rst.F and
reads them back via get_state.F:89-157; with PERFECT_RESTART it also
stores the extra time levels and RHS histories (wrt_rst.F:43,142-178)
so a stop/restart run is bit-reproducible.  This module is the same
stream for the TPU model: the prognostic fields carry the reference's
variable names and C-grid dimensions (zeta/ubar/vbar/u/v/temp/salt on
ocean_time x [s_rho] x eta_* x xi_*), so Fortran-side tooling (ncks,
pyroms, the reference's own get_state) can exchange fields with it,
while the perfect-restart history slots (AB histories, t_prev, 2D
coupling forcing, depths, turbulence state) ride along under namespaced
variables.  `LcycleRST` semantics (roms_upwelling.in:261) are kept via
``cycle=2``: records alternate 0/1 so the file never grows.

Bit-exactness contract (tests/test_rst_netcdf.py):
    step(read(write(s))) == step(s)   bit for bit
because every leaf the stepper consumes is stored at its native dtype.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from scipy.io import netcdf_file

from ..config import ModelConfig
from ..core.state import State
from .varinfo import REGISTRY, dims_for

# State leaves written under reference names (wrt_rst.F field list).
_CORE = (
    ("zeta", "zeta", "r2"),
    ("ubar", "ubar", "u2"),
    ("vbar", "vbar", "v2"),
    ("u", "u", "u3"),
    ("v", "v", "v3"),
)

# Perfect-restart companions (PERFECT_RESTART extra records,
# wrt_rst.F:142-178): AB histories, predictor level, 2D coupling
# forcing, and the depth arrays the correctors consumed.
_HIST2 = ("ru0_prev", "rv0_prev", "ru0_prev2", "rv0_prev2")
_HIST3 = ("ru_prev", "rv_prev", "ru_prev2", "rv_prev2", "z_r", "Hz")
_MIX_FIELDS = ("tke", "tke_prev", "gls", "gls_prev", "Akv", "Akt",
               "Akk", "Akp", "Lscale")


def _nc_code(dtype) -> str:
    return {"float32": "f", "float64": "d",
            "int32": "i", "int64": "i"}[np.dtype(dtype).name]


def _tracer_names(cfg: ModelConfig):
    names = ["temp", "salt"]
    for i in range(2, cfg.NT):
        names.append(f"tracer{i + 1:02d}")
    return names[: cfg.NT]


class RestartWriter:
    """def_rst.F + wrt_rst.F analog: reference-layout NetCDF restart.

    cycle: number of records to cycle over (2 = LcycleRST; 0 = append
    forever).  checksum: optional get_hash algorithm recorded per field
    per record (nf_fwrite* CHECKSUM hook).
    """

    def __init__(self, path: str, cfg: ModelConfig, grid, cycle: int = 2,
                 checksum: str | None = None):
        self.cfg = cfg
        self.cycle = cycle
        self.checksum = checksum
        self.nrec = 0
        Mj, Li = cfg.shape2d
        N = cfg.N
        f = netcdf_file(path, "w", version=2)
        f.type = "ROMS/TOMS restart file"
        f.history = "roms_tpu restart file (perfect restart)"
        f.Vtransform = cfg.vert.Vtransform
        f.Vstretching = cfg.vert.Vstretching
        f.createDimension("ocean_time", None)
        for d, n in (("xi_rho", Li), ("xi_u", Li), ("xi_v", Li),
                     ("eta_rho", Mj), ("eta_u", Mj), ("eta_v", Mj),
                     ("s_rho", N), ("s_w", N + 1)):
            f.createDimension(d, n)

        vt = f.createVariable("ocean_time", "d", ("ocean_time",))
        vt.units = "seconds since initialization"
        self._time = vt
        vi = f.createVariable("nsteps", "i", ("ocean_time",))
        vi.long_name = "completed baroclinic steps (iic)"
        self._iic = vi

        dt = _nc_code(cfg.dtype)
        self._vars = {}
        self._hash_vars = {}

        def defvar(name, loc, long_name="", units=""):
            v = f.createVariable(name, dt,
                                 ("ocean_time",) + dims_for(loc, N))
            if long_name:
                v.long_name = long_name
            if units:
                v.units = units
            self._vars[name] = v
            if self.checksum:
                hv = f.createVariable(name + "_checksum", "i",
                                      ("ocean_time",))
                hv.long_name = f"{self.checksum} checksum of {name}"
                self._hash_vars[name] = hv
            return v

        for attr, name, loc in _CORE:
            info = REGISTRY.get(name)
            defvar(name, loc, info.long_name if info else attr,
                   info.units if info else "")
        for i, trc in enumerate(_tracer_names(cfg)):
            info = REGISTRY.get(trc)
            defvar(trc, "r3", info.long_name if info else trc,
                   info.units if info else "")
            defvar(trc + "_prev", "r3",
                   f"{trc} at previous time level (perfect restart)")
        for name in _HIST2:
            defvar(name, "r2", f"{name} 2D coupling history "
                   "(perfect restart)")
        for name in _HIST3:
            defvar(name, "r3", f"{name} (perfect restart)")
        defvar("z_w", "w3", "interface depths consumed by correctors")
        self.has_mix = False
        self.f = f
        self._grid = grid
        self._path = path

    def _ensure_mix_vars(self, mix):
        if self.has_mix or mix is None:
            return
        # scipy classic format requires defining variables before the
        # first record write; callers pass the initial state first.
        dt = _nc_code(self.cfg.dtype)
        N = self.cfg.N

        def defmix(vname):
            v = self.f.createVariable(
                vname, dt, ("ocean_time",) + dims_for("w3", N))
            self._vars[vname] = v
            if self.checksum:
                hv = self.f.createVariable(vname + "_checksum", "i",
                                           ("ocean_time",))
                hv.long_name = f"{self.checksum} checksum of {vname}"
                self._hash_vars[vname] = hv

        for name in _MIX_FIELDS:
            val = getattr(mix, name)
            if val.ndim == 4:          # Akt: (NAT, N+1, Mj, Li)
                for ia in range(val.shape[0]):
                    defmix(f"mix_{name}{ia}")
            else:
                defmix(f"mix_{name}")
        self.has_mix = True

    def write(self, state: State):
        self._ensure_mix_vars(state.mix)
        i = self.nrec % self.cycle if self.cycle else self.nrec
        self._time[i] = float(np.asarray(state.time))
        self._iic[i] = int(np.asarray(state.iic))

        vals = {}
        for attr, name, _ in _CORE:
            vals[name] = getattr(state, attr)
        for it, trc in enumerate(_tracer_names(self.cfg)):
            vals[trc] = state.t[it]
            vals[trc + "_prev"] = state.t_prev[it]
        for name in _HIST2 + _HIST3:
            vals[name] = getattr(state, name)
        vals["z_w"] = state.z_w
        if state.mix is not None:
            for name in _MIX_FIELDS:
                v = getattr(state.mix, name)
                if v.ndim == 4:
                    for ia in range(v.shape[0]):
                        vals[f"mix_{name}{ia}"] = v[ia]
                else:
                    vals[f"mix_{name}"] = v

        for name, val in vals.items():
            arr = np.asarray(val)
            self._vars[name][i] = arr
            if self.checksum:
                from .checksum import get_hash
                h = get_hash(arr, self.checksum)
                self._hash_vars[name][i] = np.int32(h & 0x7FFFFFFF)
        self.nrec += 1
        self.f.flush()

    def close(self):
        self.f.close()


def read_restart(path: str, cfg: ModelConfig, grid,
                 template: State | None = None, rec: int = -1) -> State:
    """get_state.F analog: rebuild a State from a restart record.

    template supplies any aux pytrees this reader does not model (sed/
    bbl/ice) and the mix structure; prognostic + history leaves come
    from the file at their stored dtype, so stepping the result matches
    an uninterrupted run bit for bit.
    """
    from ..core import state as state_mod

    f = netcdf_file(path, "r", mmap=False)
    nrec = f.variables["ocean_time"].shape[0]
    times = f.variables["ocean_time"][:nrec]
    iics = f.variables["nsteps"][:nrec]
    if rec == -1:
        rec = int(np.argmax(iics))     # latest record under cycling

    def get(name):
        arr = np.asarray(f.variables[name][rec])
        # classic NetCDF is big-endian; JAX needs native byte order
        return jnp.asarray(arr.astype(arr.dtype.newbyteorder("=")))

    t = jnp.stack([get(trc) for trc in _tracer_names(cfg)])
    t_prev = jnp.stack([get(trc + "_prev")
                        for trc in _tracer_names(cfg)])
    mix = template.mix if template is not None else None
    if mix is not None and "mix_tke" in f.variables:
        kw = {}
        for name in _MIX_FIELDS:
            ref = getattr(mix, name)
            if ref.ndim == 4:
                kw[name] = jnp.stack(
                    [get(f"mix_{name}{ia}") for ia in range(ref.shape[0])])
            else:
                kw[name] = get(f"mix_{name}")
        mix = mix._replace(**kw)

    s = State(
        time=jnp.asarray(times[rec], dtype=jnp.result_type(float)),
        iic=jnp.asarray(int(iics[rec]), dtype=jnp.int32),
        zeta=get("zeta"), ubar=get("ubar"), vbar=get("vbar"),
        u=get("u"), v=get("v"), t=t, t_prev=t_prev,
        ru_prev=get("ru_prev"), rv_prev=get("rv_prev"),
        ru_prev2=get("ru_prev2"), rv_prev2=get("rv_prev2"),
        ru0_prev=get("ru0_prev"), rv0_prev=get("rv0_prev"),
        ru0_prev2=get("ru0_prev2"), rv0_prev2=get("rv0_prev2"),
        z_r=get("z_r"), z_w=get("z_w"), Hz=get("Hz"),
        mix=mix,
        sed=template.sed if template is not None else None,
        bbl=template.bbl if template is not None else None,
        ice=template.ice if template is not None else None)
    f.close()
    return s
