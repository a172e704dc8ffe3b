"""NetCDF grid-file ingest and export (get_grid.F analog).

The reference builds realistic applications from a grid NetCDF file
(GRDNAME) holding bathymetry, metrics, Coriolis, rotation angle, masks
and coordinates (ROMS/Utility/get_grid.F:204-376 variable dispatch:
spherical, xl, el, h, f, pm, pn, dndx, dmde, x/y_rho, lon/lat_rho,
angle, mask_rho/u/v/p, plus optional ZoBot/rdrag/rdrag2).  Here the
primary rho-point fields are read host-side once and handed to
grid.build_grid, which derives every staggered metric exactly as
ROMS/Utility/metrics.F does — staggered metrics and masks in the file
are therefore not needed (they are recomputed, matching set_masks.F).

Shape convention: this framework stores all fields at the uniform full
shape (Mm+2, Lm+2) (grid/grid.py header).  Standard ROMS grid files
have exactly that at rho points (eta_rho = Mm+2, xi_rho = Lm+2), so
rho-point fields map 1:1.

A writer is provided so analytic applications can export their grid in
reference layout (round-trip tested) and users can prepare files with
standard tooling.
"""

from __future__ import annotations

import numpy as np
from scipy.io import netcdf_file

from ..config import ModelConfig
from ..grid.grid import Grid, build_grid


def _native(a):
    a = np.asarray(a)
    return a.astype(a.dtype.newbyteorder("="))


def _get(f, name, default=None):
    if name in f.variables:
        return _native(f.variables[name][:])
    return default


def read_grid_dims(path: str):
    """Return (Lm, Mm) from a grid file's rho dimensions."""
    f = netcdf_file(path, "r", mmap=False)
    Lm = f.dimensions["xi_rho"] - 2
    Mm = f.dimensions["eta_rho"] - 2
    f.close()
    return Lm, Mm


def load_grid_netcdf(path: str, cfg: ModelConfig) -> Grid:
    """Build a Grid from a ROMS-layout grid NetCDF file.

    Required file variables: h, pm, pn (get_grid.F treats these as
    mandatory).  f falls back to 2*Omega*sin(lat) when absent but
    lat_rho is present; angle/masks/curvilinear terms default to the
    trivial values.  File dims must match cfg (Lm+2, Lm from the deck's
    "Lm == ..." keyword, read_phypar.F semantics).
    """
    f = netcdf_file(path, "r", mmap=False)
    Li = f.dimensions["xi_rho"]
    Mj = f.dimensions["eta_rho"]
    if (Mj, Li) != cfg.shape2d:
        f.close()
        raise ValueError(
            f"grid file {path} is (eta_rho,xi_rho)=({Mj},{Li}) but the "
            f"configuration wants {cfg.shape2d} (Lm={cfg.Lm}, Mm={cfg.Mm})")

    h = _get(f, "h")
    pm = _get(f, "pm")
    pn = _get(f, "pn")
    for name, val in (("h", h), ("pm", pm), ("pn", pn)):
        if val is None:
            f.close()
            raise ValueError(f"grid file {path} lacks required '{name}'")

    spherical = False
    sph = f.variables.get("spherical")
    if sph is not None:
        raw = np.asarray(sph[:]) if sph.shape else np.asarray(sph.getValue())
        if raw.dtype.kind in "SU":
            spherical = bytes(raw).decode().strip().upper() in ("T", "TRUE")
        else:
            spherical = bool(int(raw.flat[0]))

    lon = _get(f, "lon_rho")
    lat = _get(f, "lat_rho")
    x = _get(f, "x_rho")
    y = _get(f, "y_rho")
    fcor = _get(f, "f")
    if fcor is None and lat is not None:
        fcor = 2.0 * 7.2921e-5 * np.sin(np.deg2rad(lat))
    if fcor is None:
        fcor = np.zeros((Mj, Li))

    xr = lon if (spherical and lon is not None) else x
    yr = lat if (spherical and lat is not None) else y
    angler = _get(f, "angle", np.zeros((Mj, Li)))
    rmask = _get(f, "mask_rho", np.ones((Mj, Li)))
    dndx = _get(f, "dndx")
    dmde = _get(f, "dmde")

    xu = _get(f, "lon_u" if spherical else "x_u")
    yu = _get(f, "lat_u" if spherical else "y_u")
    xv = _get(f, "lon_v" if spherical else "x_v")
    yv = _get(f, "lat_v" if spherical else "y_v")

    def pad_u(a):
        # standard staggered files carry xi_u = Lm+1; pad the ghost col 0
        if a is not None and a.shape[-1] == Li - 1:
            a = np.concatenate([a[..., :1], a], axis=-1)
        return a

    def pad_v(a):
        if a is not None and a.shape[-2] == Mj - 1:
            a = np.concatenate([a[..., :1, :], a], axis=-2)
        return a

    xu, yu = pad_u(xu), pad_u(yu)
    xv, yv = pad_v(xv), pad_v(yv)
    # ICESHELF draft (get_grid.F zice branch); all-zero fields are
    # treated as shelf-free so the hot path stays untouched
    zice = _get(f, "zice")
    if zice is not None and not np.any(zice):
        zice = None
    f.close()

    return build_grid(cfg, h=h, pm=pm, pn=pn, f=fcor, xr=xr, yr=yr,
                      xu=xu, yu=yu, xv=xv, yv=yv, angler=angler,
                      rmask=rmask, dndx=dndx, dmde=dmde,
                      spherical=spherical, zice=zice)


def write_grid_netcdf(path: str, cfg: ModelConfig, grid: Grid,
                      title: str = "roms_tpu grid"):
    """Export a Grid as a reference-layout grid file (the inverse of
    get_grid.F's read set), so analytic grids can seed file-based runs
    and external tools can inspect them."""
    Mj, Li = cfg.shape2d
    f = netcdf_file(path, "w", version=2)
    f.type = "ROMS grid file"
    f.title = title
    for d, n in (("xi_rho", Li), ("xi_u", Li), ("xi_v", Li),
                 ("eta_rho", Mj), ("eta_u", Mj), ("eta_v", Mj),
                 ("one", 1)):
        f.createDimension(d, n)

    def put(name, arr, units="", long_name=""):
        arr = np.asarray(arr, np.float64)
        v = f.createVariable(name, "d", ("eta_rho", "xi_rho"))
        if units:
            v.units = units
        if long_name:
            v.long_name = long_name
        v[:] = arr

    sph = f.createVariable("spherical", "i", ("one",))
    sph[:] = np.asarray([1 if grid.spherical else 0], np.int32)
    put("h", grid.h, "meter", "bathymetry at RHO-points")
    put("pm", grid.pm, "meter-1")
    put("pn", grid.pn, "meter-1")
    put("f", grid.f, "second-1", "Coriolis parameter at RHO-points")
    put("angle", grid.angler, "radians")
    put("mask_rho", grid.rmask)
    put("dndx", grid.dndx, "meter")
    put("dmde", grid.dmde, "meter")
    if getattr(grid, "zice", None) is not None:
        put("zice", grid.zice, "meter",
            "depth of ice shelf cavity (negative) at RHO-points")
    if grid.spherical:
        put("lon_rho", grid.xr, "degree_east")
        put("lat_rho", grid.yr, "degree_north")
    else:
        put("x_rho", grid.xr, "meter")
        put("y_rho", grid.yr, "meter")
    f.flush()
    f.close()
