"""Reference-layout NetCDF restart: bit-exact resume + interchange names.

The reference's PERFECT_RESTART regression (wrt_rst.F:43,142-178 +
get_state.F:89-157) is: stop, restart from the RST file, and the
continued run equals the uninterrupted one bitwise.  Same contract here,
through the reference-compatible NetCDF layout (not npz).
"""

import os
import tempfile

import numpy as np
import pytest

from roms_tpu.core import stepping
from roms_tpu.functionals import upwelling
from roms_tpu.io.rst_netcdf import RestartWriter, read_restart


@pytest.fixture(scope="module")
def model():
    cfg = upwelling.make_config(Lm=16, Mm=18, N=8)
    grid = upwelling.make_grid(cfg)
    state = upwelling.make_initial(cfg, grid)
    m = stepping.Model(cfg, grid,
                       forcing_fn=upwelling.make_forcing_fn(cfg, grid))
    return cfg, grid, state, m


def test_perfect_restart_bitwise(model):
    cfg, grid, s0, m = model
    s = s0
    for _ in range(3):
        s = m.step(s)

    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "rst.nc")
        w = RestartWriter(path, cfg, grid, cycle=2, checksum="crc32")
        w.write(s0)          # record 0 (ensures cycling is exercised)
        w.write(s)           # record 1 = the resume point
        w.close()
        s_resumed = read_restart(path, cfg, grid, template=s)

    # every consumed leaf equal bitwise before stepping
    for name in ("zeta", "u", "v", "t", "t_prev", "ru_prev", "Hz",
                 "z_w", "ru0_prev2"):
        a = np.asarray(getattr(s, name))
        b = np.asarray(getattr(s_resumed, name))
        assert a.dtype == b.dtype, name
        assert np.array_equal(a, b), name
    if s.mix is not None:
        assert np.array_equal(np.asarray(s.mix.tke),
                              np.asarray(s_resumed.mix.tke))
        assert np.array_equal(np.asarray(s.mix.Akt),
                              np.asarray(s_resumed.mix.Akt))

    a = m.step(s)
    b = m.step(s_resumed)
    for name in ("zeta", "ubar", "vbar", "u", "v", "t"):
        x = np.asarray(getattr(a, name))
        y = np.asarray(getattr(b, name))
        assert np.array_equal(x, y), f"{name} diverged after restart"


def test_reference_layout_names(model):
    """The interchange surface: reference variable names, C-grid dims,
    unlimited ocean_time — readable by Fortran-side tooling."""
    from scipy.io import netcdf_file
    cfg, grid, s0, m = model
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "rst.nc")
        w = RestartWriter(path, cfg, grid)
        w.write(s0)
        w.close()
        f = netcdf_file(path, "r", mmap=False)
        assert f.type.decode().startswith("ROMS/TOMS restart")
        v = f.variables["temp"]
        assert v.dimensions == ("ocean_time", "s_rho", "eta_rho",
                                "xi_rho")
        assert f.variables["u"].dimensions == (
            "ocean_time", "s_rho", "eta_u", "xi_u")
        assert f.variables["zeta"].shape[1:] == cfg.shape2d
        assert int(f.dimensions["s_w"]) == cfg.N + 1
        f.close()


def test_cycling_keeps_two_records(model):
    cfg, grid, s0, m = model
    s1 = m.step(s0)
    s2 = m.step(s1)
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "rst.nc")
        w = RestartWriter(path, cfg, grid, cycle=2)
        for st in (s0, s1, s2):     # third write overwrites record 0
            w.write(st)
        w.close()
        s_back = read_restart(path, cfg, grid, template=s2)
        # latest record (iic max) is s2 even though it sits in slot 0
        assert int(np.asarray(s_back.iic)) == int(np.asarray(s2.iic))
        assert np.array_equal(np.asarray(s_back.zeta),
                              np.asarray(s2.zeta))


def test_restart_with_turbulence_and_checksum():
    """GLS runs carry MixState; restart with checksums must cover the
    mix_* variables too (regression: KeyError on mix checksum vars)."""
    from roms_tpu.functionals import benchmark
    cfg = benchmark.make_config(Lm=12, Mm=10, N=6)
    import dataclasses
    cfg = cfg.replace(mixing=dataclasses.replace(cfg.mixing,
                                                 vmix="gls"))
    grid = benchmark.make_grid(cfg)
    s0 = benchmark.make_initial(cfg, grid)
    m = stepping.Model(cfg, grid,
                       forcing_fn=benchmark.make_forcing_fn(cfg, grid))
    s = m.step(s0)
    assert s.mix is not None
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "rst.nc")
        w = RestartWriter(path, cfg, grid, checksum="crc32")
        w.write(s)
        w.close()
        s2 = read_restart(path, cfg, grid, template=s)
        assert np.array_equal(np.asarray(s.mix.tke),
                              np.asarray(s2.mix.tke))
        a, b = m.step(s), m.step(s2)
        assert np.array_equal(np.asarray(a.t), np.asarray(b.t))
