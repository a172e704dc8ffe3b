"""LAKE_JERSEY (SSW-BBL + sediment lake) and TEST_HEAD (WEC + tidal
inlet + wet/dry) applications, plus the FRCNAME surface-wave data path
(get_data.F wave branch -> io/forcing.py)."""

import os
import tempfile

import numpy as np
import pytest

import jax.numpy as jnp

pytestmark = pytest.mark.quick


def _write_wave_frc(path, cfg, hwave=0.8):
    """Minimal wave forcing file (Hwave/Dwave/Pwave_bot/Lwave on
    wave_time)."""
    from scipy.io import netcdf_file
    Mj, Li = cfg.shape2d
    f = netcdf_file(path, "w", version=2)
    f.createDimension("wave_time", 2)
    f.createDimension("eta_rho", Mj)
    f.createDimension("xi_rho", Li)
    t = f.createVariable("wave_time", "d", ("wave_time",))
    t[:] = np.array([0.0, 86400.0])
    t.units = "seconds"
    for name, val in (("Hwave", hwave), ("Dwave", 0.3),
                      ("Pwave_bot", 9.0), ("Lwave", 60.0)):
        v = f.createVariable(name, "d",
                             ("wave_time", "eta_rho", "xi_rho"))
        v[:] = np.full((2, Mj, Li), val)
    f.flush()
    f.close()


def test_wave_forcing_file_ingest(tmp_path):
    from roms_tpu.functionals import idealized
    from roms_tpu.io.forcing import (has_wave_fields, load_forcing_auto,
                                     make_file_wave_fn)
    cfg = idealized.lake_jersey_config(Lm=16, Mm=12, N=4)
    p = str(tmp_path / "waves.nc")
    _write_wave_frc(p, cfg, hwave=0.8)
    fields = load_forcing_auto([p], cfg)
    assert has_wave_fields(fields)
    Hw, Dw, Pw = make_file_wave_fn(cfg, fields, "bbl")(1000.0)
    assert float(Hw[2, 2]) == pytest.approx(0.8)
    assert float(Pw[2, 2]) == pytest.approx(9.0)
    _, _, Lw = make_file_wave_fn(cfg, fields, "wec")(1000.0)
    assert float(Lw[2, 2]) == pytest.approx(60.0)


def test_lake_jersey_runs_with_bbl():
    from roms_tpu.core.bbl import initial_bbl
    from roms_tpu.core.stepping import Model
    from roms_tpu.functionals import idealized
    cfg = idealized.lake_jersey_config(Lm=24, Mm=16, N=5)
    grid = idealized.lake_jersey_grid(cfg)
    s = idealized.lake_jersey_initial(cfg, grid)._replace(
        bbl=initial_bbl(cfg))
    ex = idealized.lake_jersey_extras(cfg, grid)
    m = Model(cfg, grid, idealized.lake_jersey_forcing_fn(cfg, grid),
              **ex)
    s = m.run(s, 6)
    assert np.isfinite(np.asarray(s.zeta)).all()
    # wind drives circulation inside the masked lake only
    u = np.asarray(s.ubar) * np.asarray(grid.umask)
    assert np.abs(u).max() > 1e-6
    assert np.abs(np.asarray(s.ubar)
                  * (1 - np.asarray(grid.umask))).max() == 0.0


def test_test_head_tidal_inlet_runs():
    from roms_tpu.core.stepping import Model
    from roms_tpu.functionals import idealized
    cfg = idealized.test_head_config(Lm=40, Mm=30, N=5)
    grid = idealized.test_head_grid(cfg)
    s = idealized.test_head_initial(cfg, grid)
    ex = idealized.test_head_extras(cfg, grid)
    m = Model(cfg, grid, idealized.zero_forcing(cfg), **ex)
    s = m.run(s, 30)
    assert np.isfinite(np.asarray(s.zeta)).all()
    # tide floods through the inlet into the back bay
    jbar = cfg.shape2d[0] // 3
    bay = np.asarray(s.zeta)[jbar + 2:, :] * \
        np.asarray(grid.rmask)[jbar + 2:, :]
    assert np.abs(bay).max() > 1e-4


def test_lake_jersey_deck_end_to_end(capsys):
    """Deck + SPARNAM sediment + analytic SSW-BBL waves."""
    from roms_tpu.__main__ import main
    with tempfile.TemporaryDirectory() as d:
        spar = os.path.join(d, "sediment.in")
        with open(spar, "w") as fh:
            fh.write("""
 Lsediment == T
 SAND_SD50 == 0.5d0
 SAND_CSED == 0.1d0
 SAND_SRHO == 2650.0d0
 SAND_WSED == 0.5d0
 SAND_ERATE == 5.0d-4
 SAND_TAU_CE == 0.05d0
 SAND_POROS == 0.5d0
""")
        deck = os.path.join(d, "roms_lake_jersey.in")
        with open(deck, "w") as fh:
            fh.write(f"""
TITLE = lake jersey analytic fallback
MyAppCPP == LAKE_JERSEY
Lm == 24
Mm == 16
N == 5
NTIMES == 3
DT == 30.0d0
NDTFAST == 10
NRREC == 0
SPARNAM == {spar}
NHIS == 0
NRST == 0
NINFO == 0
""")
        rc = main([deck, "--outdir", d, "--dtype", "float64"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "sediment from" in out and "NT=3" in out


def test_test_head_deck_with_wave_file(capsys, tmp_path):
    """TEST_HEAD deck with an FRCNAME wave file: the WEC hook rebinds
    onto the file wave field (SWAN_COUPLING's standalone stand-in)."""
    from roms_tpu.__main__ import main
    from roms_tpu.functionals import idealized
    cfg = idealized.test_head_config(Lm=40, Mm=30, N=5)
    wav = str(tmp_path / "waves.nc")
    _write_wave_frc(wav, cfg, hwave=0.6)
    deck = str(tmp_path / "roms_test_head.in")
    with open(deck, "w") as fh:
        fh.write(f"""
TITLE = test head inlet
MyAppCPP == TEST_HEAD
Lm == 40
Mm == 30
N == 5
NTIMES == 3
DT == 20.0d0
NDTFAST == 10
NRREC == 0
FRCNAME == {wav}
NHIS == 0
NRST == 0
NINFO == 0
""")
    rc = main([deck, "--outdir", str(tmp_path), "--dtype", "float64"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "WEC wave field from" in out
