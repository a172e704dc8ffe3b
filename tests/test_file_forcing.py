"""File-based forcing ingest + time interpolation (get_data/set_data)."""

import numpy as np
import pytest

from roms_tpu.core.stepping import Model
from roms_tpu.functionals import upwelling
from roms_tpu.io.forcing import (TimeSeriesField, load_forcing_netcdf,
                                 make_file_forcing_fn)


def test_time_interpolation_and_cycle():
    times = np.array([0.0, 100.0, 200.0])
    vals = np.stack([np.full((4, 4), v) for v in (0.0, 1.0, 3.0)])
    f = TimeSeriesField(times, vals, cycle=200.0)
    assert float(f.at(50.0)[0, 0]) == pytest.approx(0.5)
    assert float(f.at(150.0)[0, 0]) == pytest.approx(2.0)
    assert float(f.at(250.0)[0, 0]) == pytest.approx(0.5)   # cyclic


def test_netcdf_roundtrip_and_model_run(tmp_path):
    cfg = upwelling.make_config(Lm=12, Mm=12, N=6, dtype="float64")
    grid = upwelling.make_grid(cfg)
    Mj, Li = cfg.shape2d

    # write a forcing file (two wind snapshots ramping up)
    from scipy.io import netcdf_file
    path = str(tmp_path / "frc.nc")
    f = netcdf_file(path, "w")
    f.createDimension("ocean_time", None)
    f.createDimension("eta_u", Mj)
    f.createDimension("xi_u", Li)
    vt = f.createVariable("ocean_time", "d", ("ocean_time",))
    vs = f.createVariable("sustr", "d", ("ocean_time", "eta_u", "xi_u"))
    vt[0], vt[1] = 0.0, 86400.0
    vs[0] = np.zeros((Mj, Li))
    vs[1] = np.full((Mj, Li), -1e-4)
    f.flush(); f.close()

    fields = load_forcing_netcdf(path, {"sustr": "sustr"})
    forcing_fn = make_file_forcing_fn(cfg, fields)
    st = upwelling.make_initial(cfg, grid)
    m = Model(cfg, grid, forcing_fn, upwelling.make_vmix_fn(cfg))
    s = m.run(st, 10)
    assert np.isfinite(np.asarray(s.u)).all()
    # the ramping westward wind must have accelerated a westward jet
    assert np.asarray(s.u[-1])[1:-1, 1:-1].mean() < 0.0
