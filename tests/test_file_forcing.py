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


def test_multifile_chaining(tmp_path):
    """get_data.F multi-file behavior: records from successive files
    are concatenated and time-sorted into one series."""
    import os
    import numpy as np
    from scipy.io import netcdf_file
    from roms_tpu.io.forcing import load_forcing_multifile

    def write(path, times, vals):
        f = netcdf_file(path, "w", version=2)
        f.createDimension("ocean_time", None)
        f.createDimension("y", 3)
        f.createDimension("x", 4)
        vt = f.createVariable("ocean_time", "d", ("ocean_time",))
        vv = f.createVariable("sustr", "d", ("ocean_time", "y", "x"))
        for i, (t, v) in enumerate(zip(times, vals)):
            vt[i] = t
            vv[i] = np.full((3, 4), v)
        f.flush(); f.close()

    p1 = os.path.join(tmp_path, "f1.nc")
    p2 = os.path.join(tmp_path, "f2.nc")
    write(p1, [0.0, 100.0], [1.0, 2.0])
    write(p2, [200.0, 300.0], [3.0, 4.0])
    fields = load_forcing_multifile([p2, p1], {"sustr": "sustr"})
    tsf = fields["sustr"]
    np.testing.assert_array_equal(np.asarray(tsf.times),
                                  [0.0, 100.0, 200.0, 300.0])
    # interpolation across the file boundary
    v = np.asarray(tsf.at(150.0))
    np.testing.assert_allclose(v, 2.5)
