"""I/O tests: NetCDF history stream and perfect restart."""

import os

import numpy as np
import pytest

from roms_tpu.core.stepping import Model
from roms_tpu.functionals import upwelling
from roms_tpu.io.netcdf import HistoryWriter
from roms_tpu.io.restart import load_checkpoint, save_checkpoint


@pytest.fixture(scope="module")
def small():
    cfg = upwelling.make_config(Lm=16, Mm=18, N=8, dtype="float64")
    grid = upwelling.make_grid(cfg)
    state = upwelling.make_initial(cfg, grid)
    model = Model(cfg, grid, upwelling.make_forcing_fn(cfg, grid),
                  upwelling.make_vmix_fn(cfg))
    return cfg, grid, state, model


class TestHistory:
    def test_write_and_readback(self, small, tmp_path):
        cfg, grid, state, model = small
        path = str(tmp_path / "his.nc")
        w = HistoryWriter(path, cfg, grid)
        s = state
        for _ in range(3):
            s = model.step(s)
            w.write(s)
        w.close()

        from scipy.io import netcdf_file
        f = netcdf_file(path, "r")
        assert f.variables["ocean_time"].shape[0] == 3
        z = f.variables["zeta"][:]
        assert z.shape == (3,) + cfg.shape2d
        np.testing.assert_allclose(z[-1], np.asarray(s.zeta), rtol=2e-7,
                                   atol=1e-10)
        assert f.variables["temp"].shape == (3, cfg.N) + cfg.shape2d
        # vertical coordinate metadata round-trips
        np.testing.assert_allclose(f.variables["Cs_w"][:],
                                   np.asarray(grid.Cs_w))
        f.close()


class TestPerfectRestart:
    def test_bitwise_restart(self, small, tmp_path):
        """The regression methodology of the reference (PERFECT_RESTART,
        SURVEY.md 4.4): stop/restart must be bit-identical."""
        cfg, grid, state, model = small
        s = model.run(state, 5)
        path = str(tmp_path / "rst.npz")
        save_checkpoint(path, s)

        cont = model.run(s, 5)
        restored = load_checkpoint(path, s)
        resumed = model.run(restored, 5)

        for name in ("zeta", "ubar", "vbar", "u", "v", "t", "t_prev",
                     "ru_prev", "ru_prev2"):
            a = np.asarray(getattr(cont, name))
            b = np.asarray(getattr(resumed, name))
            assert np.array_equal(a, b), name


def test_extract_writer(tmp_path):
    """Grid extraction stream: a strided subdomain of the history
    fields, dimensions and values consistent with the parent."""
    import os
    import numpy as np
    from scipy.io import netcdf_file
    from roms_tpu.io.netcdf import ExtractWriter
    from roms_tpu.functionals import upwelling
    cfg = upwelling.make_config(Lm=20, Mm=24, N=6, dtype="float64")
    grid = upwelling.make_grid(cfg)
    s = upwelling.make_initial(cfg, grid)
    path = os.path.join(tmp_path, "ext.nc")
    w = ExtractWriter(path, cfg, grid, i0=4, j0=6, Le=8, Me=10,
                      stride=2)
    w.write(s)
    w.close()
    f = netcdf_file(path, "r", mmap=False)
    T = np.asarray(f.variables["temp"][0])
    assert T.shape == (cfg.N, 10, 8)
    expect = np.asarray(s.t[0])[:, 6:26:2, 4:20:2]
    np.testing.assert_allclose(T, expect.astype(np.float32), rtol=1e-6)
    f.close()


def test_interp_extract_writer():
    """Interpolated extraction grid (GRID_EXTRACT ExtractFlag<0):
    records sampled onto an arbitrary rectilinear target grid must
    reproduce a linear field exactly."""
    import jax.numpy as jnp
    import numpy as np
    from roms_tpu.functionals import upwelling
    from roms_tpu.io.netcdf import InterpExtractWriter
    cfg = upwelling.make_config(Lm=24, Mm=20, N=4, dtype="float64")
    grid = upwelling.make_grid(cfg)
    s = upwelling.make_initial(cfg, grid)
    xr = np.asarray(grid.xr)
    yr = np.asarray(grid.yr)
    # linear zeta in physical coordinates
    zlin = 1e-4 * xr + 2e-4 * yr
    s = s._replace(zeta=jnp.asarray(zlin))
    # coarser off-lattice target inside the domain
    tx = np.linspace(xr[2, 3], xr[2, -4], 9)
    ty = np.linspace(yr[3, 2], yr[-4, 2], 7)
    import tempfile, os
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "xtr.nc")
        w = InterpExtractWriter(path, cfg, grid, tx, ty,
                                fields=("zeta",))
        w.write(s)
        w.close()
        from scipy.io import netcdf_file
        f = netcdf_file(path, "r", mmap=False)
        z = np.asarray(f.variables["zeta"][0], np.float64)
        want = 1e-4 * tx[None, :] + 2e-4 * ty[:, None]
        np.testing.assert_allclose(z, want, rtol=1e-6)
        f.close()
