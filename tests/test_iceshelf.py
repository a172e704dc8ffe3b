"""ICESHELF cavities (WEDDELL application): depressed s-levels over
the reduced water column (set_depth.F zice branches), under-ice
surface conditions (set_vbc.F:423-560), and the WEDDELL / COUPLING_TEST
application factories end-to-end."""

import numpy as np
import pytest

import jax.numpy as jnp

from roms_tpu.core.stepping import Model
from roms_tpu.functionals import idealized
from roms_tpu.grid.depth import set_depth

pytestmark = pytest.mark.quick


@pytest.fixture(scope="module")
def weddell():
    cfg = idealized.weddell_config(Lm=60, Mm=8, N=8)
    grid = idealized.weddell_grid(cfg)
    return cfg, grid


class TestIceShelfDepth:
    def test_surface_depressed_under_ice(self, weddell):
        cfg, grid = weddell
        zeta = jnp.zeros(cfg.shape2d, cfg.dtype)
        z_r, z_w, Hz = set_depth(grid, zeta)
        zice = np.asarray(grid.zice)
        # top interface sits at -|zice| (+zeta), bottom at -h
        np.testing.assert_allclose(np.asarray(z_w[-1]), -np.abs(zice),
                                   atol=1e-10)
        np.testing.assert_allclose(np.asarray(z_w[0]),
                                   -np.asarray(grid.h), atol=1e-10)
        # water column thickness = h - |zice|
        np.testing.assert_allclose(
            np.asarray(jnp.sum(Hz, axis=0)),
            np.asarray(grid.h) - np.abs(zice), rtol=1e-12)

    def test_zeta_still_moves_surface(self, weddell):
        cfg, grid = weddell
        zeta = jnp.full(cfg.shape2d, 0.3, cfg.dtype)
        _, z_w, _ = set_depth(grid, zeta)
        np.testing.assert_allclose(
            np.asarray(z_w[-1]),
            0.3 - np.abs(np.asarray(grid.zice)), atol=1e-10)

    def test_shelf_free_grid_unchanged(self):
        from roms_tpu.functionals import upwelling
        cfg = upwelling.make_config(Lm=16, Mm=8, N=6, dtype="float64")
        grid = upwelling.make_grid(cfg)
        assert grid.zice is None
        zeta = jnp.zeros(cfg.shape2d, cfg.dtype)
        _, z_w, _ = set_depth(grid, zeta)
        np.testing.assert_allclose(np.asarray(z_w[-1]), 0.0,
                                   atol=1e-12)


class TestUnderIceSurfaceBC:
    def test_fluxes_zeroed_and_stress_replaced(self, weddell):
        from roms_tpu.core.set_vbc import apply_iceshelf
        from roms_tpu.core.state import Forcing
        cfg, grid = weddell
        s = idealized.weddell_initial(cfg, grid)
        u = s.u + 0.1
        v = s.v - 0.05
        Mj, Li = cfg.shape2d
        f0 = Forcing(
            sustr=jnp.full((Mj, Li), 1e-4, cfg.dtype),
            svstr=jnp.full((Mj, Li), 2e-4, cfg.dtype),
            stflx=jnp.full((cfg.NT, Mj, Li), 1e-5, cfg.dtype),
            btflx=jnp.zeros((cfg.NT, Mj, Li), cfg.dtype),
            srflx=jnp.full((Mj, Li), 1e-5, cfg.dtype))
        out = apply_iceshelf(cfg, grid, u, v, s.z_r, s.z_w, f0)
        under = np.asarray(grid.zice) != 0.0
        assert np.all(np.asarray(out.stflx)[:, under] == 0.0)
        assert np.all(np.asarray(out.srflx)[under] == 0.0)
        # open-ocean values untouched
        assert np.all(np.asarray(out.srflx)[~under] == 1e-5)
        # under-ice stress opposes the top-level flow (quadratic drag)
        uu = under & np.roll(under, 1, axis=-1)
        sustr = np.asarray(out.sustr)
        assert np.all(sustr[uu] < 0.0)          # u > 0 -> drag < 0
        assert np.all(np.asarray(out.sustr)[~uu] == 1e-4)


def test_weddell_runs_stable():
    cfg = idealized.weddell_config(Lm=60, Mm=8, N=8, dt=30.0,
                                   ndtfast=10)
    grid = idealized.weddell_grid(cfg)
    s = idealized.weddell_initial(cfg, grid)
    m = Model(cfg, grid,
              forcing_fn=lambda t: idealized.zero_forcing(cfg)(t),
              obc_fn=idealized.weddell_obc_fn(cfg, grid))
    s = m.run(s, 10)
    assert np.isfinite(np.asarray(s.zeta)).all()
    assert np.isfinite(np.asarray(s.u)).all()
    # the tidal boundary actually drives flow
    assert np.abs(np.asarray(s.ubar)).max() > 1e-6


def test_coupling_test_runs():
    cfg = idealized.coupling_test_config(Lm=12, Mm=12, N=8)
    grid = idealized.coupling_test_grid(cfg)
    s = idealized.coupling_test_initial(cfg, grid)
    m = Model(cfg, grid,
              forcing_fn=idealized.zero_forcing(cfg))
    s2 = m.run(s, 5)
    assert np.isfinite(np.asarray(s2.t)).all()
    # stratification preserved at rest
    assert np.asarray(s2.t)[0, -1].mean() > np.asarray(s2.t)[0, 0].mean()


def test_weddell_grid_file_roundtrip(tmp_path):
    """zice survives the grid NetCDF writer/loader (get_grid.F zice
    branch), so file-driven ice-shelf decks work."""
    from roms_tpu.io.grid_nc import load_grid_netcdf, write_grid_netcdf
    cfg = idealized.weddell_config(Lm=60, Mm=8, N=8)
    grid = idealized.weddell_grid(cfg)
    p = str(tmp_path / "weddell_grd.nc")
    write_grid_netcdf(p, cfg, grid)
    g2 = load_grid_netcdf(p, cfg)
    np.testing.assert_allclose(np.asarray(g2.zice),
                               np.asarray(grid.zice), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(g2.h), np.asarray(grid.h),
                               rtol=1e-12)
    # shelf-free grids keep zice None through the roundtrip
    from roms_tpu.functionals import upwelling
    cfg2 = upwelling.make_config(Lm=16, Mm=8, N=6, dtype="float64")
    gu = upwelling.make_grid(cfg2)
    p2 = str(tmp_path / "upw_grd.nc")
    write_grid_netcdf(p2, cfg2, gu)
    assert load_grid_netcdf(p2, cfg2).zice is None
