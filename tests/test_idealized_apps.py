"""Idealized application regression tests (the reference's analytical
test-case battery, SURVEY.md 4.1): SOLITON, SEAMOUNT, GRAV_ADJ."""

import numpy as np
import pytest

from roms_tpu.core.main2d import Model2D
from roms_tpu.core.stepping import Model
from roms_tpu.functionals import idealized as ia


class TestSoliton:
    """Equatorial Rossby soliton (2D engine, nondimensional g=1)."""

    def test_westward_propagation_and_shape(self):
        cfg = ia.soliton_config()
        grid = ia.soliton_grid(cfg)
        s0 = ia.soliton_initial(cfg, grid)
        m = Model2D(cfg, grid)
        s = m.run(s0, 400)       # t = 20
        z0 = np.asarray(s0.zeta)[1:-1, 1:-1]
        z = np.asarray(s.zeta)[1:-1, 1:-1]
        assert np.isfinite(z).all()
        # Boyd soliton phase speed ~ -0.4: expect ~8 nondimensional units
        # = 16 cells westward after t=20
        _, i0 = np.unravel_index(np.argmax(z0), z0.shape)
        _, i1 = np.unravel_index(np.argmax(z), z.shape)
        shift = i0 - i1
        assert 12 <= shift <= 20, shift
        # amplitude approximately preserved (first-order soliton sheds
        # a small tail)
        assert 0.7 * z0.max() < z.max() <= 1.05 * z0.max()

    def test_symmetry_about_equator(self):
        """The soliton is symmetric in y; the solution must stay so."""
        cfg = ia.soliton_config()
        grid = ia.soliton_grid(cfg)
        s0 = ia.soliton_initial(cfg, grid)
        m = Model2D(cfg, grid)
        s = m.run(s0, 100)
        z = np.asarray(s.zeta)[1:-1, 1:-1]
        assert np.allclose(z, z[::-1, :], atol=1e-10)


class TestSeamount:
    """Pressure-gradient error over steep topography must stay tiny with
    the splines density Jacobian (SURVEY.md 7: SEAMOUNT is the acid
    test for prsgrd32)."""

    def test_spurious_velocity_small(self):
        cfg = ia.seamount_config()
        grid = ia.seamount_grid(cfg)
        s0 = ia.seamount_initial(cfg, grid)
        m = Model(cfg, grid, ia.zero_forcing(cfg))
        s = m.run(s0, 30)
        umax = np.abs(np.asarray(s.u)).max()
        # resting stratified fluid over a 4500 m seamount: the splines
        # density Jacobian keeps error currents at the published
        # fraction-of-a-mm/s scale (Shchepetkin & McWilliams 2003;
        # measured 2.1e-4 m/s here)
        assert umax < 5.0e-4, umax
        assert np.isfinite(np.asarray(s.u)).all()

    def test_standard_jacobian_scheme(self):
        """prsgrd31 (standard density Jacobian) also keeps pressure-
        gradient error currents bounded; it is less accurate than the
        splines scheme but must stay well below 1 cm/s."""
        cfg = ia.seamount_config().replace(prsgrd="sj")
        grid = ia.seamount_grid(cfg)
        s0 = ia.seamount_initial(cfg, grid)
        m = Model(cfg, grid, ia.zero_forcing(cfg))
        s = m.run(s0, 30)
        umax = np.abs(np.asarray(s.u)).max()
        assert umax < 1.0e-2, umax
        assert np.isfinite(np.asarray(s.u)).all()


class TestGravAdj:
    def test_lock_exchange(self):
        cfg = ia.grav_adj_config(Lm=64, N=20)
        grid = ia.grav_adj_grid(cfg)
        s0 = ia.grav_adj_initial(cfg, grid)
        m = Model(cfg, grid, ia.zero_forcing(cfg))
        s = m.run(s0, 60)
        a = np.asarray
        u = a(s.u)
        T = a(s.t[0])
        assert np.isfinite(u).all()
        # gravity current develops: dense water undercuts light water
        assert 0.02 < np.abs(u).max() < 0.5
        # baroclinic dipole at the front: dense (east) water flows west
        # along the bottom, light water east along the surface
        fr = slice(25, 42)
        u_bot = u[0, 2, fr].min()
        u_top = u[-1, 2, fr].max()
        assert u_bot < -0.02 and u_top > 0.02
        # temperature stays within the initial range (+ small UP3 over/
        # undershoot)
        assert T.min() > cfg.eos.T0 - 0.3
        assert T.max() < cfg.eos.T0 + 5.3


class TestGyres:
    def test_basin_spinup(self):
        """BASIN: wind ramp drives a slow gyre spin-up; stable, bounded."""
        cfg = ia.basin_config(Lm=40, Mm=32, N=8)
        grid = ia.basin_grid(cfg)
        s = Model(cfg, grid, ia.basin_forcing_fn(cfg, grid)).run(
            ia.basin_initial(cfg, grid), 48)
        u = np.asarray(s.u)
        assert np.isfinite(u).all()
        assert 0.0 < np.abs(u).max() < 0.5

    def test_double_gyre_circulation(self):
        """DOUBLE_GYRE: antisymmetric wind -> two counter-rotating gyres
        (opposite-signed zeta extremes north/south)."""
        cfg = ia.double_gyre_config(Lm=30, Mm=60, N=8)
        grid = ia.double_gyre_grid(cfg)
        s = Model(cfg, grid, ia.double_gyre_forcing_fn(cfg, grid)).run(
            ia.double_gyre_initial(cfg, grid), 96)
        z = np.asarray(s.zeta)[1:-1, 1:-1]
        assert np.isfinite(z).all()
        north = z[40:, :].mean()
        south = z[:20, :].mean()
        assert np.isfinite(north) and np.isfinite(south)
        assert np.abs(np.asarray(s.u)).max() < 1.0

    def test_weighted_jacobian_scheme(self):
        """WJ_GRADP (prsgrd31.h WJ branch): the weighted Jacobian cuts
        the SEAMOUNT pressure-gradient error relative to the plain
        standard Jacobian."""
        def run(scheme):
            cfg = ia.seamount_config().replace(prsgrd=scheme)
            grid = ia.seamount_grid(cfg)
            m = Model(cfg, grid, ia.zero_forcing(cfg))
            s = m.run(ia.seamount_initial(cfg, grid), 30)
            return np.abs(np.asarray(s.u)).max()

        u_sj = run("sj")
        u_wj = run("sj_wj")
        assert np.isfinite(u_wj)
        assert u_wj < 1.0e-2
        assert u_wj <= 1.5 * u_sj       # no worse; typically better


class TestPrsgrd40:
    """Finite-volume pressure Jacobian of Lin (1997) (prsgrd40.h)."""

    def test_seamount_error_bounded(self):
        cfg = ia.seamount_config().replace(prsgrd="fv")
        grid = ia.seamount_grid(cfg)
        m = Model(cfg, grid, ia.zero_forcing(cfg))
        s = m.run(ia.seamount_initial(cfg, grid), 30)
        umax = np.abs(np.asarray(s.u)).max()
        assert np.isfinite(np.asarray(s.u)).all()
        # FV scheme is between the standard and splines Jacobians in
        # accuracy over steep terrain
        assert umax < 1.0e-2, umax

    def test_flat_bottom_no_flow(self):
        """Over a flat bottom with level isopycnals every scheme's
        pressure-gradient force is exactly zero -> fluid stays at
        rest to roundoff."""
        cfg = ia.seamount_config().replace(prsgrd="fv")
        grid = ia.seamount_grid(cfg)
        import jax.numpy as jnp
        from roms_tpu.grid.grid import build_grid
        Mj, Li = cfg.shape2d
        flat = build_grid(cfg, h=np.full((Mj, Li), 5000.0),
                          pm=np.asarray(grid.pm), pn=np.asarray(grid.pn),
                          f=np.zeros((Mj, Li)))
        m = Model(cfg, flat, ia.zero_forcing(cfg))
        s = m.run(ia.seamount_initial(cfg, flat), 10)
        assert np.abs(np.asarray(s.u)).max() < 1e-12


class TestPrsgrdQuartic:
    """prsgrd42/prsgrd44 (parabolic-WENO / monotonized-quartic FV)."""

    def _err(self, scheme):
        cfg = ia.seamount_config().replace(prsgrd=scheme)
        grid = ia.seamount_grid(cfg)
        m = Model(cfg, grid, ia.zero_forcing(cfg))
        s = m.run(ia.seamount_initial(cfg, grid), 30)
        u = np.asarray(s.u)
        assert np.isfinite(u).all()
        return np.abs(u).max()

    def test_seamount_error_bounded(self):
        u42 = self._err("q2")
        u44 = self._err("q4")
        # both high-order FV schemes keep SEAMOUNT error currents small
        assert u42 < 1.0e-2, u42
        assert u44 < 1.0e-2, u44

    def test_flat_bottom_exact(self):
        import jax.numpy as jnp
        from roms_tpu.grid.grid import build_grid
        for scheme in ("q2", "q4"):
            cfg = ia.seamount_config().replace(prsgrd=scheme)
            grid = ia.seamount_grid(cfg)
            Mj, Li = cfg.shape2d
            flat = build_grid(cfg, h=np.full((Mj, Li), 5000.0),
                              pm=np.asarray(grid.pm),
                              pn=np.asarray(grid.pn),
                              f=np.zeros((Mj, Li)))
            m = Model(cfg, flat, ia.zero_forcing(cfg))
            s = m.run(ia.seamount_initial(cfg, flat), 5)
            assert np.abs(np.asarray(s.u)).max() < 1e-12, scheme


def test_prsgrd_accuracy_hierarchy():
    """The SEAMOUNT error-current hierarchy matches the scheme design:
    the splines density Jacobian (DJ_GRADPS, the reference default)
    beats the standard Jacobian by ~10x, with the FV/quartic family in
    between (SM03 Table 1 ordering)."""
    def err(scheme):
        cfg = ia.seamount_config().replace(prsgrd=scheme)
        grid = ia.seamount_grid(cfg)
        m = Model(cfg, grid, ia.zero_forcing(cfg))
        s = m.run(ia.seamount_initial(cfg, grid), 30)
        return np.abs(np.asarray(s.u)).max()

    e_djs = err("djs")
    e_sj = err("sj")
    e_q4 = err("q4")
    assert e_djs < 0.3 * e_sj, (e_djs, e_sj)
    assert e_q4 < e_sj, (e_q4, e_sj)
