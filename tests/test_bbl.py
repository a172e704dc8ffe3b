"""Wave-current bottom boundary layer (BBL/mb_bbl.h, Soulsby 1995/97)."""

import jax.numpy as jnp
import numpy as np
import pytest

from roms_tpu.core import bbl as bbl_mod
from roms_tpu.core.stepping import Model
from roms_tpu.functionals import upwelling
from roms_tpu.grid.depth import set_depth


@pytest.fixture(scope="module")
def setup():
    cfg = upwelling.make_config(dtype="float64")
    grid = upwelling.make_grid(cfg)
    s0 = upwelling.make_initial(cfg, grid)
    z_r, z_w, Hz = set_depth(grid, s0.zeta)
    return cfg, grid, s0, z_r, z_w


def _call(cfg, grid, s0, z_r, z_w, Hwave, u_extra=0.1):
    shp = cfg.shape2d
    return bbl_mod.mb_bbl(
        cfg, bbl_mod.BBLConfig(), grid, bbl_mod.initial_bbl(cfg),
        s0.u + u_extra, s0.v, jnp.full(shp, 25.0), z_r, z_w,
        jnp.full(shp, Hwave), jnp.zeros(shp), jnp.full(shp, 8.0))


class TestMbBBL:
    def test_waves_enhance_stress(self, setup):
        """Soulsby combined stress exceeds the current-only stress and
        grows with wave height (mb_bbl.h:398-420)."""
        cfg, grid, s0, z_r, z_w = setup
        t1 = _call(cfg, grid, s0, z_r, z_w, 1.0)
        t3 = _call(cfg, grid, s0, z_r, z_w, 3.0)
        active = np.asarray(t3.Ab) > 0.2        # wave-affected cells
        assert active.any()
        a1 = np.asarray(t1.tauCWmax)[active]
        a3 = np.asarray(t3.tauCWmax)[active]
        assert a3.mean() > a1.mean()            # taller waves -> more
        assert np.isfinite(a3).all()

    def test_stress_opposes_current(self, setup):
        """bustr has the sign of the bottom current (drag, not thrust)."""
        cfg, grid, s0, z_r, z_w = setup
        out = _call(cfg, grid, s0, z_r, z_w, 2.0, u_extra=0.2)
        bu = np.asarray(out.bustr)[2:-2, 2:-2]
        assert (bu > 0).all()      # current +0.2 everywhere -> tau > 0

    def test_ripple_regimes(self, setup):
        """Sheet-flow (huge stress) flattens ripples; weak flow leaves
        them unchanged (Li & Amos 2001 regimes, mb_bbl.h:449-491)."""
        cfg, grid, s0, z_r, z_w = setup
        # enormous current -> stress > tau_up -> plane bed
        strong = _call(cfg, grid, s0, z_r, z_w, 4.0, u_extra=5.0)
        assert np.asarray(strong.state.rhgt)[2:-2, 2:-2].max() < 1e-6
        # nearly quiescent: ripples persist at their previous geometry
        calm = _call(cfg, grid, s0, z_r, z_w, 0.0, u_extra=0.0)
        assert np.allclose(np.asarray(calm.state.rhgt), 0.01)

    def test_model_integration(self, setup):
        """Model runs stably with the BBL closure as bottom stress."""
        cfg, grid, s0, _, _ = setup
        shp = cfg.shape2d

        def wave_fn(t):
            return (jnp.full(shp, 2.0), jnp.zeros(shp),
                    jnp.full(shp, 8.0))

        s0b = s0._replace(bbl=bbl_mod.initial_bbl(cfg))
        m = Model(cfg, grid, upwelling.make_forcing_fn(cfg, grid),
                  vmix_fn=upwelling.make_vmix_fn(cfg),
                  bbl_fn=bbl_mod.make_bbl_fn(
                      cfg, bbl_mod.BBLConfig(), grid, wave_fn))
        s = m.run(s0b, 20)
        assert np.isfinite(np.asarray(s.u)).all()
        assert np.isfinite(np.asarray(s.bbl.rhgt)).all()


class TestSSWBBL:
    def test_madsen94_limits(self, setup):
        """Madsen 94: no waves -> log-law current stress; waves
        enhance the combined friction velocity above the pure-current
        value."""
        import jax.numpy as jnp
        from roms_tpu.core.bbl import madsen94
        shp = (4, 4)
        zr = jnp.full(shp, 1.0)
        kN = jnp.full(shp, 0.01)
        ucr = jnp.full(shp, 0.3)
        phiwc = jnp.zeros(shp)
        # no waves
        uc0, uw0, ur0, fw0, zoa0 = madsen94(
            jnp.zeros(shp), jnp.full(shp, 0.8), ucr, zr, phiwc, kN)
        expect = 0.3 * 0.41 / np.log(1.0 / (0.01 / 30.0))
        np.testing.assert_allclose(np.asarray(uc0), expect, rtol=1e-6)
        assert float(np.asarray(uw0).max()) == 0.0
        # strong waves
        uc1, uw1, ur1, fw1, zoa1 = madsen94(
            jnp.full(shp, 0.5), jnp.full(shp, 0.8), ucr, zr, phiwc,
            kN)
        assert float(np.asarray(ur1).min()) > float(np.asarray(ur0).max())
        assert float(np.asarray(uw1).min()) > 0.0
        assert np.isfinite(np.asarray(zoa1)).all()
        # apparent roughness exceeds physical roughness under waves
        assert float(np.asarray(zoa1).min()) > 0.01 / 30.0

    def test_ssw_model_integration(self, setup):
        import jax.numpy as jnp
        from roms_tpu.core import bbl as bbl_mod
        from roms_tpu.core.stepping import Model
        from roms_tpu.functionals import upwelling
        cfg, grid, s0, _, _ = setup
        shp = cfg.shape2d

        def wave_fn(t):
            return (jnp.full(shp, 2.0), jnp.zeros(shp),
                    jnp.full(shp, 8.0))

        m = Model(cfg, grid, upwelling.make_forcing_fn(cfg, grid),
                  vmix_fn=upwelling.make_vmix_fn(cfg),
                  bbl_fn=bbl_mod.make_ssw_bbl_fn(
                      cfg, bbl_mod.BBLConfig(), grid, wave_fn))
        s = m.run(s0._replace(bbl=bbl_mod.initial_bbl(cfg)), 20)
        assert np.isfinite(np.asarray(s.u)).all()
