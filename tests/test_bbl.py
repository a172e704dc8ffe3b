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


class TestSGBBL:
    """Styles & Glenn (2000) closure (sg_bbl.h)."""

    def _setup(self):
        import jax.numpy as jnp
        from roms_tpu.core.bbl import BBLConfig, initial_bbl, sg_bbl
        from roms_tpu.functionals import upwelling
        cfg = upwelling.make_config(Lm=12, Mm=12, N=8, dtype="float64")
        grid = upwelling.make_grid(cfg)
        s0 = upwelling.make_initial(cfg, grid)
        u = jnp.full_like(s0.u, 0.2)
        v = jnp.zeros_like(s0.v)
        Hw = jnp.full(cfg.shape2d, 1.5)
        Dw = jnp.zeros(cfg.shape2d)
        Pw = jnp.full(cfg.shape2d, 8.0)
        return cfg, grid, s0, u, v, Hw, Dw, Pw

    def test_kelvin_functions(self):
        """Kelvin ber/ker values against Abramowitz & Stegun tables:
        ber(2)=0.75173, bei(2)=0.97229, ker(2)=-0.04166,
        kei(2)=-0.20240."""
        import jax.numpy as jnp
        from roms_tpu.core.bbl import _kelvin
        x = jnp.asarray(2.0, jnp.float64)
        ber, bei, ker, kei, _, _, _, _ = _kelvin(x)
        assert abs(float(ber) - 0.75173) < 2e-4
        assert abs(float(bei) - 0.97229) < 2e-4
        assert abs(float(ker) - (-0.04166)) < 2e-4
        assert abs(float(kei) - (-0.20240)) < 2e-4
        # the decaying ker/kei pair (what the stress relation uses at
        # moderate znotp) stays finite and small across the x=8 seam;
        # ber/bei grow exponentially and the reference's own A&S series
        # carry percent-level seam error, so only sanity-check them
        lo = _kelvin(jnp.asarray(7.99, jnp.float64))
        hi = _kelvin(jnp.asarray(8.01, jnp.float64))
        for a, b in zip(lo[2:4], hi[2:4]):
            assert abs(float(a)) < 0.01 and abs(float(b)) < 0.01
        assert float(lo[0]) > 0 and float(hi[0]) > 0

    def test_wave_enhancement(self):
        """Combined wave-current stress exceeds the pure-current
        stress, and tauCWmax >= tauC (the defining property of a
        wave-current BBL)."""
        import numpy as np
        from roms_tpu.core.bbl import BBLConfig, initial_bbl, sg_bbl
        cfg, grid, s0, u, v, Hw, Dw, Pw = self._setup()
        bblc = BBLConfig()
        out = sg_bbl(cfg, bblc, grid, initial_bbl(cfg), u, v,
                     jnp.zeros(cfg.shape2d) + 25.0, s0.z_r, s0.z_w,
                     Hw, Dw, Pw)
        interior = np.s_[3:-3, 3:-3]
        bustr = np.asarray(out.bustr)[interior]
        tmax = np.asarray(out.tauCWmax)[interior]
        assert np.isfinite(bustr).all() and np.isfinite(tmax).all()
        assert (tmax >= 0.0).all()
        assert bustr.mean() > 0.0         # stress opposes +u flow sign
        # with waves the max combined stress clearly exceeds the plain
        # quadratic-drag current stress
        plain = 3.0e-3 * 0.2 ** 2
        assert tmax.mean() > plain, (tmax.mean(), plain)

    def test_no_waves_reduces_to_log_drag(self):
        """Hwave -> 0: stress approaches the pure log-profile current
        drag."""
        import numpy as np
        from roms_tpu.core.bbl import BBLConfig, initial_bbl, sg_bbl
        cfg, grid, s0, u, v, Hw, Dw, Pw = self._setup()
        bblc = BBLConfig()
        out = sg_bbl(cfg, bblc, grid, initial_bbl(cfg), u, v,
                     jnp.zeros(cfg.shape2d) + 25.0, s0.z_r, s0.z_w,
                     0.001 * Hw, Dw, Pw)
        interior = np.s_[3:-3, 3:-3]
        tauc = np.asarray(out.bustr)[interior]
        # log-profile drag for u=0.2 at Zr with Zob: same order
        assert np.isfinite(tauc).all()
        assert 1e-6 < np.abs(tauc).mean() < 1e-2
