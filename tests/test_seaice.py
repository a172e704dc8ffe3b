"""Sea ice: EVP dynamics + zero-layer thermodynamics + frazil
(ROMS/Nonlinear/SeaIce/)."""

import jax.numpy as jnp
import numpy as np
import pytest

from roms_tpu.core import seaice
from roms_tpu.core.stepping import Model
from roms_tpu.functionals import upwelling


@pytest.fixture(scope="module")
def setup():
    cfg = upwelling.make_config(dtype="float64")
    grid = upwelling.make_grid(cfg)
    s0 = upwelling.make_initial(cfg, grid)
    t = np.asarray(s0.t).copy()
    t[0] = -1.8        # near freezing (t_fr = -0.0543*32 = -1.74)
    t[1] = 32.0
    s0 = s0._replace(t=jnp.asarray(t), t_prev=jnp.asarray(t))
    return cfg, grid, s0


def _run(cfg, grid, s0, tair, wind=5.0, nsteps=20, ai0=0.3, hi0=0.2,
         qao=-100.0):
    shp = cfg.shape2d
    icfg = seaice.IceConfig()

    def atm_fn(time):
        return (jnp.full(shp, wind), jnp.zeros(shp),
                jnp.full(shp, tair), jnp.full(shp, qao))

    s0i = s0._replace(ice=seaice.initial_ice(cfg, ai0=ai0, hi0=hi0))
    m = Model(cfg, grid, upwelling.make_forcing_fn(cfg, grid),
              vmix_fn=upwelling.make_vmix_fn(cfg),
              ice_fn=seaice.make_ice_fn(cfg, icfg, grid, atm_fn))
    return m.run(s0i, nsteps)


class TestSeaIce:
    def test_cold_air_grows_ice(self, setup):
        """Basal conduction under -20C air thickens the pack
        (Semtner zero-layer: growth ~ ki*dT/h)."""
        cfg, grid, s0 = setup
        s = _run(cfg, grid, s0, tair=-20.0)
        hi = np.asarray(s.ice.hi)
        assert np.isfinite(hi).all()
        assert hi.mean() > 0.2                 # grew
        assert np.asarray(s.ice.ai).mean() > 0.3

    def test_warm_air_melts_ice(self, setup):
        """Above-freezing air melts from the top (cond < 0)."""
        cfg, grid, s0 = setup
        s = _run(cfg, grid, s0, tair=10.0, qao=200.0)
        assert np.asarray(s.ice.hi).mean() < 0.2

    def test_free_drift_fraction(self, setup):
        """Wind-driven drift lands in the classic 2-4% of wind speed
        range (Nansen rule) under free drift."""
        cfg, grid, s0 = setup
        s = _run(cfg, grid, s0, tair=-5.0, wind=10.0)
        ui = np.abs(np.asarray(s.ice.ui))[4:-4, 4:-4].max()
        assert 0.1 < ui < 0.6, ui

    def test_thick_ice_grows_slower(self, setup):
        """Conduction-limited growth: d(hi)/dt decreases with
        thickness (Semtner 1976)."""
        cfg, grid, s0 = setup
        thin = _run(cfg, grid, s0, tair=-20.0, hi0=0.2)
        thick = _run(cfg, grid, s0, tair=-20.0, hi0=2.0)
        dthin = np.asarray(thin.ice.hi).mean() - 0.2
        dthick = np.asarray(thick.ice.hi).mean() - 2.0
        assert dthin > dthick > 0.0

    def test_frazil_production(self, setup):
        """Supercooled water forms frazil and warms back toward the
        freezing point (ice_frazil.F:155-230)."""
        cfg, grid, s0 = setup
        from roms_tpu.core.rho_eos import rho_eos
        from roms_tpu.grid.depth import set_depth
        z_r, z_w, Hz = set_depth(grid, s0.zeta)
        t = np.asarray(s0.t).copy()
        t[0] = -2.5                            # below t_fr = -1.74
        rho, _, _, _, _ = rho_eos(cfg, jnp.asarray(t), z_r, Hz, z_w)
        Tn, wfr = seaice.ice_frazil(cfg, seaice.IceConfig(),
                                    jnp.asarray(t), Hz, z_r, rho)
        assert float(np.asarray(wfr).max()) > 0.0
        assert float(np.asarray(Tn).min()) > -2.5   # warmed
        # no frazil from water at/above freezing
        t[0] = 5.0
        _, wfr0 = seaice.ice_frazil(cfg, seaice.IceConfig(),
                                    jnp.asarray(t), Hz, z_r, rho)
        assert float(np.abs(np.asarray(wfr0)).max()) == 0.0


class TestPrognosticTemp:
    def test_interior_temperature_relaxes(self, setup):
        """MK prognostic interior temperature: under cold air ti cools
        toward the conductive equilibrium between tair and t_fr; warm
        ice under cold air grows more slowly at first (heat capacity
        lag) than the zero-layer limit."""
        cfg, grid, s0 = setup
        s_cold = _run(cfg, grid, s0, tair=-25.0, hi0=1.0)
        ti = np.asarray(s_cold.ice.ti)
        assert np.isfinite(ti).all()
        # interior cooled from -5 toward the mean of surface/bottom
        assert ti.mean() < -5.0
        assert ti.min() >= -40.0

    def test_zero_layer_limit_matches_flag_off(self, setup):
        """prognostic_temp=False reproduces the original zero-layer
        behavior (regression guard)."""
        cfg, grid, s0 = setup
        icfg = seaice.IceConfig(prognostic_temp=False)
        shp = cfg.shape2d

        def atm_fn(time):
            return (jnp.full(shp, 5.0), jnp.zeros(shp),
                    jnp.full(shp, -20.0), jnp.full(shp, -100.0))

        s0i = s0._replace(ice=seaice.initial_ice(cfg, ai0=0.3,
                                                 hi0=0.2))
        m = Model(cfg, grid, upwelling.make_forcing_fn(cfg, grid),
                  vmix_fn=upwelling.make_vmix_fn(cfg),
                  ice_fn=seaice.make_ice_fn(cfg, icfg, grid, atm_fn))
        s = m.run(s0i, 10)
        assert np.isfinite(np.asarray(s.ice.hi)).all()
        assert np.asarray(s.ice.hi).mean() > 0.2


class TestMKThermo:
    """Full Mellor-Kantha snow+brine thermodynamics (ice_mk.h)."""

    def _cfg(self):
        import dataclasses
        from roms_tpu.core.seaice import IceConfig
        from roms_tpu.functionals import upwelling
        cfg = upwelling.make_config(Lm=8, Mm=8, N=4, dtype="float64")
        return cfg, IceConfig(mk_full=True)

    def test_cold_air_grows_ice_warm_air_melts(self):
        import jax.numpy as jnp
        import numpy as np
        from roms_tpu.core.seaice import ice_thermo_mk
        from roms_tpu.functionals import upwelling
        cfg, icfg = self._cfg()
        grid = upwelling.make_grid(cfg)
        shp = cfg.shape2d
        ai = jnp.full(shp, 0.9)
        hi = jnp.full(shp, 1.0)
        hsn = jnp.full(shp, 0.1)
        ti = jnp.full(shp, -5.0)
        sst = jnp.full(shp, -1.8)
        sss = jnp.full(shp, 34.0)
        qao = jnp.full(shp, -50.0)       # losing heat to atmosphere
        cold = jnp.full(shp, -20.0)
        warm = jnp.full(shp, 5.0)
        aic, hic, hsnc, tic, _ = ice_thermo_mk(
            cfg, icfg, grid, ai, hi, hsn, ti, sst, sss, cold, qao)
        aiw, hiw, hsnw, tiw, _ = ice_thermo_mk(
            cfg, icfg, grid, ai, hi, hsn, ti, sst, sss, warm,
            -qao)
        a = np.asarray
        assert np.isfinite(a(hic)).all() and np.isfinite(a(hiw)).all()
        interior = np.s_[2:-2, 2:-2]
        # cold air: basal conduction grows ice; warm air melts it
        assert a(hic)[interior].mean() > a(hiw)[interior].mean()
        # warm air melts snow
        assert a(hsnw)[interior].mean() < a(hsn)[interior].mean()
        # interior temperature stays physical
        assert (a(tic)[interior] <= 0.0).all()
        assert (a(tic)[interior] >= -35.0).all()

    def test_snowfall_and_flooding(self):
        import jax.numpy as jnp
        import numpy as np
        from roms_tpu.core.seaice import ice_thermo_mk
        from roms_tpu.functionals import upwelling
        cfg, icfg = self._cfg()
        grid = upwelling.make_grid(cfg)
        shp = cfg.shape2d
        ai = jnp.full(shp, 0.9)
        hi = jnp.full(shp, 0.3)
        hsn = jnp.full(shp, 0.5)         # heavy snow load -> flooding
        ti = jnp.full(shp, -5.0)
        sst = jnp.full(shp, -1.8)
        sss = jnp.full(shp, 34.0)
        tair = jnp.full(shp, -10.0)
        qao = jnp.full(shp, -20.0)
        snow = jnp.full(shp, 1.0e-7)     # snowfall m/s
        ai2, hi2, hsn2, ti2, _ = ice_thermo_mk(
            cfg, icfg, grid, ai, hi, hsn, ti, sst, sss, tair, qao,
            snowfall=snow)
        a = np.asarray
        interior = np.s_[2:-2, 2:-2]
        # flooding converted part of the snow into ice
        assert a(hsn2)[interior].mean() < 0.5
        assert a(hi2)[interior].mean() > 0.3
        # Archimedes: remaining snow load no longer floods
        load = icfg.rhos * a(hsn2) - (cfg.rho0 - icfg.rhoi) * a(hi2)
        assert (load[interior] < 1e-6).all()


class TestMpdataAdvection:
    """MPDATA vs upwind (ice_smolar.h vs ICE_UPWIND)."""

    def _setup(self):
        cfg = upwelling.make_config(Lm=64, Mm=16, N=4, dt=60.0,
                                    dtype="float64")
        grid = upwelling.make_grid(cfg)
        Mj, Li = cfg.shape2d
        jj, ii = np.meshgrid(np.arange(Mj), np.arange(Li),
                             indexing="ij")
        blob = 0.8 * np.exp(-((ii - 16.0) ** 2 + (jj - 9.0) ** 2)
                            / 18.0)
        from roms_tpu.ops import stencil as st
        ai = st.periodic_x(jnp.asarray(blob))   # ring-consistent init
        ui = jnp.full((Mj, Li), 0.5)          # uniform eastward drift
        vi = jnp.zeros((Mj, Li))
        return cfg, grid, ai, ui, vi

    def _advect(self, scheme, nsteps=120):
        cfg, grid, ai, ui, vi = self._setup()
        icfg = seaice.IceConfig(advect=scheme)
        hi = 2.0 * ai
        for _ in range(nsteps):
            ai, hi = seaice.ice_advect(cfg, icfg, grid, ai, hi, ui, vi)
        return cfg, np.asarray(ai)

    def test_mpdata_monotone_positive(self):
        cfg, ai = self._advect("mpdata")
        assert np.isfinite(ai).all()
        assert ai.min() >= 0.0
        assert ai.max() <= 0.8 + 1e-9

    def test_mpdata_conserves_area(self):
        # periodic-x channel, zonal drift: total interior ice area is
        # invariant (both passes are flux-form, ice_smolar.h:925-947)
        cfg, grid, ai0, ui, vi = self._setup()
        icfg = seaice.IceConfig(advect="mpdata")
        ai, hi = ai0, 2.0 * ai0
        for _ in range(60):
            ai, hi = seaice.ice_advect(cfg, icfg, grid, ai, hi, ui, vi)
        a0 = float(np.asarray(ai0)[1:-1, 1:-1].sum())
        a1 = float(np.asarray(ai)[1:-1, 1:-1].sum())
        assert abs(a1 - a0) / a0 < 1e-12

    def test_mpdata_less_diffusive_than_upwind(self):
        _, ai_up = self._advect("upwind")
        _, ai_mp = self._advect("mpdata")
        # antidiffusive correction must retain more of the peak
        assert ai_mp.max() > ai_up.max() * 1.15, \
            (float(ai_mp.max()), float(ai_up.max()))
