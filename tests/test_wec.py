"""Wave effects on currents (vortex force; rhs3d.F WEC coupling
sites, Uchiyama et al 2010)."""

import jax.numpy as jnp
import numpy as np

from roms_tpu.core import wec
from roms_tpu.core.stepping import Model
from roms_tpu.functionals import upwelling
from roms_tpu.grid.depth import set_depth


def _setup():
    cfg = upwelling.make_config(dtype="float64")
    grid = upwelling.make_grid(cfg)
    s0 = upwelling.make_initial(cfg, grid)
    return cfg, grid, s0


class TestWEC:
    def test_stokes_profile_decays_with_depth(self):
        """u_st is maximal at the surface and decays like
        cosh(2k(z+h)); total transport ~ a^2 sigma/2 per unit width."""
        cfg, grid, s0 = _setup()
        z_r, z_w, Hz = set_depth(grid, s0.zeta)
        shp = cfg.shape2d
        Hw = jnp.full(shp, 2.0)
        Dw = jnp.zeros(shp)                  # waves toward +x
        Lw = jnp.full(shp, 100.0)
        us, vs = wec.stokes_drift(cfg, grid, Hw, Dw, Lw, z_r, z_w)
        us = np.asarray(us)
        assert np.isfinite(us).all()
        mid = us[:, 10, 10]
        assert mid[-1] > 0.0                 # surface drift downwave
        assert mid[-1] > mid[0]              # decays downward
        assert mid[-1] < 0.5                 # sane magnitude (< 50 cm/s)
        assert np.abs(np.asarray(vs)).max() < 1e-12   # no cross-wave

    def test_vortex_force_direction(self):
        """Stokes-Coriolis: with waves toward +x in the southern
        hemisphere (f<0), the wave-added force drives a deflection
        opposite to the northern case (sign flip with f)."""
        cfg, grid, s0 = _setup()
        z_r, z_w, Hz = set_depth(grid, s0.zeta)
        shp = cfg.shape2d
        us, vs = wec.stokes_drift(
            cfg, grid, jnp.full(shp, 2.0), jnp.zeros(shp),
            jnp.full(shp, 100.0), z_r, z_w)
        zero = jnp.zeros((cfg.N,) + shp)
        ru0 = jnp.zeros_like(zero)
        rv0 = jnp.zeros_like(zero)
        ru, rv = wec.vf_rhs(cfg, grid, zero, zero, us, vs, Hz,
                            ru0, rv0)
        # no currents -> only Stokes-Coriolis: rv ~ -f*u_st (sign of
        # the interior response depends on sign of f)
        f = float(np.asarray(grid.f)[10, 10])
        rv_i = float(np.asarray(rv)[-1, 10, 10])
        assert rv_i != 0.0
        assert np.sign(rv_i) == -np.sign(f)

    def test_model_runs_with_wec(self):
        cfg, grid, s0 = _setup()
        shp = cfg.shape2d

        def wave_fn(t):
            return (jnp.full(shp, 1.5), jnp.zeros(shp),
                    jnp.full(shp, 80.0))

        m = Model(cfg, grid, upwelling.make_forcing_fn(cfg, grid),
                  vmix_fn=upwelling.make_vmix_fn(cfg),
                  wec_fn=wec.make_wec_fn(cfg, grid, wave_fn))
        s = m.run(s0, 20)
        assert np.isfinite(np.asarray(s.u)).all()
        # waves induce a response in the otherwise weak interior flow
        assert np.abs(np.asarray(s.v)).max() > 0.0


class TestStokesCoupling:
    def test_transport_matches_linear_theory(self):
        """Depth-integrated Stokes transport equals the wave-theory
        value  M = sigma a^2 / (2 tanh(kD))  per unit width (deep
        water limit sigma a^2/2)."""
        cfg, grid, s0 = _setup()
        z_r, z_w, Hz = set_depth(grid, s0.zeta)
        shp = cfg.shape2d
        Hw = jnp.full(shp, 2.0)
        Lw = jnp.full(shp, 100.0)
        us, vs = wec.stokes_drift(cfg, grid, Hw, jnp.zeros(shp),
                                  Lw, z_r, z_w)
        DU, DV, Huon, Hvom = wec.stokes_transport(cfg, grid, us, vs,
                                                  Hz)
        # per-layer fluxes sum to the depth integral by construction
        assert np.allclose(np.asarray(jnp.sum(Huon, axis=0)),
                           np.asarray(DU))
        # analytic check at an interior deep point (divide out on_u)
        j, i = 10, 10
        M_num = float(DU[j, i]) / float(grid.on_u[j, i])
        k = 2.0 * np.pi / 100.0
        D = float((z_w[-1] - z_w[0])[j, i])
        sigma = np.sqrt(9.81 * k * np.tanh(k * D))
        a = 2.0 / (2.0 * np.sqrt(2.0))
        # midpoint-rule integral of cosh over N=16 layers is within a
        # couple percent of the exact sinh integral
        M_th = sigma * a * a / (2.0 * np.tanh(min(k * D, 50.0)))
        assert abs(M_num - M_th) / M_th < 0.05

    def test_model_runs_with_stokes_coupling(self):
        """Full Lagrangian coupling: Stokes transport in the 2D
        continuity and 3D mass fluxes.  The coupled run stays stable
        and differs from the vortex-force-only run (anti-Stokes
        Eulerian response)."""
        cfg, grid, s0 = _setup()
        shp = cfg.shape2d

        def wave_fn(t):
            return (jnp.full(shp, 1.5), jnp.zeros(shp),
                    jnp.full(shp, 80.0))

        def run(coupled):
            m = Model(cfg, grid, upwelling.make_forcing_fn(cfg, grid),
                      vmix_fn=upwelling.make_vmix_fn(cfg),
                      wec_fn=wec.make_wec_fn(cfg, grid, wave_fn,
                                             stokes_coupling=coupled))
            return m.run(s0, 20)

        s_c = run(True)
        s_v = run(False)
        for f in (s_c.zeta, s_c.u, s_c.v, s_c.t):
            assert np.isfinite(np.asarray(f)).all()
        # the mass coupling changes the free surface evolution
        dz = np.abs(np.asarray(s_c.zeta) - np.asarray(s_v.zeta)).max()
        assert dz > 1e-8
        # EW-periodic, x-uniform waves: x-uniformity preserved
        zc = np.asarray(s_c.zeta)
        assert np.abs(zc - zc.mean(axis=-1, keepdims=True)).max() < 1e-6


class TestRoller:
    def test_roller_energy_balance(self):
        """Roller spins up toward the Svendsen equilibrium
        E_eq = alpha*eps_b*c/(g*sin_beta) and releases dissipation with
        a lag."""
        import jax.numpy as jnp
        import numpy as np
        from roms_tpu.core.wec import initial_roller, step_roller
        from roms_tpu.functionals import upwelling
        # short dt so the roller lag (tau = c/(g sin_beta) ~ 5 s) is
        # resolved; the backward-Euler update is stable for any dt
        cfg = upwelling.make_config(Lm=8, Mm=8, N=4,
                                    dtype="float64").replace(dt=1.0)
        r = initial_roller(cfg)
        eps_b = jnp.full(cfg.shape2d, 1.0e-4)
        c = jnp.full(cfg.shape2d, 5.0)
        eps_hist = []
        for _ in range(200):
            r, eps_r = step_roller(cfg, r, eps_b, c)
            eps_hist.append(float(eps_r.mean()))
        E_eq = 0.5 * 1.0e-4 * 5.0 / (9.81 * 0.1)
        assert abs(float(r.E_r.mean()) - E_eq) < 0.05 * E_eq
        # at equilibrium the roller releases alpha_r*eps_b
        assert abs(eps_hist[-1] - 0.5 * 1.0e-4) < 0.05 * 1e-4
        # lag: early dissipation much smaller than equilibrium
        assert eps_hist[0] < 0.5 * eps_hist[-1]
        # stability at large dt: one 300 s step lands on equilibrium
        cfg2 = cfg.replace(dt=300.0)
        r2, e2 = step_roller(cfg2, initial_roller(cfg2), eps_b, c)
        assert abs(float(r2.E_r.mean()) - E_eq) < 0.05 * E_eq

    def test_breaking_accel_drives_downwave_flow(self):
        import jax.numpy as jnp
        import numpy as np
        from roms_tpu.core.stepping import Model
        from roms_tpu.core.wec import make_wec_roller_fn
        from roms_tpu.functionals import upwelling
        cfg = upwelling.make_config(Lm=12, Mm=12, N=8, dtype="float64")
        grid = upwelling.make_grid(cfg)
        s0 = upwelling.make_initial(cfg, grid)
        shp = cfg.shape2d

        def wave_fn(time):
            return (jnp.full(shp, 1.0), jnp.zeros(shp),   # east waves
                    jnp.full(shp, 50.0), jnp.full(shp, 2.0e-4))

        m = Model(cfg, grid, upwelling.make_forcing_fn(cfg, grid),
                  vmix_fn=upwelling.make_vmix_fn(cfg),
                  wec_fn=make_wec_roller_fn(cfg, grid, wave_fn))
        s = s0
        for _ in range(10):
            s = m.step(s)
        u = np.asarray(s.u)
        assert np.isfinite(u).all()
        # surface flow accelerates in the wave direction (+x)
        assert u[-1, 4:-4, 4:-4].mean() > 0.0
        # forcing is surface-intensified
        assert abs(u[-1, 6, 6]) > abs(u[0, 6, 6])
