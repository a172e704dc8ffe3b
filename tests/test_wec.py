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
