"""Parity of the fused mass-flux + omega kernel (ops/pallas_flux.py)
against grid.depth.set_massflux + core.omega.omega, interpret mode."""

import numpy as np
import jax.numpy as jnp

from roms_tpu.core import omega as omega_mod, stepping
from roms_tpu.functionals import benchmark
from roms_tpu.grid.depth import set_massflux
from roms_tpu.ops import pallas_flux, stencil as st


def _setup(Lm=33, Mm=21, N=6):
    cfg = benchmark.make_config(Lm=Lm, Mm=Mm, N=N, dtype="float64")
    grid = benchmark.make_grid(cfg)
    rng = np.random.default_rng(9)
    Mj, Li = cfg.shape2d

    def f3(k=N):
        return jnp.asarray(rng.normal(0, 0.1, (k, Mj, Li)))
    u, v = f3(), f3()
    Hz = jnp.abs(f3()) + 5.0
    z_w = jnp.cumsum(jnp.concatenate([jnp.full((1, Mj, Li), -4000.0),
                                      Hz], axis=0), axis=0)
    return cfg, grid, u, v, Hz, z_w


class TestPallasFlux:
    def test_parity_interpret(self):
        cfg, grid, u, v, Hz, z_w = _setup()
        hu_g, hv_g, w_g = pallas_flux.flux_omega_pallas(
            cfg, grid, u, v, Hz, z_w, interpret=True)
        hu_r, hv_r = set_massflux(grid, u, v, Hz)
        hu_r, hv_r = st.periodic_x(hu_r), st.periodic_x(hv_r)
        w_r = omega_mod.omega(cfg, grid, hu_r, hv_r, z_w)
        for g, r, nm, j0 in ((hu_g, hu_r, "Huon", 1), (hv_g, hv_r,
                             "Hvom", 1), (w_g, w_r, "W", 0)):
            g, r = np.asarray(g), np.asarray(r)
            scale = np.abs(r).max() + 1e-30
            d = np.abs(g - r)[:, j0:, :].max() / scale
            assert d < 1e-14, (nm, d)

    def test_omega_only(self):
        cfg, grid, u, v, Hz, z_w = _setup(Lm=30, Mm=18, N=5)
        hu, hv = set_massflux(grid, u, v, Hz)
        hu, hv = st.periodic_x(hu), st.periodic_x(hv)
        w_g = pallas_flux.omega_pallas(cfg, grid, hu, hv, z_w,
                                       interpret=True)
        w_r = omega_mod.omega(cfg, grid, hu, hv, z_w)
        d = np.abs(np.asarray(w_g) - np.asarray(w_r)).max()
        assert d / (np.abs(np.asarray(w_r)).max() + 1e-30) < 1e-14

    def test_trajectory(self, monkeypatch):
        monkeypatch.setenv("ROMS_TPU_PALLAS_FLUX_INTERPRET", "1")
        cfg = benchmark.make_config(Lm=33, Mm=18, N=8, dtype="float64")
        grid = benchmark.make_grid(cfg)

        def run(flag):
            monkeypatch.setenv("ROMS_TPU_PALLAS_FLUX", flag)
            s = benchmark.make_initial(cfg, grid)
            m = stepping.Model(
                cfg, grid,
                forcing_fn=benchmark.make_forcing_fn(cfg, grid))
            for _ in range(3):
                s = m.step(s)
            return s

        a = run("0")
        b = run("1")
        for f in ("zeta", "ubar", "vbar", "u", "v", "t"):
            x = np.asarray(getattr(a, f))
            y = np.asarray(getattr(b, f))
            assert np.isfinite(y).all(), f
            scale = np.abs(x).max() + 1e-30
            assert np.abs(y - x).max() / scale < 1e-11, f
