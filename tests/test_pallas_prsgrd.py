"""Parity of the fused splines density-Jacobian pressure-gradient
kernel (ops/pallas_prsgrd.py) against core/prsgrd.prsgrd32, interpret
mode on CPU.

The pressure integral's unrolled accumulation associates (P_top + dP)
sequentially while the jnp path cumsums the dP increments first, so
direct parity is ulp-level, not bitwise; the trajectory test bounds the
end-to-end effect over full model steps.
"""

import os

import numpy as np
import pytest

from roms_tpu.core import prsgrd, stepping
from roms_tpu.core.rho_eos import rho_eos
from roms_tpu.functionals import benchmark
from roms_tpu.ops import pallas_prsgrd


def _setup(Lm=41, Mm=22, N=9):
    cfg = benchmark.make_config(Lm=Lm, Mm=Mm, N=N, dtype="float64")
    grid = benchmark.make_grid(cfg)
    s = benchmark.make_initial(cfg, grid)
    rng = np.random.default_rng(3)
    t = np.array(s.t)
    t[0] += rng.normal(0, 0.3, t[0].shape)     # break x-uniformity
    t[1] += rng.normal(0, 0.05, t[1].shape)
    import jax.numpy as jnp
    t = jnp.asarray(t)
    rho = rho_eos(cfg, t, s.z_r, s.Hz, s.z_w)[0]
    return cfg, grid, rho, s.z_r, s.z_w, s.Hz


class TestPallasPrsgrd:
    def test_parity_interpret(self):
        cfg, grid, rho, z_r, z_w, Hz = _setup()
        g_ru, g_rv = pallas_prsgrd.prsgrd32_pallas(
            cfg, grid, rho, z_r, z_w, Hz, interpret=True)
        r_ru, r_rv = prsgrd.prsgrd32(cfg, grid, rho, z_r, z_w, Hz)
        for g, r, nm in ((g_ru, r_ru, "ru"), (g_rv, r_rv, "rv")):
            g, r = np.asarray(g), np.asarray(r)
            scale = np.abs(r).max() + 1e-30
            # interior (kernel ring rows/lanes are dead by contract)
            d = np.abs(g - r)[:, 1:-1, 1:-1].max() / scale
            assert d < 1e-12, (nm, d)

    def test_parity_with_tide(self):
        cfg, grid, rho, z_r, z_w, Hz = _setup(Lm=30, Mm=18, N=6)
        Mj, Li = cfg.shape2d
        import jax.numpy as jnp
        eqt = jnp.asarray(
            np.random.default_rng(5).normal(0, 0.05, (Mj, Li)))
        g_ru, g_rv = pallas_prsgrd.prsgrd32_pallas(
            cfg, grid, rho, z_r, z_w, Hz, eq_tide=eqt, interpret=True)
        r_ru, r_rv = prsgrd.prsgrd32(cfg, grid, rho, z_r, z_w, Hz,
                                     eq_tide=eqt)
        for g, r in ((g_ru, r_ru), (g_rv, r_rv)):
            g, r = np.asarray(g), np.asarray(r)
            scale = np.abs(r).max() + 1e-30
            assert np.abs(g - r)[:, 1:-1, 1:-1].max() / scale < 1e-12

    def test_trajectory(self, monkeypatch):
        """Full benchmark steps with ONLY the prsgrd kernel toggled:
        prognostic fields must match everywhere the BCs define them."""
        monkeypatch.setenv("ROMS_TPU_PALLAS_PRSGRD_INTERPRET", "1")
        cfg = benchmark.make_config(Lm=33, Mm=18, N=8, dtype="float64")
        grid = benchmark.make_grid(cfg)

        def run(flag):
            monkeypatch.setenv("ROMS_TPU_PALLAS_PRSGRD", flag)
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
