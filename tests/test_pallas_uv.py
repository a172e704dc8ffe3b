"""Parity of the fused step3d_uv Pallas kernels (ops/pallas_uv.py)
against core/step3d_uv.py, interpret mode on CPU.

Unlike the rhs3d/tadv kernels, BOTH stages here must match the jnp
path at EVERY point including the boundary rings: the finish stage
runs after bc_u/bc_v and its ring values persist into the state, so
j-wrapped averages (Hz_v, AKv, DC0v) are precomputed with st.jm1
outside the kernel.  Tolerances cover FMA-contraction and k-sum
reduction-order ulps only.
"""

import os

import numpy as np
import jax.numpy as jnp

os.environ["ROMS_TPU_PALLAS_UV_INTERPRET"] = "1"

from roms_tpu.core import step3d_uv as suv
from roms_tpu.core.step2d import FastAverages
from roms_tpu.functionals import benchmark
from roms_tpu.grid.depth import set_depth, set_massflux
from roms_tpu.ops import pallas_uv, stencil as st


def _setup(Lm=41, Mm=22, N=9):
    cfg = benchmark.make_config(Lm=Lm, Mm=Mm, N=N, dtype="float64")
    grid = benchmark.make_grid(cfg)
    s = benchmark.make_initial(cfg, grid)
    rng = np.random.default_rng(3)
    f = lambda *sh: jnp.asarray(rng.standard_normal(sh))
    Mj, Li = cfg.shape2d
    z_r, z_w, Hz = set_depth(grid, s.zeta)
    u_part = f(N, Mj, Li) * Hz
    v_part = f(N, Mj, Li) * Hz
    ru = f(N, Mj, Li) * 1e3
    rv = f(N, Mj, Li) * 1e3
    Akv = jnp.abs(f(N + 1, Mj, Li)) * 1e-3
    u = f(N, Mj, Li) * 0.1
    v = f(N, Mj, Li) * 0.1
    Huon, Hvom = set_massflux(grid, u, v, Hz)
    D_u = jnp.sum(0.5 * (Hz + st.im1(Hz)), axis=0)
    D_v = jnp.sum(0.5 * (Hz + st.jm1(Hz)), axis=0)
    avg = FastAverages(
        Zt_avg1=s.zeta,
        DU_avg1=f(Mj, Li) * 10.0 * D_u * grid.on_u * 0.01,
        DV_avg1=f(Mj, Li) * 10.0 * D_v * grid.om_v * 0.01,
        DU_avg2=f(Mj, Li) * 10.0 * D_u * grid.on_u * 0.01,
        DV_avg2=f(Mj, Li) * 10.0 * D_v * grid.om_v * 0.01)
    return cfg, grid, u_part, v_part, ru, rv, Hz, z_r, Akv, avg, \
        Huon, Hvom


def _close(a, b, tol=1e-12):
    aa, bb = np.asarray(a), np.asarray(b)
    scale = np.abs(aa).max() + 1e-30
    return np.abs(aa - bb).max() / scale < tol


class TestPallasUV:
    def test_full_parity(self):
        """Full step3d_uv output (all six arrays) with the kernels vs
        the pure-jnp path, every point including rings."""
        (cfg, grid, u_part, v_part, ru, rv, Hz, z_r, Akv, avg,
         Huon, Hvom) = _setup()
        iic = jnp.asarray(3)
        os.environ["ROMS_TPU_PALLAS_UV"] = "0"
        ref = suv.step3d_uv(cfg, grid, u_part, v_part, ru, rv, Hz,
                            z_r, Akv, avg, Huon, Hvom, iic)
        os.environ["ROMS_TPU_PALLAS_UV"] = "1"
        got = suv.step3d_uv(cfg, grid, u_part, v_part, ru, rv, Hz,
                            z_r, Akv, avg, Huon, Hvom, iic)
        os.environ["ROMS_TPU_PALLAS_UV"] = "0"
        names = ("u", "v", "ubar", "vbar", "Huon", "Hvom")
        for nm, r, g in zip(names, ref, got):
            assert _close(r, g), nm

    def test_startup_coefficients(self):
        """iic=0 (forward-Euler start) takes the same path."""
        (cfg, grid, u_part, v_part, ru, rv, Hz, z_r, Akv, avg,
         Huon, Hvom) = _setup(Lm=24, Mm=14, N=6)
        for iic in (0, 1):
            os.environ["ROMS_TPU_PALLAS_UV"] = "0"
            ref = suv.step3d_uv(cfg, grid, u_part, v_part, ru, rv, Hz,
                                z_r, Akv, avg, Huon, Hvom,
                                jnp.asarray(iic))
            os.environ["ROMS_TPU_PALLAS_UV"] = "1"
            got = suv.step3d_uv(cfg, grid, u_part, v_part, ru, rv, Hz,
                                z_r, Akv, avg, Huon, Hvom,
                                jnp.asarray(iic))
            os.environ["ROMS_TPU_PALLAS_UV"] = "0"
            for r, g in zip(ref, got):
                assert _close(r, g), iic

    def test_trajectory_ulp(self, monkeypatch):
        from roms_tpu.core import stepping

        def run(flag, nsteps=4):
            monkeypatch.setenv("ROMS_TPU_PALLAS_UV", flag)
            cfg = benchmark.make_config(Lm=32, Mm=16, N=6,
                                        dtype="float64")
            grid = benchmark.make_grid(cfg)
            s = benchmark.make_initial(cfg, grid)
            m = stepping.Model(
                cfg, grid,
                forcing_fn=benchmark.make_forcing_fn(cfg, grid))
            for _ in range(nsteps):
                s = m.step(s)
            return s

        a = run("0")
        b = run("1")
        fields = ("zeta", "ubar", "vbar", "u", "v", "t")
        scale = max(np.abs(np.asarray(getattr(a, f))).max()
                    for f in fields)
        tol = 64 * np.finfo(np.float64).eps * scale
        for f in fields:
            x = np.asarray(getattr(a, f))
            y = np.asarray(getattr(b, f))
            assert np.isfinite(y).all()
            assert np.abs(x - y).max() <= tol, f
