"""Parity of the fused 3D momentum RHS Pallas kernel
(ops/pallas_rhs3d.py) against core/rhs3d.py, interpret mode on CPU.

Ring policy: the kernel zeroes output rows j = 0 / Mj-1, rv rows
adjacent to the wall can differ where the jnp path's jnp.roll row wrap
reaches them (rv row 1 via the W(j-2) C4 average), and the periodic
ring LANES i = 0 / Li-1 differ (kernel perx vs jnp roll-wrap) — all
dead data that bc_u/bc_v overwrite, which the bitwise trajectory test
proves.
"""

import os

import jax.numpy as jnp
import numpy as np

from roms_tpu.core import rhs3d
from roms_tpu.core.omega import omega
from roms_tpu.functionals import benchmark
from roms_tpu.grid.depth import set_depth, set_massflux
from roms_tpu.ops import pallas_rhs3d, stencil as st


def _setup(Lm=41, Mm=22, N=9, curv=True):
    cfg = benchmark.make_config(Lm=Lm, Mm=Mm, N=N, dtype="float64")
    if curv and not cfg.curvgrid:
        cfg = cfg.replace(curvgrid=True)
    grid = benchmark.make_grid(cfg)
    s = benchmark.make_initial(cfg, grid)
    rng = np.random.default_rng(11)
    u = jnp.asarray(rng.standard_normal((N, *cfg.shape2d)) * 0.1)
    v = jnp.asarray(rng.standard_normal((N, *cfg.shape2d)) * 0.1)
    if cfg.bc.ew_periodic:
        # the model refreshes the periodic ring (bc_u/bc_v) before
        # rhs3d runs; ring-inconsistent velocities are unreachable
        u, v = st.periodic_x(u), st.periodic_x(v)
    z_r, z_w, Hz = set_depth(grid, s.zeta)
    Huon, Hvom = set_massflux(grid, u, v, Hz)
    if cfg.bc.ew_periodic:
        Huon, Hvom = st.periodic_x(Huon), st.periodic_x(Hvom)
    W = omega(cfg, grid, Huon, Hvom, z_w)
    ru = jnp.asarray(rng.standard_normal((N, *cfg.shape2d)))
    rv = jnp.asarray(rng.standard_normal((N, *cfg.shape2d)))
    return cfg, grid, u, v, Hz, Huon, Hvom, W, ru, rv


class TestPallasRhs3d:
    def test_parity_interior(self):
        cfg, grid, u, v, Hz, Huon, Hvom, W, ru, rv = _setup()
        r_u, r_v = rhs3d.rhs3d_momentum(cfg, grid, u, v, Hz, Huon,
                                        Hvom, W, ru, rv)
        g_u, g_v = pallas_rhs3d.rhs3d_momentum_pallas(
            cfg, grid, u, v, Hz, Huon, Hvom, W, ru, rv,
            interpret=True)
        for r, g, lo in ((r_u, g_u, 1), (r_v, g_v, 2)):
            rr = np.asarray(r)[:, lo:-1, 1:-1]
            gg = np.asarray(g)[:, lo:-1, 1:-1]
            scale = np.abs(rr).max() + 1e-30
            assert np.abs(gg - rr).max() / scale < 1e-13
        assert np.all(np.asarray(g_u)[:, 0] == 0.0)
        assert np.all(np.asarray(g_u)[:, -1] == 0.0)

    def test_parity_no_curv(self):
        cfg, grid, u, v, Hz, Huon, Hvom, W, ru, rv = _setup(curv=False)
        r_u, r_v = rhs3d.rhs3d_momentum(cfg, grid, u, v, Hz, Huon,
                                        Hvom, W, ru, rv)
        g_u, g_v = pallas_rhs3d.rhs3d_momentum_pallas(
            cfg, grid, u, v, Hz, Huon, Hvom, W, ru, rv,
            interpret=True)
        for r, g, lo in ((r_u, g_u, 1), (r_v, g_v, 2)):
            rr = np.asarray(r)[:, lo:-1, 1:-1]
            gg = np.asarray(g)[:, lo:-1, 1:-1]
            scale = np.abs(rr).max() + 1e-30
            assert np.abs(gg - rr).max() / scale < 1e-13

    def test_trajectory_bitwise(self, monkeypatch):
        """Multi-step benchmark trajectories are bitwise identical with
        the fused kernel on vs off (post-BC the ring differences are
        dead data)."""
        from roms_tpu.core import stepping

        def run(flag, nsteps=4):
            monkeypatch.setenv("ROMS_TPU_PALLAS_RHS3D", flag)
            monkeypatch.setenv("ROMS_TPU_PALLAS_RHS3D_INTERPRET", "1")
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
        for f in ("zeta", "ubar", "vbar", "u", "v", "t"):
            x = np.asarray(getattr(a, f))
            y = np.asarray(getattr(b, f))
            assert np.isfinite(y).all()
            np.testing.assert_array_equal(x, y, err_msg=f)

    def test_parity_k_chunked(self, monkeypatch):
        """The VMEM k-chunk split (BENCHMARK3-size path) reproduces the
        single-call kernel exactly."""
        monkeypatch.setenv("ROMS_TPU_PALLAS_RHS3D_NK", "3")
        cfg, grid, u, v, Hz, Huon, Hvom, W, ru, rv = _setup()
        g_u, g_v = pallas_rhs3d.rhs3d_momentum_pallas(
            cfg, grid, u, v, Hz, Huon, Hvom, W, ru, rv,
            interpret=True)
        monkeypatch.setenv("ROMS_TPU_PALLAS_RHS3D_NK", "1")
        r_u, r_v = pallas_rhs3d.rhs3d_momentum_pallas(
            cfg, grid, u, v, Hz, Huon, Hvom, W, ru, rv,
            interpret=True)
        # shape-dependent vectorization reassociates FP sums between
        # the chunked and single-call lowering -> ulp-level tolerance
        for g, r in ((g_u, r_u), (g_v, r_v)):
            g, r = np.asarray(g), np.asarray(r)
            scale = np.abs(r).max() + 1e-30
            assert np.abs(g - r).max() / scale < 1e-13
