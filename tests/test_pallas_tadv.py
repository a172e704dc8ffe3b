"""Parity of the fused tracer-advection Pallas kernels
(ops/pallas_tadv.py) against core/pre_step3d.py + core/step3d_t.py,
interpret mode on CPU.

Ring policy: output rows j = 0 / Mj-1 are zeroed by the kernel and the
periodic ring lanes i = 0 / Li-1 differ (perx vs jnp roll-wrap) — dead
data that boundary.bc_rho overwrites, which the bitwise trajectory
test proves.
"""

import os

import numpy as np
import jax.numpy as jnp

os.environ["ROMS_TPU_PALLAS_TADV_INTERPRET"] = "1"

from roms_tpu.core import advection, rhs3d
from roms_tpu.core.omega import omega
from roms_tpu.functionals import benchmark
from roms_tpu.grid.depth import set_depth, set_massflux
from roms_tpu.ops import pallas_tadv, stencil as st


def _setup(Lm=41, Mm=22, N=9):
    cfg = benchmark.make_config(Lm=Lm, Mm=Mm, N=N, dtype="float64")
    grid = benchmark.make_grid(cfg)
    s = benchmark.make_initial(cfg, grid)
    rng = np.random.default_rng(7)
    u = jnp.asarray(rng.standard_normal((N, *cfg.shape2d)) * 0.1)
    v = jnp.asarray(rng.standard_normal((N, *cfg.shape2d)) * 0.1)
    u, v = st.periodic_x(u), st.periodic_x(v)
    t = jnp.asarray(
        rng.standard_normal((cfg.NT, N, *cfg.shape2d)) + 15.0)
    t = st.periodic_x(t)
    t_prev = t + 0.01 * jnp.asarray(
        rng.standard_normal((cfg.NT, N, *cfg.shape2d)))
    t_prev = st.periodic_x(t_prev)
    z_r, z_w, Hz = set_depth(grid, s.zeta)
    Huon, Hvom = set_massflux(grid, u, v, Hz)
    Huon, Hvom = st.periodic_x(Huon), st.periodic_x(Hvom)
    W = omega(cfg, grid, Huon, Hvom, z_w)
    return cfg, grid, t, t_prev, Hz, Huon, Hvom, W


def _interior(x):
    return np.asarray(x)[..., 1:-1, 1:-1]


class TestPallasTadv:
    def test_corrector_parity(self):
        cfg, grid, t, t_prev, Hz, Huon, Hvom, W = _setup()
        dt = cfg.dt
        pmn = grid.pm * grid.pn
        t_part = t_prev * Hz
        ref = []
        for itrc in range(cfg.NT):
            FX, FE = advection.hadv_flux(cfg, grid, t[itrc], Huon,
                                         Hvom, cfg.tracer_hadv(itrc))
            tn = t_part[itrc] - dt * pmn * (st.dx_p(FX) + st.dy_p(FE))
            FC = advection.vadv_flux(cfg, t[itrc], W, Hz,
                                     cfg.tracer_vadv(itrc))
            tn = tn - dt * pmn * (FC[1:] - FC[:-1])
            ref.append(tn)
        ref = jnp.stack(ref)
        got = pallas_tadv.corrector_pallas(cfg, grid, t, t_part, Huon,
                                           Hvom, W, Hz)
        rr, gg = _interior(ref), _interior(got)
        scale = np.abs(rr).max()
        assert np.abs(gg - rr).max() / scale < 1e-13
        assert np.all(np.asarray(got)[..., 0, :] == 0.0)
        assert np.all(np.asarray(got)[..., -1, :] == 0.0)

    def test_predictor_parity(self):
        cfg, grid, t, t_prev, Hz, Huon, Hvom, W = _setup()
        from roms_tpu.core.pre_step3d import pre_step3d
        from roms_tpu.core.state import Forcing

        Mj, Li = cfg.shape2d
        zero2 = jnp.zeros((Mj, Li))
        forcing = benchmark.make_forcing_fn(cfg, grid)(0.0) \
            if hasattr(benchmark, "make_forcing_fn") else None
        N = cfg.N
        ru0 = jnp.zeros((N, Mj, Li))
        for iic in (0, 3):
            t_half, _, _, _ = pre_step3d(
                cfg, grid, jnp.zeros((N, Mj, Li)),
                jnp.zeros((N, Mj, Li)), t, t_prev, ru0, ru0, ru0, ru0,
                Hz, Hz, jnp.zeros((N + 1, Mj, Li)), Huon, Hvom, W,
                forcing, zero2, zero2, jnp.asarray(iic))
            Gamma = 1.0 / 6.0
            dt = cfg.dt
            cff = jnp.where(iic == 0, 0.5 * dt, (1.0 - Gamma) * dt)
            cff1 = jnp.where(iic == 0, 1.0, 0.5 + Gamma)
            cff2 = jnp.where(iic == 0, 0.0, 0.5 - Gamma)
            got = pallas_tadv.predictor_pallas(
                cfg, grid, t, t_prev, Huon, Hvom, W, Hz,
                cff, cff1, cff2)
            rr, gg = _interior(t_half), _interior(got)
            scale = np.abs(rr).max()
            assert np.abs(gg - rr).max() / scale < 1e-13, iic

    def test_trajectory_ulp(self, monkeypatch):
        """Multi-step benchmark trajectories match to a few ulp with
        the fused tracer kernels on vs off.

        The predictor path is bitwise identical; the corrector path
        differs by 1-4 ulp because XLA contracts multiply-adds into
        FMAs differently inside the fused Pallas program than in the
        unfused jnp program (verified: all expressions associate
        identically; step-1 fields are too smooth to expose it).  The
        ring rows/lanes the kernel zeroes are proven dead by the
        equality holding at every interior point."""
        from roms_tpu.core import stepping

        def run(flag, nsteps=4):
            monkeypatch.setenv("ROMS_TPU_PALLAS_TADV", flag)
            monkeypatch.setenv("ROMS_TPU_PALLAS_TADV_INTERPRET", "1")
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
        # one state-wide scale: ulp noise in t (O(15)) propagates into
        # zeta (O(1e-7)) at absolute levels far above zeta's own ulp
        scale = max(np.abs(np.asarray(getattr(a, f))).max()
                    for f in fields)
        tol = 64 * np.finfo(np.float64).eps * scale
        for f in fields:
            x = np.asarray(getattr(a, f))
            y = np.asarray(getattr(b, f))
            assert np.isfinite(y).all()
            assert np.abs(x - y).max() <= tol, f
