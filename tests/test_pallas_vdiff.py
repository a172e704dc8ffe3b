"""Parity of the fused tracer vertical-diffusion kernel
(ops/pallas_vdiff.py) against ops/tridiag.spline_flux_solve."""

import numpy as np
import jax.numpy as jnp

from roms_tpu.core import stepping
from roms_tpu.functionals import benchmark
from roms_tpu.ops import pallas_vdiff
from roms_tpu.ops.tridiag import spline_flux_solve


class TestPallasVdiff:
    def test_parity_interpret(self):
        cfg = benchmark.make_config(Lm=33, Mm=21, N=9, dtype="float64")
        rng = np.random.default_rng(5)
        Mj, Li = cfg.shape2d
        N, NT = 9, cfg.NT

        def f3(k=N):
            return jnp.asarray(rng.normal(0, 0.1, (k, Mj, Li)))
        Hz = jnp.abs(f3()) + 4.0
        Akt = jnp.stack([jnp.abs(f3(N + 1)) * 1e-3 + 1e-5
                         for _ in range(2)])
        pre = [jnp.asarray(rng.normal(10, 1, (N, Mj, Li))) * Hz
               for _ in range(NT)]
        solk = pallas_vdiff.spline_vdiff_pallas(cfg, pre, Hz, Akt,
                                                interpret=True)
        Aks = jnp.stack([Akt[min(i, 1)] for i in range(NT)], axis=1)
        Hzs = jnp.stack([Hz] * NT, axis=1)
        q_s = jnp.stack([t / Hz for t in pre], axis=1)
        ref = q_s + spline_flux_solve(Hzs, Aks, q_s, cfg.dt)
        d = np.abs(np.asarray(jnp.swapaxes(solk, 0, 1))
                   - np.asarray(ref)).max()
        assert d / np.abs(np.asarray(ref)).max() < 1e-14

    def test_trajectory(self, monkeypatch):
        monkeypatch.setenv("ROMS_TPU_PALLAS_VDIFF_INTERPRET", "1")
        cfg = benchmark.make_config(Lm=33, Mm=18, N=8, dtype="float64")
        grid = benchmark.make_grid(cfg)

        def run(flag):
            monkeypatch.setenv("ROMS_TPU_PALLAS_VDIFF", flag)
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
