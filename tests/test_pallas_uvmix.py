"""Parity of the fused harmonic momentum-mixing kernel
(ops/pallas_uvmix.py) against core/hmix.uv3dmix2_s, interpret mode."""

import numpy as np
import jax.numpy as jnp

from roms_tpu.core import hmix, stepping
from roms_tpu.functionals import benchmark
from roms_tpu.ops import pallas_uvmix


def _setup(Lm=33, Mm=21, N=6):
    cfg = benchmark.make_config(Lm=Lm, Mm=Mm, N=N, dtype="float64")
    grid = benchmark.make_grid(cfg)
    rng = np.random.default_rng(7)
    Mj, Li = cfg.shape2d

    def f3():
        return jnp.asarray(rng.normal(0, 0.1, (N, Mj, Li)))
    u, v = f3(), f3()
    Hz = jnp.abs(f3()) + 5.0
    up, vp = f3(), f3()
    ruf = jnp.asarray(rng.normal(0, 0.1, (Mj, Li)))
    rvf = jnp.asarray(rng.normal(0, 0.1, (Mj, Li)))
    return cfg, grid, u, v, up, vp, Hz, ruf, rvf


class TestPallasUvmix:
    def test_parity_interpret(self):
        """Rows 0/1/Mj-1 are excluded: the jnp path's roll-wrapped
        metric ghost (pm(-1) = pm(Mj-1)) reaches VFe row 0 -> the row-1
        update, while the kernel's block-0 minus view holds different
        garbage there — both are v-wall BC rows (bc_v zeroes them), as
        the bitwise trajectory test proves."""
        import os
        cfg, grid, u, v, up, vp, Hz, ruf, rvf = _setup()
        outs_g = pallas_uvmix.uv3dmix2_s_pallas(
            cfg, grid, u, v, up, vp, Hz, ruf, rvf, interpret=True)
        os.environ["ROMS_TPU_PALLAS_UVMIX"] = "0"
        try:
            outs_r = hmix.uv3dmix2_s(cfg, grid, u, v, up, vp, Hz,
                                     ruf, rvf)
        finally:
            del os.environ["ROMS_TPU_PALLAS_UVMIX"]
        for g, r, nm in zip(outs_g, outs_r,
                            ("u_part", "v_part", "rufrc", "rvfrc")):
            g, r = np.asarray(g), np.asarray(r)
            scale = np.abs(r).max() + 1e-30
            d = np.abs(g - r)[..., 2:-1, 1:-1].max() / scale
            assert d < 1e-13, (nm, d)

    def test_trajectory(self, monkeypatch):
        monkeypatch.setenv("ROMS_TPU_PALLAS_UVMIX_INTERPRET", "1")
        cfg = benchmark.make_config(Lm=33, Mm=18, N=8, dtype="float64")
        grid = benchmark.make_grid(cfg)

        def run(flag):
            monkeypatch.setenv("ROMS_TPU_PALLAS_UVMIX", flag)
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
