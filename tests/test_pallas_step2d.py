"""Parity of the fused barotropic fast-loop Pallas kernel
(ops/pallas_step2d.py) against the jnp engine in core/step2d.py,
interpret mode on CPU.

The kernel applies the full lateral BCs in-kernel, so the carry is
compared EVERYWHERE (ring rows included) after complete baroclinic
steps of the BENCHMARK channel — the strongest available check that
the per-substep fusion, halo stitching, and masked BC writes agree
with the whole-array path.
"""

import numpy as np

from roms_tpu.core import stepping
from roms_tpu.functionals import benchmark


def _run(monkeypatch, flag, nsteps, Lm=32, Mm=21, N=6, resident="0"):
    monkeypatch.setenv("ROMS_TPU_PALLAS_STEP2D", flag)
    monkeypatch.setenv("ROMS_TPU_FASTLOOP_RES", resident)
    monkeypatch.setenv("ROMS_TPU_PALLAS_STEP2D_INTERPRET", "1")
    cfg = benchmark.make_config(Lm=Lm, Mm=Mm, N=N, dtype="float64")
    grid = benchmark.make_grid(cfg)
    s = benchmark.make_initial(cfg, grid)
    m = stepping.Model(cfg, grid,
                       forcing_fn=benchmark.make_forcing_fn(cfg, grid))
    for _ in range(nsteps):
        s = m.step(s)
    return s


class TestPallasStep2d:
    def test_trajectory_parity(self, monkeypatch):
        """Multi-step BENCHMARK trajectories with the fused fast loop
        on vs off agree to reduction-order ulps everywhere (Mm=21
        exercises ragged j-blocks)."""
        a = _run(monkeypatch, "0", nsteps=4)
        b = _run(monkeypatch, "1", nsteps=4)
        for f in ("zeta", "ubar", "vbar", "u", "v", "t"):
            x = np.asarray(getattr(a, f))
            y = np.asarray(getattr(b, f))
            assert np.isfinite(y).all(), f
            scale = np.abs(x).max() + 1e-30
            assert np.abs(y - x).max() / scale < 1e-11, f

    def test_resident_trajectory_parity(self, monkeypatch):
        """The VMEM-resident whole-grid engine (all substeps in one
        kernel, carry held in the output blocks) matches the jnp
        engine over multi-step BENCHMARK trajectories."""
        a = _run(monkeypatch, "0", nsteps=4)
        b = _run(monkeypatch, "0", nsteps=4, resident="1")
        for f in ("zeta", "ubar", "vbar", "u", "v", "t"):
            x = np.asarray(getattr(a, f))
            y = np.asarray(getattr(b, f))
            assert np.isfinite(y).all(), f
            scale = np.abs(x).max() + 1e-30
            assert np.abs(y - x).max() / scale < 1e-11, f

    def test_resident_blocked_parity(self, monkeypatch):
        """Forcing the in-kernel eta-block substep path (NB=3, seam
        stash of pre-substep halo rows) changes nothing vs NB=1."""
        monkeypatch.setenv("ROMS_TPU_FASTLOOP_RES_NB", "3")
        a = _run(monkeypatch, "0", nsteps=3)
        b = _run(monkeypatch, "0", nsteps=3, resident="1")
        for f in ("zeta", "ubar", "vbar", "u", "v", "t"):
            x = np.asarray(getattr(a, f))
            y = np.asarray(getattr(b, f))
            assert np.isfinite(y).all(), f
            scale = np.abs(x).max() + 1e-30
            assert np.abs(y - x).max() / scale < 1e-11, f

    def test_gating(self):
        """Configs outside the kernel's scope fall back to jnp."""
        from roms_tpu.ops import pallas_step2d as p2d
        cfg = benchmark.make_config(Lm=16, Mm=8, N=3)
        assert not p2d.use_pallas_step2d(cfg.replace(wetdry=True))
        from roms_tpu.config import GRADIENT, LBC, BoundaryConfig
        open_bc = BoundaryConfig.uniform(LBC.same(GRADIENT))
        assert not p2d.use_pallas_step2d(cfg.replace(bc=open_bc))
