"""Parity of the fused rotated-diffusion Pallas kernel
(ops/pallas_hmix.py) against the whole-array jnp triad operator
(core/hmix._rot_div_geo), in interpret mode on CPU.

The Pallas kernel zeroes the j = 0 / Mj-1 ring rows instead of
reproducing jnp.roll's non-physical row wrap (see the module
docstring), so field comparisons exclude those rows; the
t3dmix2_geo-level test then confirms the ring divergence is dead data
by checking the full operator output on interior rows only.
"""

import dataclasses

import jax.numpy as jnp
import numpy as np

from roms_tpu.core import hmix
from roms_tpu.functionals import upwelling
from roms_tpu.grid.depth import set_depth
from roms_tpu.ops import pallas_hmix, stencil as st


def _setup(Lm=41, Mm=22, N=12):
    # deliberately lane-unaligned Li to exercise the logical-width wrap
    cfg = upwelling.make_config(Lm=Lm, Mm=Mm, N=N, dtype="float64")
    grid = upwelling.make_grid(cfg)
    s0 = upwelling.make_initial(cfg, grid)
    z_r, z_w, Hz = set_depth(grid, s0.zeta)
    rng = np.random.default_rng(7)
    q = jnp.asarray(
        18.0 + np.cumsum(rng.random((N, *cfg.shape2d)), axis=0) * 0.3
        + rng.standard_normal((N, *cfg.shape2d)) * 0.05)
    return cfg, grid, q, Hz, z_r


def _ref_div(cfg, grid, q, d2, Hz, z_r):
    pm_u = 0.5 * (grid.pm + st.im1(grid.pm)) * grid.umask
    pn_v = 0.5 * (grid.pn + st.jm1(grid.pn)) * grid.vmask
    dZdx = pm_u * (z_r - st.im1(z_r))
    dZde = pn_v * (z_r - st.jm1(z_r))
    if cfg.bc.ew_periodic:
        dZdx = st.periodic_x(dZdx)
    return hmix._rot_div_geo(cfg, grid, q, d2, Hz, z_r, dZdx, dZde)


class TestPallasHmix:
    def test_rot_div_parity_interior(self):
        cfg, grid, q, Hz, z_r = _setup()
        d2 = grid.diff2[0]
        ref = _ref_div(cfg, grid, q, d2, Hz, z_r)
        got = pallas_hmix.rot_div_geo_pallas(cfg, grid, q, d2, Hz,
                                             z_r, interpret=True)
        r = np.asarray(ref)[:, 1:-1]
        g = np.asarray(got)[:, 1:-1]
        scale = np.abs(r).max() + 1e-30
        assert np.abs(g - r).max() / scale < 1e-13
        # ring rows are zeroed, not wrapped
        gfull = np.asarray(got)
        assert np.all(gfull[:, 0] == 0.0)
        assert np.all(gfull[:, -1] == 0.0)

    def test_batched_matches_per_tracer(self):
        cfg, grid, q, Hz, z_r = _setup(Lm=30, Mm=14, N=8)
        t = jnp.stack([q, q * 0.1 + 35.0])
        d2s = [grid.diff2[0], grid.diff2[1] * 1.7]
        got = pallas_hmix.rot_div_geo_batched(cfg, grid, t, d2s, Hz,
                                              z_r, interpret=True)
        for i in range(2):
            ref = _ref_div(cfg, grid, t[i], d2s[i], Hz, z_r)
            r = np.asarray(ref)[:, 1:-1]
            g = np.asarray(got[i])[:, 1:-1]
            scale = np.abs(r).max() + 1e-30
            assert np.abs(g - r).max() / scale < 1e-13

    def test_t3dmix2_geo_dispatch_parity(self, monkeypatch):
        """The full operator through the hmix dispatcher (forced on in
        interpret mode) matches the jnp path on interior rows."""
        cfg, grid, q, Hz, z_r = _setup(Lm=30, Mm=14, N=8)
        t = jnp.stack([q, q * 0.1 + 35.0])
        t_part = t * Hz
        ref = hmix.t3dmix2_geo(cfg, grid, t, t_part, Hz, z_r)
        monkeypatch.setenv("ROMS_TPU_PALLAS_HMIX", "1")
        monkeypatch.setenv("ROMS_TPU_PALLAS_HMIX_INTERPRET", "1")
        got = hmix.t3dmix2_geo(cfg, grid, t, t_part, Hz, z_r)
        r = np.asarray(ref)[:, :, 1:-1]
        g = np.asarray(got)[:, :, 1:-1]
        scale = np.abs(r).max()
        assert np.abs(g - r).max() / scale < 1e-13
        # ring rows carry t_part unchanged (divergence zeroed there)
        tp = np.asarray(t_part)
        gfull = np.asarray(got)
        np.testing.assert_array_equal(gfull[:, :, 0], tp[:, :, 0])
        np.testing.assert_array_equal(gfull[:, :, -1], tp[:, :, -1])

    def test_t3dmix4_geo_dispatch_parity(self, monkeypatch):
        """Biharmonic: two fused passes with _lap_bc between match the
        jnp path on rows untouched by the ring-zero choice (the zeroed
        first-pass ring feeds _lap_bc exactly like the jnp path only
        when _lap_bc overwrites it, which it does for closed/gradient
        BCs)."""
        cfg, grid, q, Hz, z_r = _setup(Lm=30, Mm=14, N=8)
        cfg = cfg.replace(
            mixing=dataclasses.replace(cfg.mixing, tnu4=(80.0, 80.0)))
        grid = upwelling.make_grid(cfg)   # diff4 derives from cfg
        assert float(jnp.max(jnp.abs(grid.diff4[0]))) > 0.0
        t = jnp.stack([q, q * 0.1 + 35.0])
        t_part = t * Hz
        ref = hmix.t3dmix4_geo(cfg, grid, t, t_part, Hz, z_r)
        monkeypatch.setenv("ROMS_TPU_PALLAS_HMIX", "1")
        monkeypatch.setenv("ROMS_TPU_PALLAS_HMIX_INTERPRET", "1")
        got = hmix.t3dmix4_geo(cfg, grid, t, t_part, Hz, z_r)
        r = np.asarray(ref)[:, :, 1:-1]
        g = np.asarray(got)[:, :, 1:-1]
        scale = np.abs(r).max()
        assert np.abs(g - r).max() / scale < 1e-12

    def test_ns_periodic_falls_back(self, monkeypatch):
        """NS-periodic configs must not take the pallas path (the row
        wrap is physical there)."""
        from roms_tpu.config import PERIODIC
        monkeypatch.setenv("ROMS_TPU_PALLAS_HMIX", "1")
        cfg, grid, q, Hz, z_r = _setup(Lm=20, Mm=12, N=6)
        zlbc = dataclasses.replace(cfg.bc.zeta, south=PERIODIC,
                                   north=PERIODIC)
        cfg = cfg.replace(bc=dataclasses.replace(cfg.bc, zeta=zlbc))
        assert cfg.bc.ns_periodic
        assert not hmix._use_pallas(cfg)
