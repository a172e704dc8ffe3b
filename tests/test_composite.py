"""Composite/mosaic grids (nesting.F classes 2-3): two same-resolution
overlapping grids exchanging contact-edge data must reproduce the
single-grid solution."""

import dataclasses

import jax.numpy as jnp
import numpy as np

from roms_tpu import config as C
from roms_tpu.core import nesting
from roms_tpu.core.state import initial_state
from roms_tpu.core.stepping import Model
from roms_tpu.functionals import idealized as ia
from roms_tpu.grid.grid import build_grid


def test_composite_two_grid_channel():
    # ---- single-grid truth: gravity adjustment channel ----------------
    cfg = ia.grav_adj_config(Lm=64, Mm=4, N=10)
    grid = ia.grav_adj_grid(cfg)
    m_full = Model(cfg, grid, ia.zero_forcing(cfg))
    s_full = m_full.run(ia.grav_adj_initial(cfg, grid), 20)

    # ---- two composite halves with a 6-column overlap ------------------
    # west half: global columns 0..35 (Lm=34); east: 30..65 (Lm=34)
    Lm_h = 34
    off_e = 30

    def half_cfg(side):
        contact = {"east" if side == "w" else "west"}
        def kind(edge, default):
            if edge in contact:
                return edge
            return None
        bc = C.BoundaryConfig(
            zeta=C.LBC(**{e: (C.CLAMPED if e in contact else C.CLOSED)
                          for e in ("west", "south", "east", "north")}),
            ubar=C.LBC(**{e: (C.FLATHER if e in contact else C.CLOSED)
                          for e in ("west", "south", "east", "north")}),
            vbar=C.LBC(**{e: (C.FLATHER if e in contact else C.CLOSED)
                          for e in ("west", "south", "east", "north")}),
            u=C.LBC(**{e: (C.RADIATION if e in contact else C.CLOSED)
                       for e in ("west", "south", "east", "north")}),
            v=C.LBC(**{e: (C.RADIATION if e in contact else C.CLOSED)
                       for e in ("west", "south", "east", "north")}),
            t=C.LBC(**{e: (C.RADIATION if e in contact else C.CLOSED)
                       for e in ("west", "south", "east", "north")}),
            tke=C.LBC.same(C.GRADIENT))
        return dataclasses.replace(cfg, Lm=Lm_h, bc=bc)

    cfg_w, cfg_e = half_cfg("w"), half_cfg("e")

    def subgrid(cfg_h, i0):
        sl = (slice(None), slice(i0, i0 + Lm_h + 2))
        return build_grid(cfg_h, h=np.asarray(grid.h)[sl],
                          pm=np.asarray(grid.pm)[sl],
                          pn=np.asarray(grid.pn)[sl],
                          f=np.asarray(grid.f)[sl])

    g_w, g_e = subgrid(cfg_w, 0), subgrid(cfg_e, off_e)
    s0 = ia.grav_adj_initial(cfg, grid)

    def substate(cfg_h, g_h, i0):
        sl = (slice(None), slice(i0, i0 + Lm_h + 2))
        return initial_state(cfg_h, g_h,
                             zeta=s0.zeta[sl[0], sl[1]],
                             t=s0.t[..., sl[0], sl[1]])

    s_w = substate(cfg_w, g_w, 0)
    s_e = substate(cfg_e, g_e, off_e)
    m_w = Model(cfg_w, g_w, ia.zero_forcing(cfg_w))
    m_e = Model(cfg_e, g_e, ia.zero_forcing(cfg_e))

    regions = [
        # west grid's east edge (local i=35, global 35) filled from the
        # east grid (global = local + 30 -> di = 35-(35-30) = ... use
        # receiver local + di = donor local: di = -off_e)
        nesting.ContactRegion(donor=1, receiver=0, edge="east",
                              di=-off_e, dj=0),
        nesting.ContactRegion(donor=0, receiver=1, edge="west",
                              di=off_e, dj=0),
    ]
    s_w, s_e = nesting.run_composite([m_w, m_e], [s_w, s_e], regions,
                                     20)

    # ---- interiors away from the contact edges track the truth ---------
    zf = np.asarray(s_full.zeta)
    amp = np.abs(zf).max()
    zw = np.asarray(s_w.zeta)
    ze = np.asarray(s_e.zeta)
    err_w = np.abs(zw[1:-1, 1:25] - zf[1:-1, 1:25]).max()
    err_e = np.abs(ze[1:-1, 12:-1] - zf[1:-1, off_e + 12:-1]).max()
    assert np.isfinite(zw).all() and np.isfinite(ze).all()
    assert err_w < 0.15 * amp, (err_w, amp)
    assert err_e < 0.15 * amp, (err_e, amp)
    # temperature front position matches in both halves
    Tw = np.asarray(s_w.t[0])
    Tf = np.asarray(s_full.t[0])
    assert np.abs(Tw[:, 1:-1, 1:25] - Tf[:, 1:-1, 1:25]).max() < 0.5
