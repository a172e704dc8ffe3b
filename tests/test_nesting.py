"""One-way refinement nesting (nesting.F / set_contact.F slice): a
rf=2 child embedded in the KELVIN channel must reproduce the parent's
propagating wave when driven only through its boundaries."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from roms_tpu import config as C
from roms_tpu.core import nesting
from roms_tpu.core.stepping import Model
from roms_tpu.functionals import kelvin
from roms_tpu.grid.grid import build_grid


@pytest.mark.slow
def test_refined_child_tracks_parent():
    # ---- parent run with snapshots ------------------------------------
    cfg_p = kelvin.make_config(Lm=40, Mm=16, N=5)
    grid_p = kelvin.make_grid(cfg_p)
    m_p = Model(cfg_p, grid_p, kelvin.make_forcing_fn(cfg_p, grid_p),
                obc_fn=kelvin.make_obc_fn(cfg_p, grid_p))
    s = kelvin.make_initial(cfg_p, grid_p)
    snaps = [s]
    nsteps_p = 24
    for _ in range(nsteps_p):
        s = m_p.step(s)
        snaps.append(s)

    # ---- child: rf=2 over a mid-channel box ---------------------------
    rf = 2
    spec = nesting.RefineSpec(i0=10, j0=2, rf=rf, Lm_c=20, Mm_c=16)
    cfg_c = dataclasses.replace(
        cfg_p, Lm=spec.Lm_c, Mm=spec.Mm_c, dt=cfg_p.dt / rf,
        bc=C.BoundaryConfig(
            zeta=C.LBC.same(C.CLAMPED),
            ubar=C.LBC.same(C.FLATHER), vbar=C.LBC.same(C.FLATHER),
            u=C.LBC.same(C.RADIATION), v=C.LBC.same(C.RADIATION),
            t=C.LBC.same(C.RADIATION), tke=C.LBC.same(C.GRADIENT)))
    Mj_c, Li_c = cfg_c.shape2d

    h_c = nesting.refine2d(grid_p.h, spec, Mj_c, Li_c)
    f_c = nesting.refine2d(grid_p.f, spec, Mj_c, Li_c)
    pm_c = nesting.refine2d(grid_p.pm, spec, Mj_c, Li_c) * rf
    pn_c = nesting.refine2d(grid_p.pn, spec, Mj_c, Li_c) * rf
    grid_c = build_grid(cfg_c, h=np.asarray(h_c), pm=np.asarray(pm_c),
                        pn=np.asarray(pn_c), f=np.asarray(f_c))

    # child initial condition interpolated from the parent
    from roms_tpu.core.state import initial_state
    jc, ic = nesting._child_coords(spec, Mj_c, Li_c)
    s0_c = initial_state(
        cfg_c, grid_c,
        zeta=nesting.bilinear(snaps[0].zeta, jc, ic),
        u=nesting.bilinear(snaps[0].u, jc, ic),
        v=nesting.bilinear(snaps[0].v, jc, ic),
        t=nesting.bilinear(snaps[0].t, jc, ic),
        time0=0.0)

    obc_c = nesting.make_child_obc_fn(cfg_c, spec, snaps, cfg_p.dt)
    m_c = Model(cfg_c, grid_c, kelvin.make_forcing_fn(cfg_c, grid_c),
                obc_fn=obc_c)
    s_c = m_c.run(s0_c, nsteps_p * rf)

    # ---- the child must track the interpolated parent wave ------------
    z_c = np.asarray(s_c.zeta)[2:-2, 2:-2]
    z_ref = np.asarray(nesting.bilinear(snaps[-1].zeta, jc,
                                        ic))[2:-2, 2:-2]
    assert np.isfinite(z_c).all()
    amp = max(np.abs(z_ref).max(), 1e-6)
    rms = np.sqrt(((z_c - z_ref) ** 2).mean())
    assert rms < 0.3 * amp, (rms, amp)


def test_bilinear_exact_on_linear_fields():
    """Contact-point interpolation reproduces linear fields exactly
    (the set_contact.F weight property)."""
    Mj, Li = 12, 16
    j, i = np.mgrid[0:Mj, 0:Li]
    F = jnp.asarray(2.0 * i + 3.0 * j + 1.0)
    spec = nesting.RefineSpec(i0=3, j0=2, rf=2, Lm_c=10, Mm_c=8)
    out = nesting.refine2d(F, spec, 10, 14)
    jc, ic = nesting._child_coords(spec, 10, 14)
    expect = 2.0 * np.asarray(ic)[None, :] + \
        3.0 * np.asarray(jc)[:, None] + 1.0
    # away from the clamped domain edges the sample is exact
    np.testing.assert_allclose(np.asarray(out)[1:-1, 1:-1],
                               expect[1:-1, 1:-1], atol=1e-12)


@pytest.mark.slow
def test_two_way_feedback_stable():
    """Two-way cycle: child feedback replaces the parent overlap with
    box averages; the coupled system stays stable and the feedback is
    conservative (box mean preserves the child mean)."""
    cfg_p = kelvin.make_config(Lm=40, Mm=16, N=5)
    grid_p = kelvin.make_grid(cfg_p)
    m_p = Model(cfg_p, grid_p, kelvin.make_forcing_fn(cfg_p, grid_p),
                obc_fn=kelvin.make_obc_fn(cfg_p, grid_p))
    s_p = kelvin.make_initial(cfg_p, grid_p)

    rf = 2
    spec = nesting.RefineSpec(i0=10, j0=2, rf=rf, Lm_c=20, Mm_c=16)
    cfg_c = dataclasses.replace(
        cfg_p, Lm=spec.Lm_c, Mm=spec.Mm_c, dt=cfg_p.dt / rf,
        bc=C.BoundaryConfig(
            zeta=C.LBC.same(C.CLAMPED),
            ubar=C.LBC.same(C.FLATHER), vbar=C.LBC.same(C.FLATHER),
            u=C.LBC.same(C.RADIATION), v=C.LBC.same(C.RADIATION),
            t=C.LBC.same(C.RADIATION), tke=C.LBC.same(C.GRADIENT)))
    Mj_c, Li_c = cfg_c.shape2d
    h_c = nesting.refine2d(grid_p.h, spec, Mj_c, Li_c)
    f_c = nesting.refine2d(grid_p.f, spec, Mj_c, Li_c)
    pm_c = nesting.refine2d(grid_p.pm, spec, Mj_c, Li_c) * rf
    pn_c = nesting.refine2d(grid_p.pn, spec, Mj_c, Li_c) * rf
    grid_c = build_grid(cfg_c, h=np.asarray(h_c), pm=np.asarray(pm_c),
                        pn=np.asarray(pn_c), f=np.asarray(f_c))
    m_c = Model(cfg_c, grid_c, kelvin.make_forcing_fn(cfg_c, grid_c))

    from roms_tpu.core.state import initial_state
    jc, ic = nesting._child_coords(spec, Mj_c, Li_c)
    s_c = initial_state(
        cfg_c, grid_c,
        zeta=nesting.bilinear(s_p.zeta, jc, ic),
        u=nesting.bilinear(s_p.u, jc, ic),
        v=nesting.bilinear(s_p.v, jc, ic),
        t=nesting.bilinear(s_p.t, jc, ic), time0=0.0)

    s_p2, s_c2 = nesting.run_two_way(m_p, m_c, spec, s_p, s_c, 10)
    assert np.isfinite(np.asarray(s_p2.zeta)).all()
    assert np.isfinite(np.asarray(s_c2.zeta)).all()
    # feedback really wrote the child box means into the parent
    box = np.asarray(s_p2.zeta)[spec.j0 + 1:spec.j0 + 9,
                                spec.i0 + 1:spec.i0 + 11]
    ci = np.asarray(s_c2.zeta)[1:-1, 1:-1]
    nj, ni = box.shape
    mean = ci[:nj * 2, :ni * 2].reshape(nj, 2, ni, 2).mean(axis=(1, 3))
    np.testing.assert_allclose(box, mean, atol=1e-12)
