"""Generalized FB AB3-AM4 barotropic engine (step2d_FB.h, wired here
though unwired in the reference)."""

import numpy as np

from roms_tpu.core.stepping import Model
from roms_tpu.functionals import upwelling


def _run(scheme, nsteps=30, **kw):
    cfg = upwelling.make_config(Lm=24, Mm=24, N=8,
                                dtype="float64").replace(
        step2d=scheme, **kw)
    grid = upwelling.make_grid(cfg)
    s0 = upwelling.make_initial(cfg, grid)
    m = Model(cfg, grid, upwelling.make_forcing_fn(cfg, grid),
              vmix_fn=upwelling.make_vmix_fn(cfg))
    return m.run(s0, nsteps)


class TestStepFB:
    def test_fb_stable_and_tracks_lf_am3(self):
        """Both barotropic engines integrate the same physics: after 30
        baroclinic steps of the UPWELLING spin-up the solutions agree
        closely (same split-explicit system, different fast
        stepping)."""
        s_lf = _run("lf_am3")
        s_fb = _run("fb")
        a = np.asarray
        for f in ("zeta", "ubar", "vbar", "u", "v"):
            x = a(getattr(s_fb, f))
            assert np.isfinite(x).all(), f
        amp = np.abs(a(s_lf.zeta)).max() + 1e-12
        diff = np.abs(a(s_fb.zeta) - a(s_lf.zeta)).max()
        assert diff < 0.2 * amp, (diff, amp)
        du = np.abs(a(s_fb.u) - a(s_lf.u)).max()
        assert du < 0.2 * (np.abs(a(s_lf.u)).max() + 1e-9)

    def test_fb_volume_conservation(self):
        """Closed basin: the FB free surface conserves volume to
        roundoff."""
        import jax.numpy as jnp
        s0_mean = None
        cfg = upwelling.make_config(Lm=24, Mm=24, N=8,
                                    dtype="float64").replace(
            step2d="fb")
        grid = upwelling.make_grid(cfg)
        s0 = upwelling.make_initial(cfg, grid)
        m = Model(cfg, grid, upwelling.make_forcing_fn(cfg, grid),
                  vmix_fn=upwelling.make_vmix_fn(cfg))
        omn = 1.0 / (np.asarray(grid.pm) * np.asarray(grid.pn))
        v0 = (np.asarray(s0.zeta)[1:-1, 1:-1]
              * omn[1:-1, 1:-1]).sum()
        s = m.run(s0, 20)
        v1 = (np.asarray(s.zeta)[1:-1, 1:-1] * omn[1:-1, 1:-1]).sum()
        area = omn[1:-1, 1:-1].sum()
        assert abs(v1 - v0) / area < 1e-8
