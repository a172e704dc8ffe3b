"""Isopycnal (epineutral) rotated tracer diffusion (t3dmix2_iso.h).

On SEAMOUNT the s-surfaces dive steeply over the topography while the
initial isopycnals are flat.  Diffusing a stratified tracer along
s-surfaces mixes across density surfaces and spins up spurious
currents; the isopycnally-rotated operator must not."""

import dataclasses

import numpy as np

from roms_tpu.core.stepping import Model
from roms_tpu.functionals import idealized as ia


def _run(mix_iso, mix_geo=False, nsteps=30, tnu=500.0):
    cfg = ia.seamount_config()
    cfg = cfg.replace(mixing=dataclasses.replace(
        cfg.mixing, mix_iso_ts=mix_iso, mix_geo_ts=mix_geo,
        tnu2=(tnu, tnu), ts_mix_limit="max_slope"))
    grid = ia.seamount_grid(cfg)
    s0 = ia.seamount_initial(cfg, grid)
    m = Model(cfg, grid, ia.zero_forcing(cfg))
    s = m.run(s0, nsteps)
    return s0, s


class TestIsoMixing:
    def test_flat_isopycnals_preserved(self):
        """With flat isopycnals, the iso-rotated flux vanishes: the
        temperature field stays horizontally uniform to high accuracy,
        while along-sigma diffusion visibly distorts it."""
        s0_i, s_iso = _run(mix_iso=True)
        s0_s, s_sig = _run(mix_iso=False)

        def drift(s0, s):
            # interior levels: the reference zeroes the rotation term
            # at the top/bottom interfaces (dTdr(0)=dTdr(N)=0), so the
            # outermost layers are only half-rotated by construction
            return np.abs(np.asarray(s.t[0]) -
                          np.asarray(s0.t[0]))[2:-2, 1:-1, 1:-1].max()

        d_iso = drift(s0_i, s_iso)
        d_sig = drift(s0_s, s_sig)
        assert np.isfinite(np.asarray(s_iso.t[0])).all()
        # flat isopycnals: the rotated flux nearly vanishes, so the
        # temperature drift must be far below the along-sigma case
        assert d_iso < 0.2 * d_sig, (d_iso, d_sig)

    def test_spurious_currents_smaller(self):
        """Spurious velocities driven by diapycnal leakage are much
        weaker with the isopycnal rotation."""
        _, s_iso = _run(mix_iso=True)
        _, s_sig = _run(mix_iso=False)
        u_iso = np.abs(np.asarray(s_iso.u)).max()
        u_sig = np.abs(np.asarray(s_sig.u)).max()
        assert u_iso < u_sig, (u_iso, u_sig)


def test_biharmonic_geo_runs_and_selective():
    """t3dmix4_geo: rotated biharmonic stays stable and, like the
    harmonic rotation, perturbs a flat-isopycnal stratification far
    less than the along-sigma biharmonic."""
    import dataclasses
    import numpy as np
    from roms_tpu.core.stepping import Model
    from roms_tpu.functionals import idealized as ia

    def run(geo):
        cfg = ia.seamount_config()
        cfg = cfg.replace(mixing=dataclasses.replace(
            cfg.mixing, mix_geo_ts=geo, tnu4=(1.0e8, 1.0e8)))
        grid = ia.seamount_grid(cfg)
        s0 = ia.seamount_initial(cfg, grid)
        m = Model(cfg, grid, ia.zero_forcing(cfg))
        s = m.run(s0, 20)
        return s0, s

    s0g, sg = run(True)
    s0s, ss = run(False)
    dg = np.abs(np.asarray(sg.t[0]) - np.asarray(s0g.t[0]))[2:-2].max()
    dsig = np.abs(np.asarray(ss.t[0]) - np.asarray(s0s.t[0]))[2:-2].max()
    assert np.isfinite(np.asarray(sg.t[0])).all()
    assert dg < dsig, (dg, dsig)


def test_biharmonic_iso_selective():
    """t3dmix4_iso: rotated biharmonic leaves flat isopycnals nearly
    untouched in the interior while the sigma biharmonic does not."""
    import dataclasses
    import numpy as np
    from roms_tpu.core.stepping import Model
    from roms_tpu.functionals import idealized as ia

    def run(iso):
        cfg = ia.seamount_config()
        cfg = cfg.replace(mixing=dataclasses.replace(
            cfg.mixing, mix_iso_ts=iso, tnu4=(1.0e8, 1.0e8),
            ts_mix_limit="max_slope"))
        grid = ia.seamount_grid(cfg)
        s0 = ia.seamount_initial(cfg, grid)
        m = Model(cfg, grid, ia.zero_forcing(cfg))
        return s0, m.run(s0, 20)

    s0i, si = run(True)
    s0s, ss = run(False)
    di = np.abs(np.asarray(si.t[0]) - np.asarray(s0i.t[0]))[2:-2].max()
    ds = np.abs(np.asarray(ss.t[0]) - np.asarray(s0s.t[0]))[2:-2].max()
    assert np.isfinite(np.asarray(si.t[0])).all()
    assert di < 0.25 * ds, (di, ds)


def test_uv3dmix2_geo():
    """Rotated momentum viscosity (uv3dmix2_geo.h): agrees with the
    along-s operator in the small-slope limit and stays stable over
    steep topography."""
    import dataclasses
    import numpy as np
    from roms_tpu.core.stepping import Model
    from roms_tpu.functionals import idealized as ia, upwelling

    # small-slope limit: UPWELLING (gentle y-slope only)
    def run_up(geo):
        cfg = upwelling.make_config(dtype="float64")
        cfg = cfg.replace(mixing=dataclasses.replace(
            cfg.mixing, mix_geo_uv=geo))
        grid = upwelling.make_grid(cfg)
        m = Model(cfg, grid, upwelling.make_forcing_fn(cfg, grid),
                  vmix_fn=upwelling.make_vmix_fn(cfg))
        return m.run(upwelling.make_initial(cfg, grid), 20)

    sg = run_up(True)
    ss = run_up(False)
    d = np.abs(np.asarray(sg.u) - np.asarray(ss.u)).max()
    ref = np.abs(np.asarray(ss.u)).max()
    assert d < 0.01 * ref, (d, ref)

    # steep-slope stability: SEAMOUNT with strong viscosity
    cfg = ia.seamount_config()
    cfg = cfg.replace(mixing=dataclasses.replace(
        cfg.mixing, mix_geo_uv=True, visc2=200.0))
    grid = ia.seamount_grid(cfg)
    m = Model(cfg, grid, ia.zero_forcing(cfg))
    s = m.run(ia.seamount_initial(cfg, grid), 30)
    assert np.isfinite(np.asarray(s.u)).all()
    assert np.abs(np.asarray(s.u)).max() < 0.05


def test_uv3dmix4_geo():
    """Rotated biharmonic momentum viscosity: damps grid-scale noise,
    leaves a uniform flow untouched, stays stable coupled."""
    import dataclasses
    import jax.numpy as jnp
    import numpy as np
    from roms_tpu.core import hmix
    from roms_tpu.core.stepping import Model
    from roms_tpu.functionals import upwelling
    cfg = upwelling.make_config(Lm=16, Mm=16, N=6, dtype="float64")
    cfg = cfg.replace(mixing=dataclasses.replace(
        cfg.mixing, mix_geo_uv=True, visc4=1.0e8, visc2=0.0))
    grid = upwelling.make_grid(cfg)
    s0 = upwelling.make_initial(cfg, grid)
    Hz, z_r = s0.Hz, s0.z_r
    z2 = jnp.zeros_like(s0.zeta)
    # uniform flow: the operator must vanish in the interior
    u_u = jnp.full_like(s0.u, 0.1)
    v_u = jnp.zeros_like(s0.v)
    up, vp, rf, rv = hmix.uv3dmix4_geo(
        cfg, grid, u_u, v_u, jnp.zeros_like(u_u), jnp.zeros_like(v_u),
        Hz, z_r, z2, z2)
    assert np.abs(np.asarray(up)[:, 4:-4, 4:-4]).max() < 1e-10
    # checkerboard noise is damped (increment opposes the noise)
    jj, ii = np.meshgrid(np.arange(cfg.shape2d[0]),
                         np.arange(cfg.shape2d[1]), indexing="ij")
    noise = 0.01 * (-1.0) ** (jj + ii)
    u_n = jnp.asarray(np.broadcast_to(noise[None], s0.u.shape))
    up, vp, _, _ = hmix.uv3dmix4_geo(
        cfg, grid, u_n, v_u, jnp.zeros_like(u_n), jnp.zeros_like(v_u),
        Hz, z_r, z2, z2)
    corr = float(jnp.sum(up[:, 4:-4, 4:-4] * u_n[:, 4:-4, 4:-4]))
    assert corr < 0.0, corr
    # coupled run stays finite
    m = Model(cfg, grid, upwelling.make_forcing_fn(cfg, grid),
              vmix_fn=upwelling.make_vmix_fn(cfg))
    s = m.run(s0, 10)
    assert np.isfinite(np.asarray(s.u)).all()
