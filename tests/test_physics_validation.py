"""Quantitative physics validation against analytic solutions —
field-level accuracy checks beyond stability (SURVEY.md §4 golden
configs)."""

import dataclasses
import math

import jax.numpy as jnp
import numpy as np
import pytest

from roms_tpu.core.stepping import Model
from roms_tpu.functionals import kelvin, upwelling


def test_inertial_oscillation_period():
    """Unforced doubly-periodic f-plane with uniform initial flow: the
    velocity vector rotates at the inertial frequency with no decay
    (u stays spatially uniform, so no pressure gradients arise)."""
    from roms_tpu import config as C
    from roms_tpu.functionals import idealized as ia
    from roms_tpu.grid.grid import build_grid

    cfg = upwelling.make_config(dtype="float64")
    cfg = cfg.replace(
        drag=dataclasses.replace(cfg.drag, kind="none"),
        bc=C.BoundaryConfig.uniform(C.LBC.same(C.PERIODIC)))
    Mj, Li = cfg.shape2d
    f0 = -8.26e-5
    grid = build_grid(cfg, h=np.full((Mj, Li), 150.0),
                      pm=np.full((Mj, Li), 1.0 / 2000.0),
                      pn=np.full((Mj, Li), 1.0 / 2000.0),
                      f=np.full((Mj, Li), f0))
    s0 = upwelling.make_initial(cfg, grid)
    u0 = 0.05
    s0 = s0._replace(u=jnp.full_like(s0.u, u0),
                     ubar=jnp.full_like(s0.ubar, u0))
    m = Model(cfg, grid, ia.zero_forcing(cfg),
              vmix_fn=upwelling.make_vmix_fn(cfg))
    nsteps = 40
    s = m.run(s0, nsteps)
    T = nsteps * cfg.dt
    uu = float(np.asarray(s.u)[8, 40, 20])
    vv = float(np.asarray(s.v)[8, 40, 20])
    speed = math.hypot(uu, vv)
    assert abs(speed - u0) < 0.05 * u0          # energy preserved
    angle = math.atan2(vv, uu)
    expect = -f0 * T                             # anticlockwise (f<0)
    diff = (angle - expect + math.pi) % (2 * math.pi) - math.pi
    assert abs(diff) < 0.15, (angle, expect)


def test_kelvin_phase_speed():
    """The coastal Kelvin wave propagates at c = sqrt(g H) along the
    southern wall: track the crest between two times."""
    cfg = kelvin.make_config(Lm=60, Mm=16, N=5)
    grid = kelvin.make_grid(cfg)
    m = Model(cfg, grid, kelvin.make_forcing_fn(cfg, grid),
              obc_fn=kelvin.make_obc_fn(cfg, grid))
    s = kelvin.make_initial(cfg, grid)

    H = float(np.asarray(grid.h).max())
    c_theory = math.sqrt(cfg.g * H)
    dx = 1.0 / float(np.asarray(grid.pm)[2, 2])

    def crest(state):
        z = np.asarray(state.zeta)[2, 2:-2]      # along-coast section
        return np.argmax(z)

    n1, n2 = 20, 30
    s = m.run(s, n1)
    x1 = crest(s)
    s = m.run(s, n2 - n1)
    x2 = crest(s)
    c_num = (x2 - x1) * dx / ((n2 - n1) * cfg.dt)
    assert abs(c_num - c_theory) < 0.25 * c_theory, (c_num, c_theory)


def test_geostrophic_balance_maintained():
    """A geostrophically balanced jet on an f-plane stays near balance
    (the pressure-gradient/Coriolis discretizations are compatible):
    kinetic energy changes by <5% over an inertial period."""
    cfg = upwelling.make_config(dtype="float64")
    grid = upwelling.make_grid(cfg)
    f0 = float(np.asarray(grid.f)[10, 10])
    Mj, Li = cfg.shape2d
    # free surface eta(y) = -a * tanh((y-y0)/w): u_g = -(g/f) d(eta)/dy
    y = np.arange(Mj, dtype=np.float64)[:, None] * np.ones((1, Li))
    dy = 1.0 / float(np.asarray(grid.pn)[2, 2])
    a, y0, w = 0.05, Mj / 2.0, 8.0
    eta = -a * np.tanh((y - y0) / w)
    deta_dy = -a / np.cosh((y - y0) / w) ** 2 / (w * dy)
    ug = -(cfg.g / f0) * deta_dy
    s0 = upwelling.make_initial(cfg, grid)
    s0 = s0._replace(zeta=jnp.asarray(eta),
                     u=jnp.broadcast_to(jnp.asarray(ug)[None],
                                        s0.u.shape),
                     ubar=jnp.asarray(ug))
    cfg2 = cfg.replace(drag=dataclasses.replace(cfg.drag, kind="none"))
    m = Model(cfg2, grid, upwelling.make_forcing_fn(cfg2, grid),
              vmix_fn=upwelling.make_vmix_fn(cfg2))
    nsteps = max(4, int(2 * math.pi / f0 / cfg.dt))
    s = m.run(s0, nsteps)

    def ke(state):
        return float((np.asarray(state.u) ** 2).sum()
                     + (np.asarray(state.v) ** 2).sum())

    ke0 = float((np.asarray(s0.u) ** 2).sum())
    ke1 = ke(s)
    assert np.isfinite(np.asarray(s.u)).all()
    assert abs(ke1 - ke0) < 0.10 * ke0, (ke0, ke1)


@pytest.mark.quick
class TestEOSCheckValues:
    """Exact Jackett & McDougall check values (rho_eos.F:21-37):
    T=3 C, S=35.5 PSU, Z=-5000 m.  These pin the discretization's EOS
    to the reference's documented numbers at double precision."""

    def _tz(self):
        T = jnp.full((1, 1, 1), 3.0, jnp.float64)
        S = jnp.full((1, 1, 1), 35.5, jnp.float64)
        z = jnp.full((1, 1, 1), -5000.0, jnp.float64)
        return jnp.stack([T, S]), z

    def _cfg(self):
        from roms_tpu import config as C
        return upwelling.make_config(dtype="float64").replace(
            eos=C.EOSConfig(linear=False))

    def test_den(self):
        from roms_tpu.core.rho_eos import rho_eos_jm95
        t, z = self._tz()
        den = float(rho_eos_jm95(self._cfg(), t, z)[0, 0, 0]) + 1000.0
        assert abs(den - 1050.3639165364) < 1e-9, den

    def test_den1(self):
        from roms_tpu.core.rho_eos import _jm95_parts
        t, _ = self._tz()
        den1 = float(_jm95_parts(self._cfg(), t)[3][0, 0, 0])
        assert abs(den1 - 1028.2845117925) < 1e-9, den1

    def test_alpha_beta(self):
        from roms_tpu.core.rho_eos import eos_alpha_beta
        t, z = self._tz()
        alpha, beta = eos_alpha_beta(self._cfg(), t, z)
        assert abs(float(alpha.ravel()[0]) - 2.1014611551470e-04) < 1e-15
        assert abs(float(beta.ravel()[0]) - 7.2575037309946e-04) < 1e-15


def test_diag_vertical_courant_and_taxonomy():
    """diag includes the |wvel|*dt/Hz vertical Courant term
    (diag.F:243-249) and reports the blowup cause taxonomy."""
    from roms_tpu.core import diag as diag_mod
    cfg = upwelling.make_config(dtype="float64")
    grid = upwelling.make_grid(cfg)
    s0 = upwelling.make_initial(cfg, grid)
    d = diag_mod.diag(cfg, grid, s0)
    assert int(d.exit_flag) == 0 and int(d.blowup_cause) == 0
    # a convergent horizontal flow must produce nonzero W -> Cw > 0
    Mj, Li = cfg.shape2d
    x = np.linspace(-1, 1, Li)[None, :] * np.ones((Mj, 1))
    u = -0.5 * np.broadcast_to(x, s0.u.shape)    # du/dx < 0: convergence
    s1 = s0._replace(u=jnp.asarray(u))
    d1 = diag_mod.diag(cfg, grid, s1)
    assert float(d1.max_courant_w) > 0.0
    assert float(d1.max_courant) >= float(d1.max_courant_w)
    # blowup: non-finite field -> exit_flag 1, cause 1
    s2 = s0._replace(zeta=s0.zeta.at[5, 5].set(jnp.nan))
    d2 = diag_mod.diag(cfg, grid, s2)
    assert int(d2.exit_flag) == 1 and int(d2.blowup_cause) == 1
    assert "non-finite" in diag_mod.blowup_string(d2)


def test_roms_in_strict_mode():
    """strict=True accepts the full reference UPWELLING deck and rejects
    unknown keywords with the ILLEGAL_INPUT exit code."""
    import pytest
    from roms_tpu.core.errors import RomsError
    from roms_tpu.io import roms_in
    path = "/root/reference/ROMS/External/roms_upwelling.in"
    params = roms_in.parse_roms_in(path)
    unknown = roms_in.check_keywords(params)
    assert unknown == [], unknown
    cfg = roms_in.to_config(params, strict=True)
    assert cfg.Lm == 41 and cfg.Mm == 80 and cfg.N == 16
    with pytest.raises(RomsError) as ei:
        roms_in.to_config({"NOT_A_KEY": 1.0}, strict=True)
    assert ei.value.exit_flag == 7
    assert "NOT_A_KEY" in str(ei.value)
