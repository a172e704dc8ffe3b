"""Lagrangian float trajectories.

Re-implements ROMS/Nonlinear/step_floats.F: 4th-order Runge-Kutta (well,
the reference uses a 4-level Milne/Hamming predictor-corrector; here a
classical RK4 with the same per-stage field interpolation) in fractional
grid coordinates, with trilinear interpolation of (u*pm, v*pn, omega/Hz)
at float positions (interp_floats.F).  Float state is a dense (Nfloats,)
batch — vmapped interpolation, no per-float loops.

Positions are stored in grid units: x in [0.5, Lm+0.5] (rho-column
coordinate), y likewise, s in [-1, 0] vertical sigma.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import ModelConfig
from ..grid.grid import Grid
from ..ops import stencil as st


class Floats(NamedTuple):
    x: jnp.ndarray      # (Nf,) fractional xi index at rho points
    y: jnp.ndarray      # (Nf,) fractional eta index
    s: jnp.ndarray      # (Nf,) sigma in [-1, 0]
    bounded: jnp.ndarray  # (Nf,) bool: still inside the domain


def _interp2(f2, x, y):
    """Bilinear interpolation of a 2-D field at fractional (y, x)."""
    Mj, Li = f2.shape[-2:]
    x0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, Li - 2)
    y0 = jnp.clip(jnp.floor(y).astype(jnp.int32), 0, Mj - 2)
    ax = jnp.clip(x - x0, 0.0, 1.0)
    ay = jnp.clip(y - y0, 0.0, 1.0)
    f00 = f2[..., y0, x0]
    f01 = f2[..., y0, x0 + 1]
    f10 = f2[..., y0 + 1, x0]
    f11 = f2[..., y0 + 1, x0 + 1]
    return ((1 - ay) * ((1 - ax) * f00 + ax * f01)
            + ay * ((1 - ax) * f10 + ax * f11))


def _interp3(f3, x, y, s, sc_r):
    """Trilinear interpolation of a (N, Mj, Li) field; s in [-1, 0]
    against the rho-level sigma table sc_r."""
    N = f3.shape[0]
    # fractional level from the (monotone) sc_r table
    k = jnp.clip(jnp.searchsorted(sc_r, s) - 1, 0, N - 2)
    s0 = sc_r[k]
    s1 = sc_r[k + 1]
    az = jnp.clip((s - s0) / (s1 - s0), 0.0, 1.0)
    # gather per-float levels
    fk = jax.vmap(lambda kk, xx, yy: _interp2(f3[kk], xx, yy))(k, x, y)
    fk1 = jax.vmap(lambda kk, xx, yy: _interp2(f3[kk], xx, yy))(k + 1,
                                                                x, y)
    return (1 - az) * fk + az * fk1


def step_floats(cfg: ModelConfig, grid: Grid, flt: Floats,
                u, v, W, Hz, sc_r, Akt=None, key=None,
                w_extra=None) -> Floats:
    """Advance float positions one baroclinic dt with RK4.

    With Akt (interface diffusivity, (N+1, Mj, Li)) and a PRNG key,
    adds the FLOAT_VWALK vertical random walk (vwalk_floats.F:196-220,
    Hunter et al 1993):  w = sqrt(2 Akt / dt) * N(0,1) + dAkt/dz,
    the gradient term being the Visser drift that keeps particles from
    accumulating in low-diffusivity layers.

    w_extra: optional (Nf,) per-float vertical velocity (m/s, positive
    up) from biological behavior (biology_floats.F w_bio), added as a
    sigma-rate using the local water-column depth."""
    dt = cfg.dt
    Mj, Li = cfg.shape2d
    # grid-relative velocities: dx/dt = u * pm (cells/s)
    u_r = 0.5 * (u + st.ip1(u))          # at rho points
    v_r = 0.5 * (v + st.jp1(v))
    upm = u_r * grid.pm[None]
    vpn = v_r * grid.pn[None]
    # ds/dt = omega / (Hz * N) in sigma units: omega [m3/s-like of
    # divergence-integrated W/(dx dy)] -> w_sigma = W*pm*pn / D
    D = jnp.sum(Hz, axis=0)
    Wc = 0.5 * (W[1:] + W[:-1]) * (grid.pm * grid.pn)[None]
    wsig = Wc / D[None]                  # d(sigma-fraction)/dt per level

    def vel(p):
        x, y, s = p
        du = _interp3(upm, x, y, s, sc_r)
        dv = _interp3(vpn, x, y, s, sc_r)
        dw = _interp3(wsig, x, y, s, sc_r)
        return jnp.stack([du, dv, dw])

    p0 = jnp.stack([flt.x, flt.y, flt.s])
    k1 = vel(p0)
    k2 = vel(p0 + 0.5 * dt * k1)
    k3 = vel(p0 + 0.5 * dt * k2)
    k4 = vel(p0 + dt * k3)
    p1 = p0 + (dt / 6.0) * (k1 + 2 * k2 + 2 * k3 + k4)

    x, y, s = p1

    if Akt is not None and key is not None:
        # vertical random walk in physical z, converted to sigma
        D = jnp.sum(Hz, axis=0)
        Ak_c = 0.5 * (Akt[1:] + Akt[:-1])         # at rho levels
        dz = Hz
        dAkdz = (Akt[1:] - Akt[:-1]) / jnp.maximum(dz, 1e-6)
        ak_f = _interp3(Ak_c, x, y, s, sc_r)
        dak_f = _interp3(dAkdz, x, y, s, sc_r)
        import jax.random as jrandom
        rw = jrandom.normal(key, x.shape)
        w_rw = jnp.sqrt(2.0 * jnp.maximum(ak_f, 0.0) / dt) * rw + dak_f
        D_f = jax.vmap(lambda xx, yy: _interp2(D, xx, yy))(x, y)
        s = s + dt * w_rw / jnp.maximum(D_f, 1e-6)

    if w_extra is not None:
        D = jnp.sum(Hz, axis=0)
        D_f = jax.vmap(lambda xx, yy: _interp2(D, xx, yy))(x, y)
        s = s + dt * w_extra / jnp.maximum(D_f, 1e-6)

    if cfg.bc.ew_periodic:
        x = jnp.mod(x - 1.0, float(cfg.Lm)) + 1.0
    s = jnp.clip(s, -1.0, 0.0)
    bounded = flt.bounded & (x > 0.5) & (x < cfg.Lm + 0.5) & \
        (y > 0.5) & (y < cfg.Mm + 0.5)
    # frozen once they leave (step_floats.F bounded logic)
    x = jnp.where(bounded, x, flt.x)
    y = jnp.where(bounded, y, flt.y)
    s = jnp.where(bounded, s, flt.s)
    return Floats(x=x, y=y, s=s, bounded=bounded)
