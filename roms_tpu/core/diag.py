"""Global diagnostics and blowup detection.

Re-implements ROMS/Nonlinear/diag.F:103-320: per-step basin-integrated
volume, kinetic/potential energy, maximum absolute velocity and maximum
Courant number, reduced over the (possibly sharded) domain — the
reference's mp_reduce becomes a plain jnp reduction that XLA lowers to
psum on a mesh.  The blowup criterion mirrors mod_scalars.F:548-580:
|speed| > max_speed, rho > max_rho, or non-finite -> exit_flag 1
(ExitFlag.BLOWS_UP); the full 0-9 taxonomy lives in core.errors.

Courant number (diag.F:243-249): C = Cu + Cv + Cw with
  Cu = 0.5*|u(i)+u(i+1)|*dt*pm,  Cv = 0.5*|v(j)+v(j+1)|*dt*pn,
  Cw = 0.5*|wvel(k-1)+wvel(k)|*dt/Hz,
where wvel ~ pm*pn*W is the physical vertical velocity at interfaces.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp

from .. import constants
from ..config import ModelConfig
from ..grid.grid import Grid
from ..ops import stencil as st
from .errors import ExitFlag  # noqa: F401  (re-export for callers)


class Diagnostics(NamedTuple):
    volume: jnp.ndarray       # basin volume (m3)
    avgke: jnp.ndarray        # mean kinetic energy per unit mass (m2/s2)
    avgpe: jnp.ndarray        # mean potential energy per unit mass
    max_speed: jnp.ndarray    # max |(u,v)| (m/s)
    max_courant: jnp.ndarray  # max 3D Courant number Cu+Cv+Cw
    max_courant_w: jnp.ndarray  # vertical part at the same criterion
    max_rho: jnp.ndarray      # max density anomaly (kg/m3)
    exit_flag: jnp.ndarray    # ExitFlag: 0 ok; 1 blowup
    blowup_cause: jnp.ndarray  # 0 none; 1 nonfinite; 2 speed; 3 Courant; 4 rho


def diag(cfg: ModelConfig, grid: Grid, state, max_speed: float = 20.0,
         max_courant: float = 10.0, max_rho: float = 200.0,
         W: Optional[jnp.ndarray] = None,
         rho: Optional[jnp.ndarray] = None) -> Diagnostics:
    """Compute global diagnostics from a model State.

    W (vertical volume flux at interfaces, m3/s) and rho (density
    anomaly) are recomputed from the state when not supplied — diag is
    an on-demand observability call, not part of the hot step."""
    u, v, zeta, Hz = state.u, state.v, state.zeta, state.Hz
    interior = grid.rmask.at[0, :].set(0).at[-1, :].set(0) \
        .at[:, 0].set(0).at[:, -1].set(0)
    omn = 1.0 / (grid.pm * grid.pn) * interior

    cell_vol = Hz * omn[None]
    volume = jnp.sum(cell_vol)

    u_r = 0.5 * (u + st.ip1(u))          # u at rho
    v_r = 0.5 * (v + st.jp1(v))
    ke = 0.5 * (u_r * u_r + v_r * v_r)
    avgke = jnp.sum(ke * cell_vol) / volume

    pe = 0.5 * cfg.g * zeta * zeta
    avgpe = jnp.sum(pe * omn) / jnp.sum((zeta + grid.h) * omn)

    speed = jnp.sqrt(u_r * u_r + v_r * v_r)
    spd_max = jnp.max(speed * interior[None])

    # --- 3D Courant number with the vertical |wvel|*dt/Hz term
    # (diag.F:243-249).  wvel ~ pm*pn*W converts the interface volume
    # flux to m/s.
    if W is None:
        from ..grid.depth import set_massflux
        from . import omega as omega_mod
        Huon, Hvom = set_massflux(grid, u, v, Hz)
        if cfg.bc.ew_periodic:
            Huon, Hvom = st.periodic_x(Huon), st.periodic_x(Hvom)
        if cfg.bc.ns_periodic:
            Huon, Hvom = st.periodic_y(Huon), st.periodic_y(Hvom)
        W = omega_mod.omega(cfg, grid, Huon, Hvom, state.z_w)
    cu_half = jnp.abs(u + st.ip1(u))     # |u(i)+u(i+1)| at rho
    cv_half = jnp.abs(v + st.jp1(v))
    Cu = 0.5 * cfg.dt * cu_half * grid.pm[None]
    Cv = 0.5 * cfg.dt * cv_half * grid.pn[None]
    wvel = (grid.pm * grid.pn)[None] * W
    Cw = 0.5 * cfg.dt * jnp.abs(wvel[:-1] + wvel[1:]) / Hz
    C = (Cu + Cv + Cw) * interior[None]
    cmax = jnp.max(C)
    # vertical component at the argmax cell (diag.F reports Cw of the
    # max-C location; a flat argmax over the masked array)
    flatC = C.reshape(-1)
    cmax_w = (Cw * interior[None]).reshape(-1)[jnp.argmax(flatC)]

    # --- density blowup criterion (diag.F my_maxrho vs max_rho)
    if rho is None:
        from .rho_eos import rho_eos
        rho = rho_eos(cfg, state.t, state.z_r, Hz, state.z_w)[0]
    rho_max = jnp.max(rho * interior[None])

    finite = (jnp.isfinite(spd_max) & jnp.isfinite(avgke)
              & jnp.isfinite(jnp.sum(zeta * interior)))
    over_speed = spd_max > max_speed
    over_cfl = cmax > max_courant
    over_rho = rho_max > max_rho
    blown = (~finite) | over_speed | over_cfl | over_rho
    cause = jnp.where(~finite, 1,
                      jnp.where(over_speed, 2,
                                jnp.where(over_cfl, 3,
                                          jnp.where(over_rho, 4, 0))))
    return Diagnostics(volume=volume, avgke=avgke, avgpe=avgpe,
                       max_speed=spd_max, max_courant=cmax,
                       max_courant_w=cmax_w, max_rho=rho_max,
                       exit_flag=blown.astype(jnp.int32) *
                       int(ExitFlag.BLOWS_UP),
                       blowup_cause=cause.astype(jnp.int32))


_CAUSES = {0: "none", 1: "non-finite field", 2: "max |v| exceeded",
           3: "max Courant exceeded", 4: "max rho exceeded"}


def blowup_string(d: Diagnostics) -> str:
    """Human-readable blowup report (mod_scalars blowup_string)."""
    cause = _CAUSES[int(d.blowup_cause)]
    return (f"exit_flag={int(d.exit_flag)} cause={cause} "
            f"speed={float(d.max_speed):.3e} C={float(d.max_courant):.3e} "
            f"Cw={float(d.max_courant_w):.3e} rho={float(d.max_rho):.3e}")
