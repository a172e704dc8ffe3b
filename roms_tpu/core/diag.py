"""Global diagnostics and blowup detection.

Re-implements ROMS/Nonlinear/diag.F:103-260: per-step basin-integrated
volume, kinetic/potential energy, maximum absolute velocity and maximum
Courant number, reduced over the (possibly sharded) domain — the
reference's mp_reduce becomes a plain jnp reduction that XLA lowers to
psum on a mesh.  The blowup criterion mirrors mod_scalars.F:548-559:
|speed| > max_speed or non-finite -> exit_flag 1.

Courant number (diag.F:175-205): C = dt*(|u|*pm + |v|*pn + |W/Hz|).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from .. import constants
from ..config import ModelConfig
from ..grid.grid import Grid
from ..ops import stencil as st


class Diagnostics(NamedTuple):
    volume: jnp.ndarray       # basin volume (m3)
    avgke: jnp.ndarray        # mean kinetic energy per unit mass (m2/s2)
    avgpe: jnp.ndarray        # mean potential energy per unit mass
    max_speed: jnp.ndarray    # max |(u,v)| (m/s)
    max_courant: jnp.ndarray  # max 3D Courant number
    exit_flag: jnp.ndarray    # 0 ok; 1 blowup (mod_scalars.F:548)


def diag(cfg: ModelConfig, grid: Grid, state, max_speed: float = 20.0,
         max_courant: float = 10.0) -> Diagnostics:
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

    pm_u = 0.5 * (grid.pm + st.im1(grid.pm))
    pn_v = 0.5 * (grid.pn + st.jm1(grid.pn))
    cu = jnp.abs(u) * pm_u[None]
    cv = jnp.abs(v) * pn_v[None]
    C = cfg.dt * (0.5 * (cu + st.ip1(cu)) + 0.5 * (cv + st.jp1(cv)))
    cmax = jnp.max(C * interior[None])

    finite = (jnp.isfinite(spd_max) & jnp.isfinite(avgke)
              & jnp.isfinite(jnp.sum(zeta * interior)))
    blown = (~finite) | (spd_max > max_speed) | (cmax > max_courant)
    return Diagnostics(volume=volume, avgke=avgke, avgpe=avgpe,
                       max_speed=spd_max, max_courant=cmax,
                       exit_flag=blown.astype(jnp.int32))
