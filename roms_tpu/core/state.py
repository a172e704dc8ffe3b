"""Model state and forcing pytrees.

The reference stores prognostic fields with rotating time-slot indices
(kstp/krhs/knew for the fast engine, nstp/nrhs/nnew for the slow one;
ROMS/Modules/mod_stepping.F:25-72, mod_ocean.F:84-349).  Functionally the
rotation is just a fixed dataflow, so the TPU state carries *named* time
levels instead and each step returns a new pytree — no traced slot indices,
no dynamic indexing under jit.

Mapping to the reference's slots at entry of baroclinic step n:
  u, v, t           <-> u(:,:,:,nstp), t(:,:,:,nstp,:)    (time n)
  t_prev            <-> t(:,:,:,nnew,:)                   (time n-1)
  ru_prev, rv_prev  <-> ru(:,:,:,indx=3-nrhs)             (RHS at n-1)
  ru_prev2, rv_prev2<-> ru(:,:,:,nrhs) before overwrite   (RHS at n-2)
  ru0_prev, ...     <-> ru(:,:,0,nnew)                    (rufrc at n-1)
  ru0_prev2, ...    <-> ru(:,:,0,nstp) before overwrite   (rufrc at n-2)
  zeta              <-> Zt_avg1 == zeta(:,:,1) == zeta(:,:,2) after set_zeta
  ubar, vbar        <-> ubar(:,:,1) == ubar(:,:,2) after step3d_uv coupling
  z_r, z_w, Hz      <-> GRID depths from the latest set_depth
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax.numpy as jnp

from ..config import ModelConfig
from ..grid.depth import set_depth
from ..grid.grid import Grid


class Forcing(NamedTuple):
    sustr: jnp.ndarray     # kinematic surface U-stress (m2/s2), U points
    svstr: jnp.ndarray     # V points
    stflx: jnp.ndarray     # (NT, Mj, Li) surface tracer flux (Tunits m/s)
    btflx: jnp.ndarray     # bottom tracer flux
    srflx: jnp.ndarray     # shortwave (degC m/s)


class State(NamedTuple):
    time: jnp.ndarray      # seconds since initialization
    iic: jnp.ndarray       # completed baroclinic steps (int32)

    zeta: jnp.ndarray      # (Mj, Li) free surface, fast-time averaged
    ubar: jnp.ndarray
    vbar: jnp.ndarray

    u: jnp.ndarray         # (N, Mj, Li)
    v: jnp.ndarray
    t: jnp.ndarray         # (NT, N, Mj, Li)
    t_prev: jnp.ndarray

    ru_prev: jnp.ndarray   # (N, Mj, Li) 3D RHS history (AB3)
    rv_prev: jnp.ndarray
    ru_prev2: jnp.ndarray
    rv_prev2: jnp.ndarray

    ru0_prev: jnp.ndarray  # (Mj, Li) 2D coupling forcing history
    rv0_prev: jnp.ndarray
    ru0_prev2: jnp.ndarray
    rv0_prev2: jnp.ndarray

    z_r: jnp.ndarray       # (N, Mj, Li)
    z_w: jnp.ndarray       # (N+1, Mj, Li)
    Hz: jnp.ndarray        # (N, Mj, Li)

    # Optional turbulence-closure state (GLS/MY25), None otherwise.
    mix: Any = None
    # Optional sediment bed state, None otherwise.
    sed: Any = None
    # BBL prognostic ripple geometry (core/bbl.py BBLState)
    bbl: Any = None
    # sea ice state (core/seaice.py IceState)
    ice: Any = None


def initial_state(cfg: ModelConfig, grid: Grid, *, zeta=None, u=None, v=None,
                  t=None, time0: float = 0.0, mix=None, sed=None) -> State:
    """Build the initial state (cold start, reference initial.F semantics).

    ubar/vbar are the vertical averages of u/v (ini_fields.F:340-400);
    both AB history levels start at zero, handled by the first-step
    Forward-Euler coefficients.
    """
    dtype = jnp.dtype(cfg.dtype)
    Mj, Li = cfg.shape2d
    N, NT = cfg.N, cfg.NT

    zeta = jnp.zeros((Mj, Li), dtype) if zeta is None else jnp.asarray(zeta, dtype)
    u = jnp.zeros((N, Mj, Li), dtype) if u is None else jnp.asarray(u, dtype)
    v = jnp.zeros((N, Mj, Li), dtype) if v is None else jnp.asarray(v, dtype)
    t = jnp.zeros((NT, N, Mj, Li), dtype) if t is None else jnp.asarray(t, dtype)

    z_r, z_w, Hz = set_depth(grid, zeta)

    from ..ops import stencil as st
    Hz_u = st.avg_x(Hz)
    Hz_v = st.avg_y(Hz)
    ubar = jnp.sum(Hz_u * u, axis=0) / jnp.sum(Hz_u, axis=0)
    vbar = jnp.sum(Hz_v * v, axis=0) / jnp.sum(Hz_v, axis=0)

    zeros2 = jnp.zeros((Mj, Li), dtype)
    zeros3 = jnp.zeros((N, Mj, Li), dtype)

    if mix is None and cfg.mixing.vmix == "gls":
        from .gls import initial_mix
        mix = initial_mix(cfg)
    elif mix is None and cfg.mixing.vmix == "my25":
        from .my25 import initial_mix_my25
        mix = initial_mix_my25(cfg)

    return State(
        time=jnp.asarray(time0, dtype),
        iic=jnp.asarray(0, jnp.int32),
        zeta=zeta, ubar=ubar, vbar=vbar,
        u=u, v=v, t=t, t_prev=t,
        ru_prev=zeros3, rv_prev=zeros3,
        ru_prev2=zeros3, rv_prev2=zeros3,
        ru0_prev=zeros2, rv0_prev=zeros2,
        ru0_prev2=zeros2, rv0_prev2=zeros2,
        z_r=z_r, z_w=z_w, Hz=Hz,
        mix=mix, sed=sed,
    )
