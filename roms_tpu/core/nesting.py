"""One-way grid refinement (nesting).

Round-1 slice of the reference nesting subsystem (ROMS/Nonlinear/
nesting.F, ROMS/Utility/set_contact.F): a refined child grid embedded
in a parent at integer ratio `rf`, driven one-way through its open
boundaries.  The donor-receiver machinery reduces to:

  - `refine2d` / contact extraction: bilinear interpolation of parent
    rho-point fields onto child points (set_contact.F contact-point
    weights are exactly the bilinear weights for coincident refined
    grids, nesting.F:get_contact/put_refine);
  - `make_child_obc_fn`: samples the parent trajectory (snapshots at
    the parent step) at the child's boundary rings with linear time
    interpolation, feeding the child's clamped zeta + Flather 2D +
    radiation-nudged 3D open boundaries.

Two-way feedback (fine-to-coarse averaging, nesting.F:put_composite)
follows in a later round.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp

from ..config import ModelConfig


@dataclass(frozen=True)
class RefineSpec:
    """Child placement: the child's interior rho cell (0,0) maps into
    the parent at rho index (j0 + 1/(2 rf), i0 + 1/(2 rf))."""
    i0: int          # parent rho-index of the child SW corner
    j0: int
    rf: int          # refinement ratio
    Lm_c: int        # child interior dimensions
    Mm_c: int


def _child_coords(spec: RefineSpec, Mj_c, Li_c):
    """Parent fractional rho coordinates of every child rho point
    (including the child boundary ring)."""
    rf = spec.rf
    ic = (jnp.arange(Li_c) - 0.5) / rf + spec.i0 + 0.5
    jc = (jnp.arange(Mj_c) - 0.5) / rf + spec.j0 + 0.5
    return jc, ic


def bilinear(F, jf, if_):
    """Bilinear sample of a 2-D (or leading-dims batched) field at
    fractional indices jf (rows) and if_ (cols), clamped to the
    domain."""
    Mj, Li = F.shape[-2], F.shape[-1]
    jf = jnp.clip(jf, 0.0, Mj - 1.0)
    if_ = jnp.clip(if_, 0.0, Li - 1.0)
    j0 = jnp.clip(jnp.floor(jf).astype(jnp.int32), 0, Mj - 2)
    i0 = jnp.clip(jnp.floor(if_).astype(jnp.int32), 0, Li - 2)
    tj = jf - j0
    ti = if_ - i0
    f00 = F[..., j0[:, None], i0[None, :]]
    f01 = F[..., j0[:, None], i0[None, :] + 1]
    f10 = F[..., j0[:, None] + 1, i0[None, :]]
    f11 = F[..., j0[:, None] + 1, i0[None, :] + 1]
    tj = tj[:, None]
    ti = ti[None, :]
    return ((1 - tj) * (1 - ti) * f00 + (1 - tj) * ti * f01
            + tj * (1 - ti) * f10 + tj * ti * f11)


def refine2d(F, spec: RefineSpec, Mj_c, Li_c):
    """Interpolate a parent rho-point field to the full child grid."""
    jc, ic = _child_coords(spec, Mj_c, Li_c)
    return bilinear(F, jc, ic)


def make_child_obc_fn(cfg_c: ModelConfig, spec: RefineSpec,
                      snapshots, parent_dt: float):
    """Boundary forcing for the child from a parent trajectory.

    snapshots: list of parent States saved every parent step (index 0
    = child start time).  Returns obc(time) with clamped zeta, Flather
    ubar/vbar data and radiation-nudged tracer data on all four edges.
    """
    Mj_c, Li_c = cfg_c.shape2d
    jc, ic = _child_coords(spec, Mj_c, Li_c)

    # precompute child-boundary samples for every snapshot (host-side,
    # once) - stacked along a leading time axis
    def sample(state):
        z = bilinear(state.zeta, jc, ic)
        ub = bilinear(state.ubar, jc, ic)      # rho-centred approx
        vb = bilinear(state.vbar, jc, ic)
        t = bilinear(state.t, jc, ic)          # (NT, N, Mj_c, Li_c)
        u = bilinear(state.u, jc, ic)
        v = bilinear(state.v, jc, ic)
        return z, ub, vb, t, u, v

    series = [sample(s) for s in snapshots]
    stacked = [jnp.stack([s[q] for s in series]) for q in range(6)]
    zs, ubs, vbs, ts, us, vs = stacked
    nsnap = zs.shape[0]

    def obc(time):
        x = jnp.clip(time / parent_dt, 0.0, nsnap - 1.001)
        k0 = jnp.floor(x).astype(jnp.int32)
        w = x - k0

        def ti(arr):
            return (1.0 - w) * arr[k0] + w * arr[k0 + 1]

        z, ub, vb, t, u, v = (ti(a) for a in stacked)
        edges = {"west": (..., slice(None), 0),
                 "south": (..., 0, slice(None)),
                 "east": (..., slice(None), -1),
                 "north": (..., -1, slice(None))}

        def per_edge(f):
            return {side: f[idx] for side, idx in edges.items()}

        tdata = {itrc: per_edge(t[itrc]) for itrc in range(cfg_c.NT)}
        return {"zeta": per_edge(z),
                "ubar": per_edge(ub), "vbar": per_edge(vb),
                "u": per_edge(u), "v": per_edge(v),
                "t": tdata}

    return obc
