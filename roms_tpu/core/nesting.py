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

Two-way feedback: `coarsen_feedback` replaces parent cells covered by
the child interior with conservative rf x rf box averages of the child
solution (nesting.F:put_refine/fine2coarse), and `run_two_way`
interleaves parent and child steps with one-parent-step-lagged
boundary data.
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


def coarsen_feedback(parent_field, child_field, spec: RefineSpec):
    """Replace the parent cells covered by the child interior with the
    conservative rf x rf box average of the child (fine2coarse
    averaging, nesting.F:put_refine).  Works for 2-D or leading-dims
    batched rho-point fields; the child boundary ring is excluded."""
    rf = spec.rf
    ci = child_field[..., 1:-1, 1:-1]             # interior rho cells
    Mj_i, Li_i = ci.shape[-2], ci.shape[-1]
    nj, ni = Mj_i // rf, Li_i // rf
    ci = ci[..., :nj * rf, :ni * rf]
    box = ci.reshape(ci.shape[:-2] + (nj, rf, ni, rf)).mean(
        axis=(-3, -1))
    out = parent_field.at[..., spec.j0 + 1:spec.j0 + 1 + nj,
                          spec.i0 + 1:spec.i0 + 1 + ni].set(box)
    return out


def two_way_feedback(parent_state, child_state, spec: RefineSpec):
    """Feed the child solution back into the parent State (zeta, u, v,
    t).  Velocities are box-averaged like tracers (the reference
    averages fine fluxes onto coarse faces; the cell-average form is
    the same to O(dx^2))."""
    return parent_state._replace(
        zeta=coarsen_feedback(parent_state.zeta, child_state.zeta,
                              spec),
        u=coarsen_feedback(parent_state.u, child_state.u, spec),
        v=coarsen_feedback(parent_state.v, child_state.v, spec),
        t=coarsen_feedback(parent_state.t, child_state.t, spec),
        t_prev=coarsen_feedback(parent_state.t_prev,
                                child_state.t_prev, spec))


def run_two_way(parent_model, child_model, spec: RefineSpec,
                s_parent, s_child, nsteps_parent: int):
    """Interleaved two-way integration: each parent step is followed
    by rf child steps driven by boundary data linearly interpolated
    between the previous and current parent states, then the child
    solution is averaged back into the parent (nesting.F main cycle).
    Returns (parent_state, child_state)."""
    rf = spec.rf
    cfg_c = child_model.cfg
    for n in range(nsteps_parent):
        s_prev = s_parent
        s_parent = parent_model.step(s_parent)
        obc = make_child_obc_fn(cfg_c, spec, [s_prev, s_parent],
                                float(parent_model.cfg.dt))
        # child clock runs 0..dt_p within the window; boundary data is
        # evaluated host-side per substep and passed as a jit ARGUMENT
        # so the trace is reused across windows without staleness
        s_child = s_child._replace(time=s_child.time * 0.0)
        for k in range(rf):
            obc_k = obc(k * float(cfg_c.dt))
            s_child = child_model.step_with_obc(s_child, obc_k)
        s_parent = two_way_feedback(s_parent, s_child, spec)
    return s_parent, s_child


# ---------------------------------------------------------------------------
# Composite / mosaic grids (nesting.F:35-60 classes 2 and 3)
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class ContactRegion:
    """Donor-receiver contact for same-resolution composite/mosaic
    grids (mod_nesting.F T_NGC contact-region analog).

    The receiver grid's rho-point (j, i) coincides with the donor's
    rho-point (j + dj, i + di): aligned composite grids (overlapping
    sub-rectangles of one conceptual lattice) and mosaic grids
    (edge-abutting tiles) are both expressed this way, so the contact
    "interpolation weights" are exact injections (set_contact.F reduces
    to identity weights for coincident points)."""
    donor: int
    receiver: int
    edge: str            # receiver edge refreshed from the donor
    di: int              # receiver->donor rho-index offset in xi
    dj: int              # and in eta


def _edge_indices(edge: str, Mj: int, Li: int):
    """(j, i) index arrays of a receiver's boundary ring points."""
    import numpy as np
    if edge == "west":
        j = np.arange(Mj); i = np.zeros(Mj, int)
    elif edge == "east":
        j = np.arange(Mj); i = np.full(Mj, Li - 1)
    elif edge == "south":
        j = np.zeros(Li, int); i = np.arange(Li)
    else:
        j = np.full(Li, Mj - 1); i = np.arange(Li)
    return j, i


def composite_obc(states, cfgs, regions, receiver: int):
    """Assemble the OBC data pytree for one receiver grid by sampling
    donor interiors at the receiver's contact edges (the reference's
    get_composite donor extraction, nesting.F).  Edges with no contact
    region are omitted (physical boundaries keep their own BCs)."""
    cfg_r = cfgs[receiver]
    Mj, Li = cfg_r.shape2d
    out = {"zeta": {}, "ubar": {}, "vbar": {}, "u": {}, "v": {},
           "t": {itrc: {} for itrc in range(cfg_r.NT)}}
    for reg in regions:
        if reg.receiver != receiver:
            continue
        sd = states[reg.donor]
        j, i = _edge_indices(reg.edge, Mj, Li)
        jd = jnp.asarray(j + reg.dj)
        id_ = jnp.asarray(i + reg.di)

        def sample(F):
            return F[..., jd, id_]

        out["zeta"][reg.edge] = sample(sd.zeta)
        out["ubar"][reg.edge] = sample(sd.ubar)
        out["vbar"][reg.edge] = sample(sd.vbar)
        out["u"][reg.edge] = sample(sd.u)
        out["v"][reg.edge] = sample(sd.v)
        for itrc in range(cfg_r.NT):
            out["t"][itrc][reg.edge] = sample(sd.t[itrc])
    return out


def run_composite(models, states, regions, nsteps: int):
    """Advance a set of composite/mosaic grids: each step, every grid
    integrates with contact-edge boundary data sampled from its donors
    at the current time level (bulk-synchronous donor exchange, the
    nesting.F composite cycle).  Returns the list of final states."""
    cfgs = [m.cfg for m in models]
    states = list(states)
    for n in range(nsteps):
        obcs = [composite_obc(states, cfgs, regions, r)
                for r in range(len(models))]
        states = [m.step_with_obc(s, o)
                  for m, s, o in zip(models, states, obcs)]
    return states
