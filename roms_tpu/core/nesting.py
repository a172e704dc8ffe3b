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


def _child_coords_u(spec: RefineSpec, Mj_c, Li_c):
    """Parent fractional U-POINT indices of every child u point
    (set_contact.F u-contact weights): child u col i sits at parent
    rho coordinate (i-1)/rf + i0 + 0.5, i.e. parent u index
    (i-1)/rf + i0 + 1; rows are rho rows."""
    rf = spec.rf
    iu = (jnp.arange(Li_c) - 1.0) / rf + spec.i0 + 1.0
    jc = (jnp.arange(Mj_c) - 0.5) / rf + spec.j0 + 0.5
    return jc, iu


def _child_coords_v(spec: RefineSpec, Mj_c, Li_c):
    rf = spec.rf
    ic = (jnp.arange(Li_c) - 0.5) / rf + spec.i0 + 0.5
    jv = (jnp.arange(Mj_c) - 1.0) / rf + spec.j0 + 1.0
    return jv, ic


def refine2d_u(F, spec: RefineSpec, Mj_c, Li_c):
    """Interpolate a parent U-point field to the child's U points
    (replaces the round-3 rho-centred approximation; the reference's
    contact weights live on the native stagger, set_contact.F)."""
    jc, iu = _child_coords_u(spec, Mj_c, Li_c)
    return bilinear(F, jc, iu)


def refine2d_v(F, spec: RefineSpec, Mj_c, Li_c):
    jv, ic = _child_coords_v(spec, Mj_c, Li_c)
    return bilinear(F, jv, ic)


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
    jcu, icu = _child_coords_u(spec, Mj_c, Li_c)
    jcv, icv = _child_coords_v(spec, Mj_c, Li_c)

    def sample(state):
        z = bilinear(state.zeta, jc, ic)
        # velocities interpolate on their NATIVE staggers (u at parent
        # U points, v at parent V points — set_contact.F weights)
        ub = bilinear(state.ubar, jcu, icu)
        vb = bilinear(state.vbar, jcv, icv)
        t = bilinear(state.t, jc, ic)          # (NT, N, Mj_c, Li_c)
        u = bilinear(state.u, jcu, icu)
        v = bilinear(state.v, jcv, icv)
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


def coarsen_feedback_u(parent_u, child_u, child_Hz_u, spec: RefineSpec):
    """Flux-conserving fine2coarse for a U-point field
    (nesting.F fine2coarse2d/3d, vtype=u): each interior coarse u-face
    is covered by the rf child u-faces lying ON it (child cols
    1 + k*rf, rf child rows per coarse row); the coarse velocity is
    their transport-weighted average

        u_c = sum(u_f * Hz_f * on_u_f) / sum(Hz_f * on_u_f)

    (on_u_f = on_u_c / rf uniform for coincident refined grids, so it
    cancels).  child_Hz_u: child layer thickness at u points, same
    leading dims as child_u (pass ones for ubar with equal-depth
    weighting, or D_u for transport weighting)."""
    rf = spec.rf
    # interior coarse u-faces strictly inside the child (perimeter
    # faces stay with the coarse solution/boundary data)
    Li_c = child_u.shape[-1]
    Mj_c = child_u.shape[-2]
    nu = (Li_c - 2) // rf               # child interior span in cells
    nj = (Mj_c - 2) // rf
    ks = jnp.arange(1, nu)              # interior faces only
    cols = 1 + ks * rf                  # child u cols on coarse faces
    rows = 1 + jnp.arange(nj * rf)      # child interior rho rows
    uf = child_u[..., rows[:, None], cols[None, :]]
    wf = child_Hz_u[..., rows[:, None], cols[None, :]]
    shp = uf.shape[:-2] + (nj, rf, len(ks))
    num = (uf * wf).reshape(shp).sum(axis=-2)
    den = wf.reshape(shp).sum(axis=-2)
    ubox = num / jnp.maximum(den, 1e-30)
    return parent_u.at[..., spec.j0 + 1:spec.j0 + 1 + nj,
                       spec.i0 + 2:spec.i0 + 1 + nu].set(ubox)


def coarsen_feedback_v(parent_v, child_v, child_Hz_v, spec: RefineSpec):
    """V-point mirror of coarsen_feedback_u."""
    rf = spec.rf
    Li_c = child_v.shape[-1]
    Mj_c = child_v.shape[-2]
    nu = (Li_c - 2) // rf
    nj = (Mj_c - 2) // rf
    ks = jnp.arange(1, nj)
    rows = 1 + ks * rf
    cols = 1 + jnp.arange(nu * rf)
    vf = child_v[..., rows[:, None], cols[None, :]]
    wf = child_Hz_v[..., rows[:, None], cols[None, :]]
    shp = vf.shape[:-2] + (len(ks), nu, rf)
    num = (vf * wf).reshape(shp).sum(axis=-1)
    den = wf.reshape(shp).sum(axis=-1)
    vbox = num / jnp.maximum(den, 1e-30)
    return parent_v.at[..., spec.j0 + 2:spec.j0 + 1 + nj,
                       spec.i0 + 1:spec.i0 + 1 + nu].set(vbox)


def two_way_feedback(parent_state, child_state, spec: RefineSpec):
    """Feed the child solution back into the parent State (zeta, u, v,
    t).  Cell quantities (zeta, tracers) box-average; velocities use
    the flux-conserving face average on their native staggers
    (fine2coarse of face transports, nesting.F:fine2coarse2d/3d)."""
    from ..ops import stencil as st
    Hz_u_c = st.avg_x(child_state.Hz)
    Hz_v_c = st.avg_y(child_state.Hz)
    D_u_c = jnp.sum(Hz_u_c, axis=0)
    D_v_c = jnp.sum(Hz_v_c, axis=0)
    return parent_state._replace(
        zeta=coarsen_feedback(parent_state.zeta, child_state.zeta,
                              spec),
        ubar=coarsen_feedback_u(parent_state.ubar, child_state.ubar,
                                D_u_c, spec),
        vbar=coarsen_feedback_v(parent_state.vbar, child_state.vbar,
                                D_v_c, spec),
        u=coarsen_feedback_u(parent_state.u, child_state.u, Hz_u_c,
                             spec),
        v=coarsen_feedback_v(parent_state.v, child_state.v, Hz_v_c,
                             spec),
        t=coarsen_feedback(parent_state.t, child_state.t, spec),
        t_prev=coarsen_feedback(parent_state.t_prev,
                                child_state.t_prev, spec))


def accumulate_child_tfx(acc, tfx_child):
    """Accumulate child corrector face fluxes over the rf child steps
    of one parent window (nesting.F:3110-3178 time accumulation)."""
    if acc is None:
        return {"FX": tfx_child["FX"], "FE": tfx_child["FE"]}
    return {"FX": acc["FX"] + tfx_child["FX"],
            "FE": acc["FE"] + tfx_child["FE"]}


def correct_tracer(parent_state, spec: RefineSpec, grid_p,
                   tfx_parent, tfx_child_acc, rf: int,
                   dt_parent: float):
    """Reflux the coarse tracer cells ADJACENT to the refinement
    perimeter (nesting.F:3047-3459 correct_tracer): those cells were
    advanced with the COARSE advective flux across the contact face,
    while the covered region (overwritten by the fine2coarse feedback)
    evolved with the child's finer, time-accumulated fluxes through
    the same faces.  Conservation of combined tracer content requires
    the exterior cells to see the child flux too:

        Hz*T  +=  -/+ dt_p * pm*pn * (F_fine_avg - F_coarse)

    with F_fine_avg the rf-substep time mean of the rf child faces
    covering each coarse face.  tfx_*: {'FX','FE'} stacked
    (NT, N, Mj, Li) corrector fluxes from Model.step_tfx;
    tfx_child_acc accumulated with accumulate_child_tfx."""
    FXc, FEc = tfx_parent["FX"], tfx_parent["FE"]
    FXf, FEf = tfx_child_acc["FX"], tfx_child_acc["FE"]
    Mj_c, Li_c = FXf.shape[-2:]
    nj = (Mj_c - 2) // rf
    ni = (Li_c - 2) // rf
    j0, i0 = spec.j0, spec.i0
    pmn = grid_p.pm * grid_p.pn
    t = parent_state.t
    Hz = parent_state.Hz
    dt_p = dt_parent

    rows_f = 1 + jnp.arange(nj * rf)          # child interior rows
    cols_f = 1 + jnp.arange(ni * rf)

    def tan_sum_rows(F, col):
        """Sum rf child rows per coarse row at a fixed child col."""
        line = F[..., rows_f, col]            # (NT, N, nj*rf)
        return line.reshape(line.shape[:-1] + (nj, rf)).sum(-1) / rf

    def tan_sum_cols(F, row):
        line = F[..., row, cols_f]
        return line.reshape(line.shape[:-1] + (ni, rf)).sum(-1) / rf

    jj = j0 + 1 + jnp.arange(nj)              # coarse rows of patch
    ii = i0 + 1 + jnp.arange(ni)

    # ---- west-adjacent column (its EAST face is the perimeter) -----
    Ffine = tan_sum_rows(FXf, 1)              # (NT, N, nj)
    Fcoarse = FXc[..., jj, i0 + 1]
    dHzT = -dt_p * pmn[jj, i0] * (Ffine - Fcoarse)
    t = t.at[..., jj, i0].add(dHzT / Hz[:, jj, i0])
    # ---- east-adjacent column --------------------------------------
    Ffine = tan_sum_rows(FXf, 1 + ni * rf)
    Fcoarse = FXc[..., jj, i0 + ni + 1]
    dHzT = dt_p * pmn[jj, i0 + ni + 1] * (Ffine - Fcoarse)
    t = t.at[..., jj, i0 + ni + 1].add(dHzT / Hz[:, jj, i0 + ni + 1])
    # ---- south-adjacent row ----------------------------------------
    Ffine = tan_sum_cols(FEf, 1)
    Fcoarse = FEc[..., j0 + 1, ii]
    dHzT = -dt_p * pmn[j0, ii] * (Ffine - Fcoarse)
    t = t.at[..., j0, ii].add(dHzT / Hz[:, j0, ii])
    # ---- north-adjacent row ----------------------------------------
    Ffine = tan_sum_cols(FEf, 1 + nj * rf)
    Fcoarse = FEc[..., j0 + nj + 1, ii]
    dHzT = dt_p * pmn[j0 + nj + 1, ii] * (Ffine - Fcoarse)
    t = t.at[..., j0 + nj + 1, ii].add(dHzT / Hz[:, j0 + nj + 1, ii])

    return parent_state._replace(t=t)


def nesting_tracer_content(parent_state, child_state,
                           spec: RefineSpec, grid_p, grid_c,
                           itrc: int = 0):
    """Combined tracer content of the two-way system: parent cells
    outside the refinement patch (coarse content) + the child interior
    (fine content).  The quantity correct_tracer conserves
    (nesting.F:49-52 NESTING_DEBUG tracer sums)."""
    rf = spec.rf
    Mj_c, Li_c = child_state.zeta.shape[-2:]
    nj = (Mj_c - 2) // rf
    ni = (Li_c - 2) // rf
    area_p = 1.0 / (grid_p.pm * grid_p.pn)
    content_p = jnp.sum(parent_state.t[itrc] * parent_state.Hz
                        * area_p[None], axis=0)
    mask = jnp.ones_like(area_p)
    mask = mask.at[spec.j0 + 1:spec.j0 + 1 + nj,
                   spec.i0 + 1:spec.i0 + 1 + ni].set(0.0)
    # interior cells only (the ring is boundary-condition data)
    outer = jnp.sum((content_p * mask)[1:-1, 1:-1])
    area_c = 1.0 / (grid_c.pm * grid_c.pn)
    inner = jnp.sum((child_state.t[itrc] * child_state.Hz
                     * area_c[None]).sum(0)[1:-1, 1:-1])
    return outer + inner


def nesting_mass_check(parent_state, child_state, spec: RefineSpec,
                       grid_p, grid_c):
    """NESTING_DEBUG-style conservation diagnostic (nesting.F:49-52):
    the child-region DYNAMIC volume (area-weighted free surface) must
    equal that of the covering coarse cells after feedback — roundoff
    for a conservative box average.  The static bathymetry part is
    excluded: child h is an interpolation of parent h, a fixed
    geometric difference that no feedback changes.  Returns the
    mismatch normalized by the child's mean |zeta| volume."""
    rf = spec.rf
    Mj_c, Li_c = child_state.zeta.shape[-2:]
    nj = (Mj_c - 2) // rf
    ni = (Li_c - 2) // rf
    area_c = 1.0 / (grid_c.pm * grid_c.pn)
    vol_child = jnp.sum(child_state.zeta[1:-1, 1:-1]
                        * area_c[1:-1, 1:-1])
    scale = jnp.sum(jnp.abs(child_state.zeta[1:-1, 1:-1])
                    * area_c[1:-1, 1:-1])
    area_p = 1.0 / (grid_p.pm * grid_p.pn)
    sl = (slice(spec.j0 + 1, spec.j0 + 1 + nj),
          slice(spec.i0 + 1, spec.i0 + 1 + ni))
    vol_parent = jnp.sum(parent_state.zeta[sl] * area_p[sl])
    return jnp.abs(vol_child - vol_parent) / jnp.maximum(scale,
                                                         1e-30)


def run_two_way(parent_model, child_model, spec: RefineSpec,
                s_parent, s_child, nsteps_parent: int,
                reflux: bool = False):
    """Interleaved two-way integration: each parent step is followed
    by rf child steps driven by boundary data linearly interpolated
    between the previous and current parent states, then the child
    solution is averaged back into the parent (nesting.F main cycle);
    with reflux=True the coarse cells adjacent to the contact ring are
    flux-corrected with the accumulated child face fluxes
    (correct_tracer, nesting.F:3047-3459).
    Returns (parent_state, child_state)."""
    rf = spec.rf
    cfg_c = child_model.cfg
    for n in range(nsteps_parent):
        s_prev = s_parent
        if reflux:
            s_parent, tfx_p = parent_model.step_tfx(s_parent)
        else:
            s_parent = parent_model.step(s_parent)
        obc = make_child_obc_fn(cfg_c, spec, [s_prev, s_parent],
                                float(parent_model.cfg.dt))
        # child clock runs 0..dt_p within the window; boundary data is
        # evaluated host-side per substep and passed as a jit ARGUMENT
        # so the trace is reused across windows without staleness
        s_child = s_child._replace(time=s_child.time * 0.0)
        tfx_acc = None
        for k in range(rf):
            obc_k = obc(k * float(cfg_c.dt))
            if reflux:
                s_child, tfx_c = child_model.step_tfx(s_child, obc_k)
                tfx_acc = accumulate_child_tfx(tfx_acc, tfx_c)
            else:
                s_child = child_model.step_with_obc(s_child, obc_k)
        s_parent = two_way_feedback(s_parent, s_child, spec)
        if reflux:
            s_parent = correct_tracer(
                s_parent, spec, parent_model.grid, tfx_p, tfx_acc,
                rf, float(parent_model.cfg.dt))
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
