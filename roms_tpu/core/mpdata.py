"""MPDATA recursive monotone tracer advection.

Re-implements the reference's TS_MPDATA path (step3d_t.F:873-1481 +
mpdata_adiff.F) as whole-array jnp expressions:

 1. a first-order donor-cell pass over the full dt produces a diffusive
    intermediate concentration Ta (step3d_t.F:873-886, 1246-1257);
 2. nondimensional anti-diffusive Courant velocities are built from the
    normalized Ta gradients with the third-order "HOT" power-series
    terms retained (mpdata_adiff.F:255-928, Margolin & Smolarkiewicz
    1998), gated to positive-definite fields and limited by the
    physical Courant number;
 3. the non-oscillatory beta-ratio limiter of Smolarkiewicz & Grabowski
    (1990) rescales them and converts back to dimensional velocities
    (mpdata_adiff.F:955-1125);
 4. a corrective donor-cell pass with the anti-diffusive velocities
    yields the monotone update (step3d_t.F:1398-1480).

All three face directions share one generic HOT-series kernel
(`_hot_series`): the reference writes the Ua/Va/Wa blocks out three
times with the axes permuted; here the face-normal gradient/Courant is
just the first argument.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..config import ModelConfig
from ..grid.grid import Grid
from ..ops import stencil as st
from . import boundary

_EPS = 1.0e-18       # mpdata_adiff.F:143
_EPS2 = 1.0e-10      # mpdata_adiff.F:144
_LARGE = 1.0e+20     # mod_scalars.F:823
_FAC = 1.0           # physical-velocity limit (TS_MPDATA_LIMIT off)


def _hot_series(g1, g2, g3, c1, c2, c3):
    """Anti-diffusive nondimensional velocity normal to a face.

    g* are the normalized tracer-gradient ratios (face-normal first),
    c* the matching Courant numbers.  Implements the X/Y/Z + sig_*
    recursion of mpdata_adiff.F:393-455 in direction-agnostic form.
    """
    e = _EPS
    X = (jnp.abs(c1) - c1 * c1) * g1 - g2 * c1 * c2 - g3 * c1 * c3
    Y = (jnp.abs(c2) - c2 * c2) * g2 - g1 * c1 * c2 - g3 * c2 * c3
    Z = (jnp.abs(c3) - c3 * c3) * g3 - g1 * c1 * c3 - g2 * c2 * c3

    a1, a2, a3 = jnp.abs(g1), jnp.abs(g2), jnp.abs(g3)
    gg = g1 * g1
    sig_alfa = 1.0 / (1.0 - a1 + e)
    sig_beta = -g1 / ((1.0 - a1) * (1.0 - gg) + e)
    sig_gama = 2.0 * jnp.abs(gg * g1) / \
        ((1.0 - a1) * (1.0 - gg) * (1.0 - jnp.abs(gg * g1)) + e)
    sig_a = -g2 / ((1.0 - a1) * (1.0 - jnp.abs(g1 * g2)) + e)
    sig_b = g1 * g2 / ((1.0 - a1) * (1.0 - gg * a2) + e) * \
        (a2 / (1.0 - jnp.abs(g1 * g2) + e) + 2.0 * g1 / (1.0 - gg + e))
    sig_c = a1 * g2 * g2 / \
        ((1.0 - a1) * (1.0 - g2 * g2 * a1) *
         (1.0 - jnp.abs(g1 * g2)) + e)
    sig_d = -g3 / ((1.0 - a1) * (1.0 - jnp.abs(g1 * g3)) + e)
    sig_e = g1 * g3 / ((1.0 - a1) * (1.0 - gg * a3) + e) * \
        (a3 / (1.0 - jnp.abs(g1 * g3) + e) + 2.0 * g1 / (1.0 - gg + e))
    sig_f = a1 * g3 * g3 / \
        ((1.0 - a1) * (1.0 - g3 * g3 * a1) *
         (1.0 - jnp.abs(g1 * g3)) + e)

    return (sig_alfa * X + sig_beta * X * X + sig_gama * X * X * X +
            sig_a * X * Y + sig_b * X * X * Y + sig_c * X * Y * Y +
            sig_d * X * Z + sig_e * X * X * Z + sig_f * X * Z * Z)


def _cell_wm(W, odz, pmn):
    """Per-cell vertical Courant factor: (G[k] + G[k+1]) with
    G = W*odz*pmn on interior interfaces, zero at top/bottom
    (mpdata_adiff.F:263-276 edge cases collapse onto this form)."""
    G = W[1:-1] * odz * pmn[None]
    z = jnp.zeros_like(G[:1])
    Gf = jnp.concatenate([z, G, z], axis=0)          # (N+1, Mj, Li)
    return Gf[:-1] + Gf[1:]                          # (N, Mj, Li)


def _cell_dsum(D):
    """Per-cell pair sum of interface values with edge doubling:
    cell 0 -> 2*D[0], interior -> D[k-1]+D[k], cell N-1 -> 2*D[N-2]
    (matches the 0.25 vs 0.0625 edge coefficients of
    mpdata_adiff.F:258-335)."""
    return jnp.concatenate(
        [2.0 * D[:1], D[:-1] + D[1:], 2.0 * D[-1:]], axis=0)


def mpdata_step(cfg: ModelConfig, grid: Grid, thalf, t_part,
                Huon, Hvom, W, Hz, z_r):
    """One full MPDATA advection update for one tracer.

    thalf: half-step concentration from pre_step3d (the reference
    passes t(:,:,:,3) to both the donor pass and the beta limiter,
    step3d_t.F:459-468, 1397); t_part: Hz_old*t(n) + dt*forcing
    increments; Huon/Hvom/W: corrected mass fluxes; Hz/z_r: NEW layer
    geometry.  Returns the Hz-weighted tracer (Tunits m) ready for the
    implicit vertical-diffusion solve.
    """
    dt = cfg.dt
    pmn = grid.pm * grid.pn
    pm, pn = grid.pm, grid.pn
    oHz = 1.0 / Hz
    odz = 1.0 / (z_r[1:] - z_r[:-1])                 # (N-1, Mj, Li)
    umask = getattr(grid, "umask", None)
    vmask = getattr(grid, "vmask", None)
    rmask = getattr(grid, "rmask", None)
    if rmask is None:
        rmask = jnp.ones_like(pm)
    if umask is None:
        umask = jnp.ones_like(pm)
    if vmask is None:
        vmask = jnp.ones_like(pm)

    # ---- 1. diffusive donor-cell pass (step3d_t.F:451-462, 873-886,
    #         1048-1060, 1246-1257) --------------------------------------
    FX = Huon * jnp.where(Huon > 0.0, st.im1(thalf), thalf)
    FE = Hvom * jnp.where(Hvom > 0.0, st.jm1(thalf), thalf)
    Wi = W[1:-1]
    FCi = Wi * jnp.where(Wi > 0.0, thalf[:-1], thalf[1:])
    zpad = jnp.zeros_like(FCi[:1])
    FC = jnp.concatenate([zpad, FCi, zpad], axis=0)
    Ta = (t_part - dt * pmn * (st.dx_p(FX) + st.dy_p(FE) +
                               FC[1:] - FC[:-1])) * oHz
    # boundary extension (mpdata_adiff.F:178-240: gradient clamp /
    # periodic wrap)
    Ta = boundary.bc_rho(Ta, cfg.bc.t)

    # shared gradient building blocks
    dTax = st.dx_m(Ta) * (pm + st.im1(pm))[None] * umask[None]  # u-pts
    dTay = st.dy_m(Ta) * (pn + st.jm1(pn))[None] * vmask[None]  # v-pts
    HuC = Huon * ((pm + st.im1(pm)) * (pn + st.im1(pn)))[None] * \
        (oHz + st.im1(oHz))
    HvC = Hvom * ((pm + st.jm1(pm)) * (pn + st.jm1(pn)))[None] * \
        (oHz + st.jm1(oHz))
    Wm_cell = _cell_wm(W, odz, pmn)

    D = (Ta[1:] - Ta[:-1]) * odz                     # interface dTa/dz
    Dc = _cell_dsum(D)
    Zc = _cell_dsum(z_r[1:] - z_r[:-1])              # cell-center span

    # ---- 2a. U-face anti-diffusive Courant (mpdata_adiff.F:252-470) ----
    Tsum_u = Ta + st.im1(Ta) + _EPS
    A_u = st.dx_m(Ta) / Tsum_u
    onv4 = (grid.on_v + st.jp1(grid.on_v) +
            st.im1(grid.on_v + st.jp1(grid.on_v)))[None]
    B_u = 0.03125 * (dTay + st.jp1(dTay) +
                     st.im1(dTay + st.jp1(dTay))) * onv4 / Tsum_u
    C_u = 0.0625 * (Dc + st.im1(Dc)) * (Zc + st.im1(Zc)) / Tsum_u
    Um_u = 0.125 * dt * HuC
    Vm_u = 0.03125 * dt * (HvC + st.jp1(HvC) + st.im1(HvC + st.jp1(HvC)))
    Wm_u = 0.25 * dt * (Wm_cell + st.im1(Wm_cell))
    Ua = _hot_series(A_u, B_u, C_u, Um_u, Vm_u, Wm_u)
    gate_u = (st.im1(Ta) <= 0.0) | (Ta <= 0.0) | \
        (jnp.abs(st.dx_m(Ta)) <= _EPS2)
    Ua = jnp.where(gate_u, 0.0,
                   jnp.sign(Ua) * jnp.minimum(jnp.abs(Ua),
                                              _FAC * jnp.abs(Um_u)))
    Ua = Ua * umask[None]

    # ---- 2b. V-face (mpdata_adiff.F:475-700, xi/eta mirrored) ----------
    Tsum_v = Ta + st.jm1(Ta) + _EPS
    B_v = st.dy_m(Ta) / Tsum_v
    omu4 = (grid.om_u + st.ip1(grid.om_u) +
            st.jm1(grid.om_u + st.ip1(grid.om_u)))[None]
    A_v = 0.03125 * (dTax + st.ip1(dTax) +
                     st.jm1(dTax + st.ip1(dTax))) * omu4 / Tsum_v
    C_v = 0.0625 * (Dc + st.jm1(Dc)) * (Zc + st.jm1(Zc)) / Tsum_v
    Vm_v = 0.125 * dt * HvC
    Um_v = 0.03125 * dt * (HuC + st.ip1(HuC) + st.jm1(HuC + st.ip1(HuC)))
    Wm_v = 0.25 * dt * (Wm_cell + st.jm1(Wm_cell))
    Va = _hot_series(B_v, A_v, C_v, Vm_v, Um_v, Wm_v)
    gate_v = (st.jm1(Ta) <= 0.0) | (Ta <= 0.0) | \
        (jnp.abs(st.dy_m(Ta)) <= _EPS2)
    Va = jnp.where(gate_v, 0.0,
                   jnp.sign(Va) * jnp.minimum(jnp.abs(Va),
                                              _FAC * jnp.abs(Vm_v)))
    Va = Va * vmask[None]

    # ---- 2c. W-face, interior interfaces (mpdata_adiff.F:764-928) ------
    Tlo, Thi = Ta[:-1], Ta[1:]                       # cells below/above
    Tsum_w = Thi + Tlo + _EPS
    C_w = (Thi - Tlo) / Tsum_w
    Gx = dTax + st.ip1(dTax)                         # per-cell x-grad
    Gy = dTay + st.jp1(dTay)
    omu2 = (grid.om_u + st.ip1(grid.om_u))[None]
    onv2 = (grid.on_v + st.jp1(grid.on_v))[None]
    A_w = 0.0625 * (Gx[:-1] + Gx[1:]) * omu2 / Tsum_w
    B_w = 0.0625 * (Gy[:-1] + Gy[1:]) * onv2 / Tsum_w
    HuS = HuC + st.ip1(HuC)
    HvS = HvC + st.jp1(HvC)
    Um_w = 0.03125 * dt * (HuS[:-1] + HuS[1:])
    Vm_w = 0.03125 * dt * (HvS[:-1] + HvS[1:])
    Wm_w = dt * W[1:-1] * odz * pmn[None]
    Wa_i = _hot_series(C_w, B_w, A_w, Wm_w, Vm_w, Um_w)
    gate_w = (Tlo <= 0.0) | (Thi <= 0.0) | \
        (jnp.abs(Thi - Tlo) <= _EPS2)
    Wa_i = jnp.where(gate_w, 0.0,
                     jnp.sign(Wa_i) * jnp.minimum(jnp.abs(Wa_i),
                                                  _FAC * jnp.abs(Wm_w)))
    Wa_i = Wa_i * rmask[None]
    Wa = jnp.concatenate([zpad, Wa_i, zpad], axis=0)  # (N+1, Mj, Li)

    # ---- 3. beta-ratio FCT limiter (mpdata_adiff.F:955-1098) -----------
    mup = rmask[None]
    mdn = jnp.where(rmask > 0.0, 1.0, _LARGE)[None]

    def kpad(x):        # clamp-extend cells in k for k+/-1 neighbors
        return jnp.concatenate([x[:1], x, x[-1:]], axis=0)

    def neigh_extreme(reduce_fn, m):
        vals = []
        for f in (Ta, thalf):
            fm = f * m
            vals += [fm, st.im1(fm), st.ip1(fm), st.jm1(fm),
                     st.jp1(fm), kpad(fm)[:-2], kpad(fm)[2:]]
        return reduce_fn(jnp.stack(vals), axis=0)

    Tmax = neigh_extreme(jnp.max, mup)
    Tmin = neigh_extreme(jnp.min, mdn)

    Tk = kpad(Ta)
    influx = (st.im1(Ta) * jnp.maximum(Ua, 0.0) -
              st.ip1(Ta) * jnp.minimum(st.ip1(Ua), 0.0) +
              st.jm1(Ta) * jnp.maximum(Va, 0.0) -
              st.jp1(Ta) * jnp.minimum(st.jp1(Va), 0.0) +
              Tk[:-2] * jnp.maximum(Wa[:-1], 0.0) -
              Tk[2:] * jnp.minimum(Wa[1:], 0.0))
    outflux = Ta * (jnp.maximum(st.ip1(Ua), 0.0) -
                    jnp.minimum(Ua, 0.0) +
                    jnp.maximum(st.jp1(Va), 0.0) -
                    jnp.minimum(Va, 0.0) +
                    jnp.maximum(Wa[1:], 0.0) -
                    jnp.minimum(Wa[:-1], 0.0))
    beta_up = (Tmax - Ta) / (influx + _EPS)
    beta_dn = (Ta - Tmin) / (outflux + _EPS)
    land = (rmask <= 0.0)[None]
    beta_up = jnp.where(land, 2.0, beta_up)
    beta_dn = jnp.where(land, 2.0, beta_dn)

    # monotone velocities, scaled back to dimensional units
    # (mpdata_adiff.F:1103-1155)
    odt = 1.0 / dt
    Ua = (jnp.minimum(jnp.minimum(st.im1(beta_dn), beta_up), 1.0) *
          jnp.maximum(Ua, 0.0) +
          jnp.minimum(jnp.minimum(st.im1(beta_up), beta_dn), 1.0) *
          jnp.minimum(Ua, 0.0)) * (odt * grid.om_u)[None] * umask[None]
    Va = (jnp.minimum(jnp.minimum(st.jm1(beta_dn), beta_up), 1.0) *
          jnp.maximum(Va, 0.0) +
          jnp.minimum(jnp.minimum(st.jm1(beta_up), beta_dn), 1.0) *
          jnp.minimum(Va, 0.0)) * (odt * grid.on_v)[None] * vmask[None]
    Wa_i = (jnp.minimum(jnp.minimum(beta_dn[:-1], beta_up[1:]), 1.0) *
            jnp.maximum(Wa[1:-1], 0.0) +
            jnp.minimum(jnp.minimum(beta_up[:-1], beta_dn[1:]), 1.0) *
            jnp.minimum(Wa[1:-1], 0.0)) * \
        (odt / pmn)[None] * (z_r[1:] - z_r[:-1]) * rmask[None]
    Wa = jnp.concatenate([zpad, Wa_i, zpad], axis=0)

    # boundary faces (mpdata_adiff.F:1157-1224): closed walls already
    # have Um=0 hence Ua=0 from the limit; refresh open/periodic edges.
    Ua = boundary.bc_u(Ua, cfg.bc.u)
    Va = boundary.bc_v(Va, cfg.bc.v)

    # ---- 4. corrective donor-cell pass (step3d_t.F:1398-1480) ----------
    FXa = (jnp.maximum(Ua, 0.0) * st.im1(Ta) +
           jnp.minimum(Ua, 0.0) * Ta) * \
        0.5 * (Hz + st.im1(Hz)) * grid.on_u[None]
    FEa = (jnp.maximum(Va, 0.0) * st.jm1(Ta) +
           jnp.minimum(Va, 0.0) * Ta) * \
        0.5 * (Hz + st.jm1(Hz)) * grid.om_v[None]
    FCa_i = jnp.maximum(Wa[1:-1], 0.0) * Ta[:-1] + \
        jnp.minimum(Wa[1:-1], 0.0) * Ta[1:]
    FCa = jnp.concatenate([zpad, FCa_i, zpad], axis=0)
    tn = Ta * Hz - dt * pmn * (st.dx_p(FXa) + st.dy_p(FEa) +
                               FCa[1:] - FCa[:-1])
    return tn
