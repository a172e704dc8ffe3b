"""Mellor-Yamada level-2.5 turbulence closure — the true kernels.

Re-implements ROMS/Nonlinear/my25_prestep.F and my25_corstep.F (not the
GLS k-kl approximation, which remains available as
gls.my25_mixing_config).  Prognostic fields are q2 = tke (twice the
turbulent kinetic energy) and q2l = gls (tke times the master length
scale), both at w-interfaces, advected exactly like the GLS pair (the
prestep is shared), with:

  - shear/buoyancy production Qprod = shear2*(Akv-bak) - N2*(Akt-bak)
    entering tke as 2*Qprod and q2l as E1*L*Qprod
    (my25_corstep.F:600-624);
  - implicit dissipation Qdiss = dt*sqrt(q2_old)/(B1*L) with the
    Blumberg wall-proximity factor Wscale = 1 + E2/kappa^2 *
    (L*(1/d_sfc + 1/d_bot))^2 on the q2l equation
    (my25_corstep.F:626-636);
  - Dirichlet boundary values q2 = B1^(2/3)*|tau|, q2l = 0
    (my25_corstep.F:645-655);
  - Galperin limited length scale L = min(q2l/q2,
    lmax*sqrt(q2/(N2+eps))), stability functions Sh = Sh1/(1-Sh2*Gh),
    Sm Kantha-Clayson or Galperin, ql = 0.5*(L*sqrt(q2_new) +
    L_old*sqrt(q2_old)), Akv = bak + ql*Sm, Akt = bak + ql*Sh,
    Akq = bak + ql*Sq (my25_corstep.F:700-770).

Constants from mod_scalars.F:1846-1875, derived products from
mod_scalars.F:4753-4766.
"""

from __future__ import annotations

import jax.numpy as jnp

from .. import constants
from ..config import ModelConfig
from ..grid.grid import Grid
from ..ops.tridiag import tridiag_solve
from ..ops import stencil as st
from .gls import (MixState, _bc_w, corstep_advect, n2s2_horavg,
                  shear2_spline)

# mod_scalars.F:1846-1859
A1, A2, B1, B2 = 0.92, 0.74, 16.6, 10.1
C1, C2, C3 = 0.08, 0.7, 0.2
E1, E2 = 1.8, 1.33
GH0 = 0.0233
SQ = 0.2
LMAX = 0.53
QMIN = 1.0e-8
_EPS = 1.0e-10

# derived (mod_scalars.F:4753-4766)
B1P2O3 = B1 ** (2.0 / 3.0)
B1PM1O3 = B1 ** (-1.0 / 3.0)
SH1 = A2 * (1.0 - 6.0 * A1 / B1)
SM2 = 9.0 * A1 * A2
SM3 = A1 * (1.0 - 3.0 * C1 - 6.0 * A1 / B1)
SM4_KC = 18.0 * A1 * A1 + 9.0 * A1 * A2 * (1.0 - C2)
# Kantha & Clayson Sh denominator constant (mod_scalars.F:4762 branch)
SH2_KC = 3.0 * A2 * (6.0 * A1 + B2 * (1.0 - C3))
SH2_GALP = 3.0 * A2 * (6.0 * A1 + B2)


def initial_mix_my25(cfg: ModelConfig) -> MixState:
    """MixState seeded with the MY2.5 minimum levels (my_qmin)."""
    from .gls import initial_mix
    mix = initial_mix(cfg)
    q = jnp.full_like(mix.tke, QMIN)
    return mix._replace(tke=q, tke_prev=q, gls=q, gls_prev=q)


def my25_corstep(cfg: ModelConfig, grid: Grid, mix: MixState,
                 tke_half, gls_half, tke_seed, gls_seed,
                 u, v, Hz, z_r, z_w, Huon, Hvom, W, bvf,
                 sustr, svstr, bustr, bvstr) -> MixState:
    """my25_corstep.F as a whole-array kernel; interface fields live at
    w-points with prognostic interior interfaces k=1..N-1."""
    m = cfg.mixing
    dt = cfg.dt
    vonKar = constants.vonKar
    NAT = cfg.NAT
    kc = getattr(m, "gls_stab", "kantha_clayson") != "galperin"

    # ---- shear^2 / N^2 at interior interfaces with smoothing ------------
    shear2 = n2s2_horavg(cfg, shear2_spline(u, v, Hz))
    buoy2 = n2s2_horavg(cfg, bvf[1:-1])

    # ---- corrector advection of the Hz-weighted pair ---------------------
    tke_n, gls_n = corstep_advect(cfg, grid, tke_half, gls_half,
                                  tke_seed, gls_seed, Huon, Hvom, W)

    # ---- production (my25_corstep.F:600-624) -----------------------------
    q2_old = jnp.maximum(mix.tke[1:-1], QMIN)
    q2l_old = jnp.maximum(mix.gls[1:-1], QMIN)
    Akv_i = mix.Akv[1:-1]
    Akt_i = mix.Akt[0][1:-1]
    strat2 = jnp.where((buoy2 > -5.0e-5) & (buoy2 < 0.0), 0.0, buoy2)
    Qprod = shear2 * (Akv_i - m.akv_bak) - strat2 * (Akt_i - m.akt_bak[0])
    Ls_unlmt = jnp.maximum(_EPS, q2l_old / q2_old)
    Hz_w = 0.5 * (Hz[:-1] + Hz[1:])
    tke_n = tke_n + dt * Hz_w * Qprod * 2.0
    gls_n = gls_n + dt * Hz_w * Qprod * E1 * Ls_unlmt

    # ---- implicit dissipation + wall function (:626-636) -----------------
    Qdiss = dt * jnp.sqrt(q2_old) / (B1 * Ls_unlmt)
    d_bot = jnp.maximum(z_w[1:-1] - z_w[:1], _EPS)
    d_top = jnp.maximum(z_w[-1:] - z_w[1:-1], _EPS)
    cffw = Ls_unlmt * (1.0 / d_top + 1.0 / d_bot)
    Wscale = 1.0 + (E2 / vonKar ** 2) * cffw * cffw
    # vertical mixing coefficient through layer k (1..N):
    # FCK(k) = -0.5*dt*(Akk(k)+Akk(k-1))/Hz(k) couples interfaces
    # k-1 and k; unlike GLS (flux BCs, FCK(1)=FCK(N)=0), MY2.5 keeps
    # the Dirichlet couplings to the boundary interfaces
    # (my25_corstep.F:586-664).
    FCK_full = -0.5 * dt * (mix.Akk[1:] + mix.Akk[:-1]) / Hz  # (N,...)
    zK = jnp.zeros_like(FCK_full[:1])
    lowK = jnp.concatenate([zK, FCK_full[1:-1]], axis=0)
    upK = jnp.concatenate([FCK_full[1:-1], zK], axis=0)
    couple = FCK_full[:-1] + FCK_full[1:]
    diagK = Hz_w * (1.0 + 2.0 * Qdiss) - couple
    diagP = Hz_w * (1.0 + Wscale * Qdiss) - couple

    # ---- Dirichlet boundary values (:645-655) ----------------------------
    taus = 0.5 * jnp.sqrt((sustr + st.ip1(sustr)) ** 2
                          + (svstr + st.jp1(svstr)) ** 2)
    taub = 0.5 * jnp.sqrt((bustr + st.ip1(bustr)) ** 2
                          + (bvstr + st.jp1(bvstr)) ** 2)
    q2_sfc = B1P2O3 * taus
    q2_bot = B1P2O3 * taub
    # fold the Dirichlet rows into the first/last interior equations
    tke_rhs = tke_n.at[-1].add(-FCK_full[-1] * q2_sfc) \
        .at[0].add(-FCK_full[0] * q2_bot)
    gls_rhs = gls_n                        # q2l = 0 at both boundaries

    q2_new = tridiag_solve(lowK, diagK, upK, tke_rhs)
    q2l_new = tridiag_solve(lowK, diagP, upK, gls_rhs)
    q2_new = jnp.maximum(q2_new, QMIN)
    q2l_new = jnp.maximum(q2l_new, QMIN)

    # ---- length scale + stability functions (:700-770) -------------------
    Ls = q2l_new / q2_new
    Ls_lmt = jnp.minimum(
        Ls, LMAX * jnp.sqrt(q2_new / (jnp.maximum(0.0, buoy2) + _EPS)))
    Gh = jnp.minimum(GH0, -buoy2 * Ls_lmt * Ls_lmt / q2_new)
    Sh = SH1 / (1.0 - (SH2_KC if kc else SH2_GALP) * Gh)
    if kc:
        Sm = (B1PM1O3 + Sh * Gh * SM4_KC) / (1.0 - SM2 * Gh)
    else:
        Sm = (SM3 + Sh * Gh * SM4_KC) / (1.0 - SM2 * Gh)
    ql = 0.5 * (Ls_lmt * jnp.sqrt(q2_new)
                + mix.Lscale[1:-1] * jnp.sqrt(q2_old))
    Akv_new_i = m.akv_bak + ql * Sm
    Akt_new_i = ql * Sh
    Akk_new_i = m.akk_bak + ql * SQ

    def assemble(interior, bot, sfc):
        return jnp.concatenate([bot[None], interior, sfc[None]], axis=0)

    zero2 = jnp.zeros_like(q2_sfc)
    tke_new = assemble(q2_new, jnp.maximum(q2_bot, QMIN),
                       jnp.maximum(q2_sfc, QMIN))
    gls_new = assemble(q2l_new, zero2 + QMIN, zero2 + QMIN)
    Akv_new = assemble(Akv_new_i, jnp.full_like(zero2, m.akv_bak),
                       jnp.full_like(zero2, m.akv_bak))
    Akk_new = assemble(Akk_new_i, jnp.full_like(zero2, m.akk_bak),
                       jnp.full_like(zero2, m.akk_bak))
    Akt_new = jnp.stack([
        assemble(m.akt_bak[it] + Akt_new_i,
                 jnp.full_like(zero2, m.akt_bak[it]),
                 jnp.full_like(zero2, m.akt_bak[it]))
        for it in range(NAT)])
    Lscale_new = assemble(Ls_lmt, zero2 + 1.0e-6, zero2 + 1.0e-6)

    tke_new = _bc_w(cfg, tke_new)
    gls_new = _bc_w(cfg, gls_new)
    Akv_new = _bc_w(cfg, Akv_new)
    Akt_new = _bc_w(cfg, Akt_new)
    Akk_new = _bc_w(cfg, Akk_new)

    return MixState(tke=tke_new, tke_prev=mix.tke,
                    gls=gls_new, gls_prev=mix.gls,
                    Akv=Akv_new, Akt=Akt_new, Akk=Akk_new,
                    Akp=mix.Akp, Lscale=Lscale_new)
