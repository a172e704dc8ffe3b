"""Single-category dynamic-thermodynamic sea ice.

Re-implements the reference sea-ice subsystem (ROMS/Nonlinear/SeaIce/)
in whole-array jnp form:

  - EVP rheology: viscous-plastic stress with elastic pseudo-time
    substepping (Hunke & Dukowicz 1997; ice_evp.F:200-260 bulk/shear
    viscosities from the Hibler strength P = Pstar*hi*exp(-C(1-ai)),
    ice_evp_sig.F:120-175 stress update, ice_elastic.F:230-500
    semi-implicit momentum with ocean drag, Coriolis, surface tilt).
  - Thermodynamics: Mellor-Kantha column physics — the zero-layer
    Semtner reduction by default, or the full MK snow+brine scheme via
    IceConfig(mk_full=True) (ice_mk.h); conductive growth at the ice
    base, open-water growth/melt from the surface heat imbalance,
    Hibler (1979) concentration evolution.
  - Frazil ice from supercooled water (ice_frazil.F:155-230), a
    bottom-up scan with latent-heat feedback on temperature.
  - Advection: Smolarkiewicz MPDATA (the reference default,
    ice_smolar.h:760-957: donor-cell pass, antidiffusive velocities
    with the cross-term Courant correction, one corrective pass) +
    ice_limit.F clamps; IceConfig(advect="upwind") keeps the
    first-order donor cell (ICE_UPWIND).

State lives in `IceState`; `make_ice_fn` returns the per-step hook the
ocean Model calls before its own step, yielding modified surface
stresses and tracer fluxes under ice.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import ModelConfig
from ..grid.grid import Grid
from ..ops import stencil as st
from . import boundary


@dataclass(frozen=True)
class IceConfig:
    """ice.in defaults (mod_ice.F initialization)."""
    rhoi: float = 900.0          # ice density (kg/m3)
    rho_air: float = 1.267
    Cd_ai: float = 1.3e-3        # air-ice drag
    Cd_io: float = 7.5e-3        # ice-ocean drag
    Pstar: float = 2.75e4        # ice strength (N/m2)
    Astrength: float = 20.0      # strength concentration exponent
    ellip_sq: float = 4.0        # yield-ellipse eccentricity squared
    E0: float = 0.25             # elastic modulus factor (ice_evp_sig.F:119)
    nevp: int = 20               # elastic substeps per ice step
    zetamin: float = 0.0
    zetamax: float = 1.0e14
    h0: float = 0.5              # lead closing thickness (Hibler 79)
    ki: float = 2.04             # ice conductivity (W/m/K)
    ci: float = 2093.0           # ice heat capacity (J/kg/K)
    c_atm: float = 20.0          # linearized atm exchange (W/m2/K)
    prognostic_temp: bool = True  # MK interior heat capacity
    Lhat: float = 79.2           # latent heat of fusion (cal/g ~ scaled)
    Li: float = 3.34e5           # latent heat (J/kg)
    ai_max: float = 0.999
    hi_min: float = 0.01
    # MK full thermodynamics constants (ice_mk.h:275-290)
    rhos: float = 330.0          # snow density (kg/m3)
    AlphIc: float = 2.034        # ice conductivity (W/m/K)
    AlphSn: float = 0.31         # snow conductivity (W/m/K)
    sice_ref: float = 3.2        # reference ice salinity (psu)
    cp_w: float = 3990.0         # seawater heat capacity
    min_ai: float = 0.01
    mk_full: bool = False        # use the full MK snow+brine scheme
    advect: str = "mpdata"       # "mpdata" (reference default) | "upwind"


class IceState(NamedTuple):
    ai: jnp.ndarray              # concentration [0,1]
    hi: jnp.ndarray              # mean thickness over cell (m)
    ui: jnp.ndarray              # ice u-velocity (u points)
    vi: jnp.ndarray
    sxx: jnp.ndarray             # internal stresses (rho points)
    syy: jnp.ndarray
    sxy: jnp.ndarray
    ti: jnp.ndarray              # interior ice temperature (degC)
    hsn: jnp.ndarray             # mean snow thickness over cell (m)


def initial_ice(cfg: ModelConfig, ai0=0.0, hi0=0.0,
                ti0=-5.0, hsn0=0.0) -> IceState:
    shp = cfg.shape2d
    z = jnp.zeros(shp, cfg.dtype)
    return IceState(ai=z + ai0, hi=z + hi0, ui=z, vi=z,
                    sxx=z, syy=z, sxy=z, ti=z + ti0, hsn=z + hsn0)


def freezing_point(S, z=0.0):
    """Sea-water freezing point (ice_frazil.F:271-283 default)."""
    return -0.0543 * S


def ice_frazil(cfg: ModelConfig, icfg: IceConfig, t, Hz, z_r, rho):
    """Frazil ice production from supercooled water
    (ice_frazil.F:155-230).  Bottom-up scan: supercooled levels freeze
    (warming toward t_fr), warm levels above melt accumulated frazil.
    Returns (t_new_temp, w_frazil rate m/s)."""
    Lhat, r = icfg.Lhat, 0.5
    temp, salt = t[0], t[1]
    t_fr = freezing_point(salt)
    orhoi = 1.0 / icfg.rhoi

    def level(carry, xs):
        Fi = carry
        T, S, Hzk, rhok, tf = xs
        gamma = (tf - T) / (Lhat + T * (1.0 - r) + 0.0543 * S)
        # freezing branch (T < tf): add frazil, warm the level
        freeze = T < tf
        dF_f = gamma * Hzk * (1000.0 + rhok) * orhoi
        # melting branch: consume frazil from below, cool the level,
        # limited by available frazil
        melt = (~freeze) & (Fi > 0.0) & (T > tf)
        dF_m_raw = gamma * Hzk * (1000.0 + rhok) * orhoi
        exhausts = (Fi + dF_m_raw) <= 0.0
        gamma_m = jnp.where(exhausts,
                            -Fi * icfg.rhoi / (Hzk * (1000.0 + rhok)),
                            gamma)
        dF_m = jnp.where(exhausts, -Fi, dF_m_raw)
        g_eff = jnp.where(freeze, gamma, jnp.where(melt, gamma_m, 0.0))
        dF = jnp.where(freeze, dF_f, jnp.where(melt, dF_m, 0.0))
        T_new = T + g_eff * (Lhat + T * (1.0 - r))
        return Fi + dF, T_new

    Fi0 = jnp.zeros_like(temp[0])
    Fi, T_new = jax.lax.scan(
        level, Fi0,
        (temp, salt, Hz, rho, jnp.broadcast_to(t_fr[None] if t_fr.ndim == 2
                                               else t_fr, temp.shape)))
    w_fr = jnp.maximum(Fi, 0.0) / cfg.dt
    return T_new, w_fr


def _strain_rates(grid: Grid, ui, vi):
    """eps_xx/yy/xy at rho points (ice_evp_sig.F:120-136)."""
    exx = st.dx_p(ui) * grid.pm
    eyy = st.dy_p(vi) * grid.pn
    epx = 0.25 * (st.ip1(st.jp1(vi)) + st.ip1(vi)
                  - st.im1(st.jp1(vi)) - st.im1(vi)) * grid.pm
    epy = 0.25 * (st.ip1(st.jp1(ui)) + st.jp1(ui)
                  - st.ip1(st.jm1(ui)) - st.jm1(ui)) * grid.pn
    return exx, eyy, 0.5 * (epx + epy)


def evp_substep(cfg: ModelConfig, icfg: IceConfig, grid: Grid,
                ai, hi, ui, vi, sxx, syy, sxy, dte,
                tau_ax, tau_ay, uw, vw, sse, fcor,
                lbc_sca=None, lbc_vel=None):
    """One elastic substep: stresses then semi-implicit momentum
    (ice_evp.F + ice_evp_sig.F + ice_elastic.F).

    ``lbc_sca``/``lbc_vel`` apply the ice lateral BCs at the
    reference's points in the cycle: stresses are BC'd BETWEEN the
    sigma update and the momentum solve (ice_evp_sig.F ends with
    bc + mp_exchange before ice_elastic.F runs), velocities after the
    momentum solve.  Without them the momentum consumes undefined
    ghost-ring stress values, which also breaks single-chip /
    explicit-halo-engine equivalence (wrap vs halo garbage)."""
    e2r = 1.0 / icfg.ellip_sq
    exx, eyy, exy = _strain_rates(grid, ui, vi)
    eone = exx + eyy
    etwos = (exx - eyy) ** 2 + 4.0 * exy * exy
    delta = jnp.maximum(jnp.sqrt(jnp.abs(eone ** 2 + e2r * etwos)),
                        1.0e-16)
    P = icfg.Pstar * hi * jnp.exp(-icfg.Astrength * (1.0 - ai))
    zeta = jnp.clip(P / (2.0 * delta), icfg.zetamin, icfg.zetamax)
    eta = e2r * zeta

    # elastic stress relaxation (ice_evp_sig.F:147-175), active where
    # there is ice; viscous-plastic limit elsewhere
    E = 2.0 * icfg.E0 * icfg.rhoi * hi / (grid.pm * dte) ** 2
    ep = E * P / (4.0 * zeta + 1.0e-8)
    ee = E / (2.0 * eta + 1.0e-8)
    ees = E * (eta - zeta) / (4.0 * eta * zeta + 1.0e-8)
    cffi = 1.0 / dte
    alfa = cffi + ee + ees
    beta = ees
    gamma = cffi + ee
    f1 = E * exx + cffi * sxx - ep
    f2 = E * eyy + cffi * syy - ep
    f3 = E * exy + cffi * sxy
    f4 = 1.0 / (alfa ** 2 - beta ** 2)
    sxx_e = f4 * (alfa * f1 - beta * f2)
    syy_e = f4 * (alfa * f2 - beta * f1)
    sxy_e = f3 / gamma
    # thin ice: pure VP stress (ice_evp_sig.F:165-175)
    thick = hi > 0.01
    sxx_v = 2.0 * eta * exx + (zeta - eta) * eone - 0.5 * P
    syy_v = 2.0 * eta * eyy + (zeta - eta) * eone - 0.5 * P
    sxy_v = 2.0 * eta * exy
    sxx = jnp.where(thick, sxx_e, sxx_v) * grid.rmask
    syy = jnp.where(thick, syy_e, syy_v) * grid.rmask
    sxy = jnp.where(thick, sxy_e, sxy_v) * grid.rmask
    if lbc_sca is not None:
        sxx = boundary.bc_rho(sxx, lbc_sca)
        syy = boundary.bc_rho(syy, lbc_sca)
        sxy = boundary.bc_rho(sxy, lbc_sca)

    # ---- momentum (ice_elastic.F:230-520) ------------------------------
    def at_u(q):
        return 0.5 * (q + st.im1(q))

    def at_v(q):
        return 0.5 * (q + st.jm1(q))

    g = cfg.g
    rho0 = cfg.rho0
    # u-component
    masu = jnp.maximum(at_u(hi), 0.1) * icfg.rhoi
    auf = jnp.maximum(at_u(ai), 0.01)
    s1 = st.dx_m(sxx) * at_u(grid.pm)
    sxy_c = 0.25 * (sxy + st.jp1(sxy) + st.im1(sxy) + st.im1(st.jp1(sxy)))
    sxy_d = 0.25 * (sxy + st.im1(sxy) + st.jm1(sxy) + st.im1(st.jm1(sxy)))
    s2 = (sxy_c - sxy_d) * at_u(grid.pn)
    # ice-ocean transfer coefficient (ice_spdiw.F): Cd_io*|u_i - u_w|
    spd_u = jnp.sqrt((ui - uw) ** 2 +
                     (at_u(0.25 * (vi + st.jp1(vi) + st.im1(vi)
                                   + st.im1(st.jp1(vi))))
                      - at_u(0.25 * (vw + st.jp1(vw) + st.im1(vw)
                                     + st.im1(st.jp1(vw))))) ** 2)
    chux = icfg.Cd_io * spd_u
    fv = at_u(0.25 * (vi + st.jp1(vi)) * 2.0)       # v averaged to u
    uforce = (s1 + s2 + tau_ax
              - g * masu * st.dx_m(sse) * at_u(grid.pm)
              + masu * at_u(fcor) * fv)
    alfa_u = masu + dte * auf * rho0 * chux
    ui_new = (masu * ui + dte * (uforce + auf * rho0 * chux * uw)) / \
        alfa_u
    ui_new = ui_new * grid.umask

    # v-component (mirror)
    masv = jnp.maximum(at_v(hi), 0.1) * icfg.rhoi
    avf = jnp.maximum(at_v(ai), 0.01)
    s1v = st.dy_m(syy) * at_v(grid.pn)
    sxy_r = 0.25 * (sxy + st.ip1(sxy) + st.jm1(sxy) + st.jm1(st.ip1(sxy)))
    sxy_l = 0.25 * (sxy + st.jm1(sxy) + st.im1(sxy) + st.im1(st.jm1(sxy)))
    s2v = (sxy_r - sxy_l) * at_v(grid.pm)
    spd_v = jnp.sqrt((vi - vw) ** 2 +
                     (at_v(0.25 * (ui + st.ip1(ui) + st.jm1(ui)
                                   + st.jm1(st.ip1(ui))))
                      - at_v(0.25 * (uw + st.ip1(uw) + st.jm1(uw)
                                     + st.jm1(st.ip1(uw))))) ** 2)
    chvy = icfg.Cd_io * spd_v
    fu = at_v(0.25 * (ui + st.ip1(ui)) * 2.0)
    vforce = (s1v + s2v + tau_ay
              - g * masv * st.dy_m(sse) * at_v(grid.pn)
              - masv * at_v(fcor) * fu)
    alfa_v = masv + dte * avf * rho0 * chvy
    vi_new = (masv * vi + dte * (vforce + avf * rho0 * chvy * vw)) / \
        alfa_v
    vi_new = vi_new * grid.vmask
    if lbc_vel is not None:
        ui_new = boundary.bc_u(ui_new, lbc_vel, 1.0)
        vi_new = boundary.bc_v(vi_new, lbc_vel, 1.0)
    return ui_new, vi_new, sxx, syy, sxy


def _donor_cell(grid, dt, q, ui, vi):
    """First-order upwind pass (ice_smolar.h:717-761 / ICE_UPWIND)."""
    FX = (jnp.maximum(ui, 0.0) * st.im1(q) +
          jnp.minimum(ui, 0.0) * q) * grid.on_u
    FE = (jnp.maximum(vi, 0.0) * st.jm1(q) +
          jnp.minimum(vi, 0.0) * q) * grid.om_v
    return q - dt * grid.pm * grid.pn * (st.dx_p(FX) + st.dy_p(FE))


def mpdata_2d(cfg: ModelConfig, grid: Grid, dt, q, ui, vi):
    """Smolarkiewicz MPDATA transport of a positive cell field
    (ice_smolar.h:841-947): after the donor pass, antidiffusive
    velocities are built from the normalized field gradients —
    uspeed = rateu*(|ui| - Cu*ui) - rateyiu*Cu_crss*ui, with the
    cross-flow Courant term Cu_crss from the 4-point vi average — and
    one corrective donor pass subtracts the implicit diffusion.  The
    rate denominators gate the scheme to positive-definite fields; the
    gradient boundary extension matches ice_smolar.h:775-815."""
    eps = 1.0e-18
    pm, pn = grid.pm, grid.pn
    umask, vmask, rmask = grid.umask, grid.vmask, grid.rmask

    aif = _donor_cell(grid, dt, q, ui, vi) * rmask
    aif = boundary.bc_rho(aif, cfg.bc.t)

    # -- antidiffusive u (ice_smolar.h:849-893) ------------------------
    FEv = 0.5 * vmask * st.dy_m(aif)             # v-point half-gradient
    FXu = 0.5 * umask * st.dx_m(aif)             # u-point half-gradient
    rateu = st.dx_m(aif) / jnp.maximum(eps, aif + st.im1(aif))
    num_u = st.jp1(FEv) + FEv
    rateyiu = (num_u + st.im1(num_u)) / jnp.maximum(
        eps, aif + st.jp1(FEv) - FEv
        + st.im1(aif + st.jp1(FEv) - FEv))
    Cu = 0.5 * dt * (pm + st.im1(pm)) * ui
    Cu_crss_u = 0.5 * dt * 0.0625 * \
        (st.jp1(pn) + st.im1(st.jp1(pn)) + st.jm1(pn)
         + st.im1(st.jm1(pn))) * \
        (st.jp1(vi) + st.im1(st.jp1(vi)) + vi + st.im1(vi))
    uspeed = rateu * (jnp.abs(ui) - Cu * ui) - rateyiu * Cu_crss_u * ui
    aflxu = grid.on_u * (jnp.maximum(uspeed, 0.0) * st.im1(aif)
                         + jnp.minimum(uspeed, 0.0) * aif)

    # -- antidiffusive v (ice_smolar.h:895-922) ------------------------
    ratev = st.dy_m(aif) / jnp.maximum(eps, aif + st.jm1(aif))
    num_v = st.ip1(FXu) + FXu
    ratexiv = (num_v + st.jm1(num_v)) / jnp.maximum(
        eps, aif + st.ip1(FXu) - FXu
        + st.jm1(aif + st.ip1(FXu) - FXu))
    Cv = 0.5 * dt * (pn + st.jm1(pn)) * vi
    Cu_crss_v = 0.5 * dt * 0.0625 * \
        (st.ip1(pm) + st.jm1(st.ip1(pm)) + st.im1(pm)
         + st.jm1(st.im1(pm))) * \
        (ui + st.ip1(ui) + st.jm1(ui) + st.jm1(st.ip1(ui)))
    vspeed = ratev * (jnp.abs(vi) - Cv * vi) - ratexiv * Cu_crss_v * vi
    aflxv = grid.om_v * (jnp.maximum(vspeed, 0.0) * st.jm1(aif)
                         + jnp.minimum(vspeed, 0.0) * aif)

    # -- corrective pass (ice_smolar.h:925-947) ------------------------
    aif = aif - dt * pm * pn * (st.dx_p(aflxu) + st.dy_p(aflxv))
    return aif * rmask


def ice_advect(cfg: ModelConfig, icfg: IceConfig, grid: Grid,
               ai, hi, ui, vi, hsn=None):
    """MPDATA (or upwind) transport of area, volume and snow
    (ice_smolar.h driver loop over ice fields) + ice_limit.F clamps."""
    dt = cfg.dt

    if icfg.advect == "mpdata":
        def adv(q):
            return mpdata_2d(cfg, grid, dt, q, ui, vi)
    else:
        def adv(q):
            return _donor_cell(grid, dt, q, ui, vi)

    ai = jnp.clip(adv(ai), 0.0, icfg.ai_max) * grid.rmask
    hi = jnp.maximum(adv(hi), 0.0) * grid.rmask
    if hsn is not None:
        hsn = jnp.maximum(adv(hsn), 0.0) * grid.rmask
        return ai, hi, hsn
    return ai, hi


def ice_thermo(cfg: ModelConfig, icfg: IceConfig, grid: Grid,
               ai, hi, sst, sss, tair, qnet_ao, ti=None,
               qio_coef=1.0e-4):
    """Reduced Mellor-Kantha / Semtner zero-layer thermodynamics
    (ice_mk.h condensed; full 3-layer enthalpy is a later round).

    tair: surface air temperature (degC) setting the ice-surface
    temperature in the strong-coupling limit, so basal conduction is
    ki*(t_fr - tair)/h -- thick ice grows slower (Semtner 1976).
    qnet_ao: net downward atmospheric heat flux over open water (W/m2,
    positive = warming).  Growth partition follows Hibler (1979):
    open-water freezing builds area with e-folding h0; melt shrinks
    area proportional to volume loss."""
    dt = cfg.dt
    rhoLi = icfg.rhoi * icfg.Li
    t_fr = freezing_point(sss)

    h_eff = jnp.maximum(hi / jnp.maximum(ai, 0.01), icfg.hi_min)
    # ocean->ice heat flux (McPhee-style exchange velocity qio_coef)
    qio = qio_coef * cfg.rho0 * 3985.0 * jnp.maximum(sst - t_fr, 0.0)

    if icfg.prognostic_temp and ti is not None:
        # Mellor-Kantha reduced: prognostic interior temperature with
        # heat capacity (ice_mk.h ti equation, single interior layer).
        # Surface temperature from the balance of conduction with a
        # linearized atmospheric exchange, capped at melting:
        #   c_cond (ti - ts) = c_atm (ts - tair)
        c_cond = 2.0 * icfg.ki / h_eff
        ts = (c_cond * ti + icfg.c_atm * tair) / (c_cond + icfg.c_atm)
        ts = jnp.minimum(ts, 0.0)
        # interior heat equation: rhoi ci (h/2) dti/dt =
        #   c_cond (ts - ti) + c_cond (t_fr - ti)
        cap = icfg.rhoi * icfg.ci * 0.5 * h_eff
        ti_new = ti + dt / cap * c_cond * ((ts - ti) + (t_fr - ti))
        ti_new = jnp.clip(ti_new, -40.0, 0.0)
        # basal flux into the ice = conduction away from the bottom
        cond = c_cond * (t_fr - ti_new)
        # surface melt when the balance pins ts at melting
        q_sfc_excess = jnp.maximum(
            icfg.c_atm * (tair - ts) - c_cond * (ts - ti_new), 0.0)
        cond = cond - q_sfc_excess
    else:
        # zero-layer limit (Semtner): conduction straight through
        cond = icfg.ki * (t_fr - tair) / h_eff
        ti_new = ti

    # growth rates (m/s of ice); conduction can melt from above when
    # the air is warm (cond < 0)
    wai = (cond - qio) / rhoLi                     # under-ice
    wao = -qnet_ao / rhoLi                         # open water
    wao = jnp.where(sst <= t_fr + 0.05, jnp.maximum(wao, 0.0),
                    jnp.minimum(wao, 0.0))

    dvol = dt * (ai * wai + (1.0 - ai) * jnp.maximum(wao, 0.0))
    melt_open = dt * (1.0 - ai) * jnp.minimum(wao, 0.0) * 0.0
    hi_new = jnp.maximum(hi + dvol + melt_open, 0.0)

    # Hibler concentration equation
    dai_grow = dt * (1.0 - ai) * jnp.maximum(wao, 0.0) / icfg.h0
    dai_melt = jnp.where(hi > 1e-8,
                         0.5 * ai * jnp.minimum(dvol, 0.0) /
                         jnp.maximum(hi, 1e-8), 0.0)
    ai_new = jnp.clip(ai + dai_grow + dai_melt, 0.0, icfg.ai_max)
    ai_new = jnp.where(hi_new <= 0.0, 0.0, ai_new) * grid.rmask
    hi_new = hi_new * grid.rmask

    # heat/salt feedback to the ocean: latent heat of growth warms
    # (freezing releases heat used implicitly), brine rejection raises
    # salinity: salt flux = (S - S_ice)*growth
    growth = (hi_new - hi) / dt                     # m/s ice
    sflx = growth * (sss - 5.0) * icfg.rhoi / cfg.rho0   # psu m/s
    return ai_new, hi_new, sflx, ti_new




def ice_thermo_mk(cfg: ModelConfig, icfg: IceConfig, grid: Grid,
                  ai, hi, hsn, ti, sst, sss, tair, qnet_ao,
                  snowfall=None, qio_coef=1.0e-4):
    """Full Mellor-Kantha thermodynamics (ice_mk.h:355-700): snow
    layer, brine-fraction-corrected conductivity, prognostic interior
    temperature with brine heat capacity, snow/ice interface
    temperature, surface melt of snow before ice, snowfall
    accumulation, and snow-ice flooding conversion.

    Returns (ai, hi, hsn, ti, sflx)."""
    dt = cfg.dt
    eps = 1.0e-8
    frln = -0.0543
    hfus = icfg.Li
    min_ai = icfg.min_ai

    iced = ai > min_ai
    ice_thick = 0.05 + hi / (ai + eps)            # ice_mk.h:366-369
    snow_thick = hsn / (ai + eps)
    sice = jnp.minimum(icfg.sice_ref, sss)
    t_fr = frln * sss                              # t0mk ocean freeze
    ti_s = jnp.minimum(ti, -eps)

    # brine-corrected conductivity (ice_mk.h:371-379)
    brnfr = jnp.clip(frln * sice / ti_s, 0.0, 0.2)
    corfac = 1.0 / (0.5 * (1.0 + jnp.exp(-(hi ** 2))))
    alph = icfg.AlphIc * jnp.maximum(1.0 - 1.2 * brnfr, 0.25) * corfac
    Coa = 2.0 * alph * snow_thick / (icfg.AlphSn * ice_thick)

    # surface temperature from the conductive/atmospheric balance
    # (ice_mk.h:385-415; the bulk-flux Qai is linearized as c_atm)
    b2d = 2.0 * alph / (ice_thick * (1.0 + Coa))
    ts = (icfg.c_atm * tair + b2d * ti) / (icfg.c_atm + b2d)
    ts = jnp.clip(jnp.where(iced, ts, sst), -45.0, 0.0)

    # interior temperature with brine heat capacity (ice_mk.h:420-458)
    cot = -frln * sice * hfus / \
        (jnp.minimum(ti_s, frln * icfg.sice_ref)) ** 2 + icfg.ci
    cff1 = icfg.rhoi * cot * ice_thick ** 2
    cff2 = ts - (2.0 + Coa) * ti
    ti_new = ti + dt * (2.0 * alph / cff1) * (t_fr + cff2 / (1.0 + Coa))
    ti_new = jnp.maximum(ti_new, -35.0)
    ti_new = jnp.minimum(ti_new, frln * icfg.sice_ref)
    ti_new = jnp.minimum(ti_new, jnp.maximum(ts, t_fr))
    ti_new = jnp.where(iced, ti_new, sst)

    # conductive fluxes (ice_mk.h:462-476)
    hicehinv = 1.0 / (0.5 * ice_thick)
    Qio_c = alph * (t_fr - ti_new) * hicehinv      # into ice base
    # ocean->ice turbulent flux
    qio = qio_coef * cfg.rho0 * icfg.cp_w * jnp.maximum(sst - t_fr, 0.0)

    # effective latent heat (ice_mk.h:534-537)
    cffb = 1.0 - brnfr
    hfus1 = hfus * cffb + ts * icfg.cp_w - \
        (cffb * icfg.ci + brnfr * icfg.cp_w) * ti_new
    hfus1 = jnp.maximum(hfus1, 0.1 * hfus)
    rhoLi = icfg.rhoi * hfus1

    # basal growth/melt (m/s of ice)
    wai = (Qio_c - qio) / rhoLi

    # surface melt: excess atmospheric heat when ts is pinned at 0
    # melts snow first, then ice (ice_mk.h:540-610)
    q_sfc = jnp.maximum(icfg.c_atm * (tair - ts)
                        - b2d * (ts - ti_new), 0.0)
    melting = iced & (ts >= -eps)
    wsm = jnp.where(melting, q_sfc / (icfg.rhos * hfus), 0.0)
    dsn_melt = jnp.minimum(dt * wsm * ai, hsn)
    q_left = jnp.maximum(q_sfc - dsn_melt * icfg.rhos * hfus
                         / (dt * jnp.maximum(ai, eps)), 0.0)
    w_sfc_ice = jnp.where(melting, q_left / rhoLi, 0.0)

    # open-water growth/melt (Hibler 79)
    wao = -qnet_ao / rhoLi
    wao = jnp.where(sst <= t_fr + 0.05, jnp.maximum(wao, 0.0),
                    jnp.minimum(wao, 0.0))

    dvol = dt * (ai * (wai - w_sfc_ice)
                 + (1.0 - ai) * jnp.maximum(wao, 0.0))
    hi_new = jnp.maximum(hi + dvol, 0.0)

    # snow budget: snowfall accumulates on ice (ws, ice_mk.h:517-525)
    hsn_new = hsn - dsn_melt
    if snowfall is not None:
        hsn_new = hsn_new + dt * jnp.maximum(snowfall, 0.0) * ai

    # snow-ice flooding (Archimedes): when the snow load pushes the
    # ice surface below the waterline, the flooded snow converts to
    # ice.  Solving rhos*(hsn-f) = (rho0-rhoi)*(hi + f*rhos/rhoi) for
    # the converted snow thickness f zeroes the excess load exactly
    # while conserving mass (ice gain = f*rhos/rhoi).
    load = icfg.rhos * hsn_new - (cfg.rho0 - icfg.rhoi) * hi_new
    flood = jnp.maximum(load * icfg.rhoi / (icfg.rhos * cfg.rho0), 0.0)
    hi_new = hi_new + flood * icfg.rhos / icfg.rhoi
    hsn_new = jnp.maximum(hsn_new - flood, 0.0)

    # Hibler concentration equation
    dai_grow = dt * (1.0 - ai) * jnp.maximum(wao, 0.0) / icfg.h0
    dai_melt = jnp.where(hi > eps,
                         0.5 * ai * jnp.minimum(dvol, 0.0)
                         / jnp.maximum(hi, eps), 0.0)
    ai_new = jnp.clip(ai + dai_grow + dai_melt, 0.0, icfg.ai_max)
    gone = hi_new <= 0.0
    ai_new = jnp.where(gone, 0.0, ai_new) * grid.rmask
    hi_new = hi_new * grid.rmask
    hsn_new = jnp.where(gone, 0.0, hsn_new) * grid.rmask

    growth = (hi_new - hi - flood * icfg.rhos / icfg.rhoi) / dt
    sflx = growth * (sss - sice) * icfg.rhoi / cfg.rho0
    return ai_new, hi_new, hsn_new, ti_new, sflx


def make_ice_fn(cfg: ModelConfig, icfg: IceConfig, grid: Grid,
                atm_fn, refresh=None, refresh_every: int = 2):
    """Per-step sea-ice hook.

    atm_fn(time) -> (uwind, vwind, tair, qnet_ao): 10-m winds (m/s,
    rho points), air temperature (degC) and net downward open-water
    heat flux (W/m2).

    Returns fn(time, ice, uw, vw, sst, sss, sse) ->
    (ice_new, tau_ox, tau_oy, sflx) where tau_o* are the kinematic
    ocean surface stresses under the ice-weighted blend and sflx the
    brine/melt salt flux.

    ``refresh`` enables the explicit-halo sharded engine
    (parallel.sharded_step): a callable taking a list of 2-D block
    fields and returning them with halos refreshed from their owner
    devices.  It is applied on entry to the full ice state, every
    ``refresh_every`` elastic substeps to the EVP carry (matching the
    reference's per-substep ice_evp.F mp_exchange calls with the
    fast-loop aggregation discipline; each substep's strain +
    stress-divergence contamination reach is 2 cells), and once after
    the subcycle before advection (MPDATA reach <= 4).
    """
    dte = cfg.dt / icfg.nevp

    # Ice lateral boundary conditions (the reference applies ice BCs +
    # mp_exchange after every elastic substep and after transport,
    # ice_elastic.F/ice_frazil driver order): periodic sides follow
    # the app; walls are closed for ice velocity and zero-gradient for
    # scalars/stresses.  Using the ctx-aware bc_* dispatchers keeps the
    # ghost-ring convention IDENTICAL between the single-chip path and
    # the explicit-halo sharded engine (parallel.blockctx wall writes).
    from ..config import LBC, PERIODIC

    def _side(kind, s):
        return PERIODIC if getattr(cfg.bc.zeta, s) == PERIODIC \
            else kind

    from ..config import CLOSED, GRADIENT
    lbc_vel = LBC(west=_side(CLOSED, "west"),
                  east=_side(CLOSED, "east"),
                  south=_side(CLOSED, "south"),
                  north=_side(CLOSED, "north"))
    lbc_sca = LBC(west=_side(GRADIENT, "west"),
                  east=_side(GRADIENT, "east"),
                  south=_side(GRADIENT, "south"),
                  north=_side(GRADIENT, "north"))

    def fn(time, ice, uw, vw, sst, sss, sse):
        if refresh is not None:
            (ai_r, hi_r, ui_r, vi_r, sxx_r, syy_r, sxy_r, ti_r,
             hsn_r) = refresh([ice.ai, ice.hi, ice.ui, ice.vi,
                               ice.sxx, ice.syy, ice.sxy, ice.ti,
                               ice.hsn])
            ice = IceState(ai=ai_r, hi=hi_r, ui=ui_r, vi=vi_r,
                           sxx=sxx_r, syy=syy_r, sxy=sxy_r, ti=ti_r,
                           hsn=hsn_r)
        atm = atm_fn(time)
        if len(atm) == 5:
            uwind, vwind, tair, qao, snowfall = atm
        else:
            uwind, vwind, tair, qao = atm
            snowfall = None
        # air-ice stress (ice_vbc.F): rho_air*Cd_ai*|W|*W at u/v pts
        wmag = jnp.sqrt(uwind ** 2 + vwind ** 2)
        tau_ax = 0.5 * ((icfg.rho_air * icfg.Cd_ai * wmag * uwind)
                        + st.im1(icfg.rho_air * icfg.Cd_ai * wmag
                                 * uwind))
        tau_ay = 0.5 * ((icfg.rho_air * icfg.Cd_ai * wmag * vwind)
                        + st.jm1(icfg.rho_air * icfg.Cd_ai * wmag
                                 * vwind))

        def sub(carry, _):
            ui, vi, sxx, syy, sxy = carry
            ui, vi, sxx, syy, sxy = evp_substep(
                cfg, icfg, grid, ice.ai, ice.hi, ui, vi, sxx, syy,
                sxy, dte, tau_ax, tau_ay, uw, vw, sse, grid.f,
                lbc_sca=lbc_sca, lbc_vel=lbc_vel)
            return (ui, vi, sxx, syy, sxy), None

        carry0 = (ice.ui, ice.vi, ice.sxx, ice.syy, ice.sxy)
        if refresh is None:
            (ui, vi, sxx, syy, sxy), _ = jax.lax.scan(
                sub, carry0, None, length=icfg.nevp)
        else:
            # grouped subcycle with the fast-loop halo discipline:
            # one stacked 5-field refresh per group of refresh_every
            # substeps, then a final refresh before advection
            k = refresh_every

            def group(c, _):
                c = tuple(refresh(list(c)))
                for _q in range(k):
                    c, _n = sub(c, None)
                return c, None

            ngroup = icfg.nevp // k
            carry, _ = jax.lax.scan(group, carry0, None,
                                    length=ngroup)
            for _q in range(icfg.nevp - ngroup * k):
                if _q == 0:
                    carry = tuple(refresh(list(carry)))
                carry, _n = sub(carry, None)
            ui, vi, sxx, syy, sxy = tuple(refresh(list(carry)))

        ai, hi, hsn_adv = ice_advect(cfg, icfg, grid, ice.ai, ice.hi,
                                     ui, vi, hsn=ice.hsn)
        if icfg.mk_full:
            ai, hi, hsn, ti, sflx = ice_thermo_mk(
                cfg, icfg, grid, ai, hi, hsn_adv, ice.ti, sst, sss,
                tair, qao, snowfall=snowfall)
        else:
            ai, hi, sflx, ti = ice_thermo(cfg, icfg, grid, ai, hi, sst,
                                          sss, tair, qao, ti=ice.ti)
            hsn = hsn_adv
        # scalar BCs after transport + thermo (ice driver order)
        ai = boundary.bc_rho(ai, lbc_sca)
        hi = boundary.bc_rho(hi, lbc_sca)
        ti = boundary.bc_rho(ti, lbc_sca)
        if hsn is not None:
            hsn = boundary.bc_rho(hsn, lbc_sca)
        new = IceState(ai=ai, hi=hi, ui=ui, vi=vi,
                       sxx=sxx, syy=syy, sxy=sxy, ti=ti, hsn=hsn)

        # ocean surface stress: open-water wind stress blended with
        # ice-ocean drag (ice_vbc.F)
        ai_u = 0.5 * (ai + st.im1(ai))
        ai_v = 0.5 * (ai + st.jm1(ai))
        tauw_x = tau_ax / cfg.rho0
        tauw_y = tau_ay / cfg.rho0
        spd_u = jnp.abs(ui - uw)
        spd_v = jnp.abs(vi - vw)
        tio_x = icfg.Cd_io * spd_u * (ui - uw)
        tio_y = icfg.Cd_io * spd_v * (vi - vw)
        tau_ox = (1.0 - ai_u) * tauw_x + ai_u * tio_x
        tau_oy = (1.0 - ai_v) * tauw_y + ai_v * tio_y
        if refresh is not None:
            # exit refresh: advection/thermo contaminate the outer
            # halo ring of the outputs; the ocean step consumes the
            # stresses/salt flux assuming the FULL nghost ring is
            # valid, so restore it in one stacked slab
            (ai, hi, hsn, ti, tau_ox, tau_oy, sflx) = refresh(
                [new.ai, new.hi, new.hsn, new.ti, tau_ox, tau_oy,
                 sflx])
            new = new._replace(ai=ai, hi=hi, hsn=hsn, ti=ti)
        return new, tau_ox, tau_oy, sflx

    return fn
