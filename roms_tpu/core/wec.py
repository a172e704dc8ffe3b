"""Wave effects on currents (WEC) — vortex-force formalism.

Round-1 scope of the reference WEC subsystem (the wec_stokes/wec_vf
modules themselves are not shipped in this reference snapshot; their
coupling sites in rhs3d.F:534-660 and omega.F/step3d_*.F define the
interface, and the formulation follows Uchiyama, McWilliams &
Shchepetkin 2010):

  - monochromatic Stokes drift profile from linear wave theory,
        u_st(z) = (sigma k a^2) cosh(2k(z+h)) / (2 sinh^2(kD))
    in the wave direction (a = Hwave/(2 sqrt(2)), rms amplitude);
  - Stokes-Coriolis force (rhs3d.F:534-562): ru += Hz*fomn*v_st,
    rv -= Hz*fomn*u_st with the reference's 4-point averaging;
  - horizontal vortex force u_st x (curl u): the leading wave-current
    interaction term.

Round-2 additions: the surface-roller model + breaking acceleration
(below), and the Lagrangian mass coupling — `stokes_transport` feeds
the barotropic continuity (DUon/DVom in both 2D engines) and the 3D
mass fluxes Huon/Hvom so tracers advect with the total (Eulerian +
Stokes) velocity, mass-consistently.  Enable with
make_wec_fn(..., stokes_coupling=True).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..config import ModelConfig
from ..grid.grid import Grid
from ..ops import stencil as st


def stokes_drift(cfg: ModelConfig, grid: Grid, Hwave, Dwave, Lwave,
                 z_r, z_w):
    """Stokes drift velocity profile at u/v points (m/s).

    Hwave: significant wave height (m); Dwave: direction (radians,
    math convention); Lwave: wavelength (m).  Deep/intermediate-water
    monochromatic profile, depth-uniform direction.
    """
    g = cfg.g
    k = 2.0 * jnp.pi / jnp.maximum(Lwave, 1.0)
    # wet/dry: the water column can thin to (or momentarily below)
    # zero on the swash face; clamp the dispersion depth so sigma and
    # the sinh^2 amplitude stay finite (NaN here would poison the
    # whole field through the masked transports: NaN*0 = NaN)
    D = jnp.maximum(z_w[-1] - z_w[0], cfg.Dcrit)
    sigma = jnp.sqrt(g * k * jnp.tanh(k * D))
    a = Hwave / (2.0 * jnp.sqrt(2.0))             # rms amplitude
    # cap the e-folding argument to keep cosh/sinh finite in deep water
    kD = jnp.minimum(k * D, 50.0)
    amp = sigma * k * a * a / (2.0 * jnp.sinh(kD) ** 2 + 1e-30)
    zz = jnp.minimum(2.0 * k[None] * (z_r - z_w[:1]), 100.0)
    prof = amp[None] * jnp.cosh(zz)               # (N, Mj, Li) rho pts
    us_r = prof * jnp.cos(Dwave)[None]
    vs_r = prof * jnp.sin(Dwave)[None]
    u_st = 0.5 * (us_r + st.im1(us_r)) * grid.umask[None]
    v_st = 0.5 * (vs_r + st.jm1(vs_r)) * grid.vmask[None]
    return u_st, v_st


def vf_rhs(cfg: ModelConfig, grid: Grid, u, v, u_st, v_st, Hz,
           ru, rv):
    """Add Stokes-Coriolis + horizontal vortex force to the momentum
    RHS (rhs3d.F:534-562 stencil; Uchiyama et al 2010 eq 2).

    ru/rv are Hz-weighted RHS arrays (m4/s2)."""
    # Stokes-Coriolis with the reference's averaging: UFx at rho
    # points from v_st, then averaged to u points
    UFx = 0.5 * Hz * grid.fomn[None] * (v_st + st.jp1(v_st))
    VFe = 0.5 * Hz * grid.fomn[None] * (u_st + st.ip1(u_st))
    ru = ru + 0.5 * (UFx + st.im1(UFx))
    rv = rv - 0.5 * (VFe + st.jm1(VFe))

    # horizontal vortex force u_st x (curl u): relative vorticity
    # (C-grid curl at psi points with local metrics) averaged to rho,
    # times Stokes velocity
    pm, pn = grid.pm, grid.pn
    curl_p = (v - st.im1(v)) * 0.5 * (pm + st.im1(pm))[None] - \
        (u - st.jm1(u)) * 0.5 * (pn + st.jm1(pn))[None]
    curl_r = 0.25 * (curl_p + st.ip1(curl_p) + st.jp1(curl_p)
                     + st.ip1(st.jp1(curl_p)))
    omn = 1.0 / (pm * pn)
    VFx = 0.5 * Hz * (curl_r * omn[None]) * (v_st + st.jp1(v_st))
    VFe2 = 0.5 * Hz * (curl_r * omn[None]) * (u_st + st.ip1(u_st))
    ru = ru + 0.5 * (VFx + st.im1(VFx))
    rv = rv - 0.5 * (VFe2 + st.jm1(VFe2))
    return ru, rv


def stokes_transport(cfg: ModelConfig, grid: Grid, u_st, v_st, Hz):
    """Vertically integrated Stokes mass transports and their
    per-layer fluxes (the DU_stokes/Huon_stokes arrays of the
    reference's WEC coupling, mod_ocean.F:103-127): the barotropic
    continuity advances zeta with the LAGRANGIAN transport.

    Faces touching (near-)dry cells carry no Stokes transport — the
    reference gates these through its wet/dry face masks
    (step2d WET_DRY umask_wet on DUSon); without the gate the swash
    zone is pumped dry-cell-full in a handful of steps."""
    Hz_u = 0.5 * (Hz + st.im1(Hz))
    Hz_v = 0.5 * (Hz + st.jm1(Hz))
    if cfg.wetdry:
        D = jnp.sum(Hz, axis=0)
        wet = (D > 1.1 * cfg.Dcrit).astype(Hz.dtype)
        wet_u = wet * st.im1(wet)
        wet_v = wet * st.jm1(wet)
        Hz_u = Hz_u * wet_u[None]
        Hz_v = Hz_v * wet_v[None]
    Huon_st = Hz_u * u_st * grid.on_u[None]
    Hvom_st = Hz_v * v_st * grid.om_v[None]
    return (jnp.sum(Huon_st, axis=0), jnp.sum(Hvom_st, axis=0),
            Huon_st, Hvom_st)


def make_wec_fn(cfg: ModelConfig, grid: Grid, wave_fn,
                stokes_coupling: bool = False):
    """wave_fn(time) -> (Hwave, Dwave, Lwave).  Returns the hook
    fn(time, u, v, Hz, z_r, z_w, ru, rv) -> (ru, rv) used by the
    Model's predictor stage.  stokes_coupling=True additionally
    exposes fn.stokes(time, Hz, z_r, z_w) -> (DU_st, DV_st, Huon_st,
    Hvom_st) so the Model folds the Stokes transport into the
    barotropic continuity and the 3D mass fluxes (full Lagrangian
    coupling)."""
    def _waves(time, waves):
        if waves is not None:
            # coupled-import wave fields (mct_roms_swan.h exchange)
            return waves["Hwave"], waves["Dwave"], waves["Lwave"]
        return wave_fn(time)

    def fn(time, u, v, Hz, z_r, z_w, ru, rv, waves=None):
        Hw, Dw, Lw = _waves(time, waves)
        u_st, v_st = stokes_drift(cfg, grid, Hw, Dw, Lw, z_r, z_w)
        return vf_rhs(cfg, grid, u, v, u_st, v_st, Hz, ru, rv)

    if stokes_coupling:
        def stokes(time, Hz, z_r, z_w, waves=None):
            Hw, Dw, Lw = _waves(time, waves)
            u_st, v_st = stokes_drift(cfg, grid, Hw, Dw, Lw, z_r, z_w)
            return stokes_transport(cfg, grid, u_st, v_st, Hz)
        fn.stokes = stokes
    return fn


# ---------------------------------------------------------------------------
# Surface-roller model + breaking-dissipation forcing
# (WEC_ROLLER branches of the reference's wec_roller/wec_vf modules;
# Svendsen 1984 roller with the Reniers dissipation closure, Uchiyama
# et al. 2010 eq 14-16 acceleration)
# ---------------------------------------------------------------------------

from typing import NamedTuple


class RollerState(NamedTuple):
    """Prognostic surface-roller energy density (J/m2 / rho0)."""
    E_r: jnp.ndarray          # (Mj, Li)


def initial_roller(cfg: ModelConfig) -> RollerState:
    return RollerState(E_r=jnp.zeros(cfg.shape2d, cfg.dtype))


def step_roller(cfg: ModelConfig, roller: RollerState, eps_b, c_phase,
                alpha_r: float = 0.5, sin_beta: float = 0.1
                ) -> tuple:
    """Advance the roller energy one dt (Svendsen/Reniers balance):

        dE_r/dt = alpha_r * eps_b - eps_r,
        eps_r   = g * E_r * sin_beta / c

    eps_b: breaking dissipation (m3/s3, kinematic, from the wave
    model); c_phase: wave phase speed (m/s).  Returns (new RollerState,
    eps_r) with eps_r the roller dissipation that forces the
    currents."""
    g = cfg.g
    # backward-Euler in the dissipation term: unconditionally stable
    # for dt >> c/(g sin_beta) (the roller timescale is seconds)
    r = g * sin_beta / jnp.maximum(c_phase, 0.1)
    E_new = jnp.maximum(
        (roller.E_r + cfg.dt * alpha_r * eps_b) / (1.0 + cfg.dt * r),
        0.0)
    eps_r = r * E_new
    return RollerState(E_r=E_new), eps_r


def breaking_accel(cfg: ModelConfig, grid: Grid, Hwave, Dwave, Lwave,
                   eps_eff, Hz, z_r, z_w, ru, rv):
    """Add the breaking/roller acceleration to the momentum RHS
    (Uchiyama et al. 2010 eq 14): a body force

        F = eps_eff * k_vec / sigma

    distributed over a surface penetration depth ~ Hwave with
    cosh-decay weights (the reference's FRC_DISTRIBUTE shape), applied
    Hz-weighted at u/v points."""
    g = cfg.g
    k = 2.0 * jnp.pi / jnp.maximum(Lwave, 1.0)
    D = z_w[-1] - z_w[0]
    sigma = jnp.sqrt(g * k * jnp.tanh(jnp.minimum(k * D, 50.0)))
    fmag = eps_eff / jnp.maximum(sigma, 1.0e-6)      # m2/s2 flux

    # vertical distribution: decay over kb = 2 pi / Hwave from surface
    kb = 2.0 * jnp.pi / jnp.maximum(Hwave, 0.1)
    depth = z_w[-1][None] - z_r                       # (N, Mj, Li) > 0
    w = jnp.exp(-kb[None] * depth)
    w = w / jnp.maximum(jnp.sum(w * Hz, axis=0), 1.0e-12)[None]

    fx_r = fmag * jnp.cos(Dwave)
    fy_r = fmag * jnp.sin(Dwave)
    Fx3 = Hz * w * fx_r[None]
    Fy3 = Hz * w * fy_r[None]
    omn = 1.0 / (grid.pm * grid.pn)
    # Hz-weighted RHS is in m4/s2: multiply by cell area factor
    ru = ru + 0.5 * (Fx3 + st.im1(Fx3)) * \
        (0.5 * (omn + st.im1(omn)))[None] * grid.umask[None]
    rv = rv + 0.5 * (Fy3 + st.jm1(Fy3)) * \
        (0.5 * (omn + st.jm1(omn)))[None] * grid.vmask[None]
    return ru, rv


def make_wec_roller_fn(cfg: ModelConfig, grid: Grid, wave_fn,
                       alpha_r: float = 0.5, sin_beta: float = 0.1):
    """Full WEC hook with rollers: wave_fn(time) -> (Hwave, Dwave,
    Lwave, eps_b) where eps_b is the breaking dissipation.  The roller
    energy is carried in a host-side cell (updated per step, like the
    reference's coupling-field update cadence); (1 - alpha_r) of the
    breaking dissipation forces the currents immediately, the roller
    part is released with the roller lag."""
    cell = {"roller": initial_roller(cfg)}

    def fn(time, u, v, Hz, z_r, z_w, ru, rv):
        Hw, Dw, Lw, eps_b = wave_fn(time)
        u_st, v_st = stokes_drift(cfg, grid, Hw, Dw, Lw, z_r, z_w)
        ru, rv = vf_rhs(cfg, grid, u, v, u_st, v_st, Hz, ru, rv)
        g = cfg.g
        k = 2.0 * jnp.pi / jnp.maximum(Lw, 1.0)
        D = z_w[-1] - z_w[0]
        c = jnp.sqrt(g / k * jnp.tanh(jnp.minimum(k * D, 50.0)))
        new_roller, eps_r = step_roller(cfg, cell["roller"], eps_b, c,
                                        alpha_r, sin_beta)
        cell["roller"] = new_roller
        eps_eff = (1.0 - alpha_r) * eps_b + eps_r
        return breaking_accel(cfg, grid, Hw, Dw, Lw, eps_eff, Hz,
                              z_r, z_w, ru, rv)

    fn.roller_cell = cell
    return fn
