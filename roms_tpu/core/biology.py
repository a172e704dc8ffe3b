"""Ecosystem source/sink kernels (column physics, trivially batched).

NPZD (Powell et al. 2006): ROMS/Nonlinear/Biology/npzd_Powell.h —
nitrate / phytoplankton / zooplankton / detritus with self-shading
light, Ivlev grazing, and sinking.  The reference's per-column sequential
updates vectorize directly over the horizontal plane; the
positivity-preserving trick (divide the SOURCE field, multiply the
sink-receiving fields) carries over verbatim.  Sinking uses a
CFL-limited first-order upwind flux (the reference's PPM reconstruction
is an accuracy upgrade scheduled with the positivity-advection
milestone).

Tracers are appended after temperature/salinity: cfg.NT = NAT + 4 with
order (NO3, Phyt, Zoop, SDet) — idbio of npzd_Powell_mod.h.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp

from .. import constants
from ..config import ModelConfig
from ..grid.grid import Grid

INO3, IPHY, IZOO, IDET = 0, 1, 2, 3     # offsets after the NAT tracers


@dataclass(frozen=True)
class NPZDConfig:
    """npzd_Powell.in defaults."""
    BioIter: int = 1
    PARfrac: float = 0.43
    AttSW: float = 0.067       # 1/m
    AttPhy: float = 0.0095     # 1/(m mmol)
    PhyIS: float = 0.025       # initial slope of P-I curve
    Vm_NO3: float = 1.5        # 1/day
    PhyMRD: float = 0.1        # 1/day
    PhyMRN: float = 0.0
    K_NO3: float = 1.0         # mmol/m3
    Ivlev: float = 0.84
    ZooGR: float = 0.52        # 1/day
    ZooEED: float = 0.0
    ZooEEN: float = 0.3
    ZooMRD: float = 0.145      # 1/day
    ZooMRN: float = 0.0
    DetRR: float = 1.03        # 1/day
    wPhy: float = 0.0          # m/day sinking
    wDet: float = 8.0          # m/day
    MinVal: float = 1.0e-6


def npzd_powell(cfg: ModelConfig, bio: NPZDConfig, grid: Grid, t,
                Hz, z_w, srflx):
    """Advance the 4 biological tracers one dt (biology source/sink only).

    t: full tracer stack (NT, N, Mj, Li); returns the updated stack.
    """
    nb = cfg.NAT
    dtdays = cfg.dt * constants.sec2day / max(bio.BioIter, 1)

    NO3_0 = jnp.maximum(t[nb + INO3], bio.MinVal)
    Phy_0 = jnp.maximum(t[nb + IPHY], bio.MinVal)
    Zoo_0 = jnp.maximum(t[nb + IZOO], bio.MinVal)
    Det_0 = jnp.maximum(t[nb + IDET], bio.MinVal)
    NO3, Phy, Zoo, Det = NO3_0, Phy_0, Zoo_0, Det_0

    PARsur = bio.PARfrac * srflx * cfg.rho0 * constants.Cp

    for _ in range(max(bio.BioIter, 1)):
        # ---- light with self-shading, integrated downward -------------
        Att = (bio.AttSW + bio.AttPhy * Phy) * Hz          # (N,...)
        # cumulative attenuation above layer k (surface = last index)
        atn_above = jnp.cumsum(Att[::-1], axis=0)[::-1] - Att
        ExpAtt = jnp.exp(-Att)
        Itop = PARsur[None] * jnp.exp(-atn_above)
        Light = jnp.where(PARsur[None] > 0.0,
                          Itop * (1.0 - ExpAtt) / Att, 0.0)

        # ---- nutrient uptake (implicit in NO3) -------------------------
        cff1 = dtdays * bio.Vm_NO3 * bio.PhyIS
        cff4 = 1.0 / jnp.sqrt(bio.Vm_NO3 ** 2
                              + bio.PhyIS ** 2 * Light * Light + 1e-30)
        cff = Phy * cff1 * cff4 * Light / (bio.K_NO3 + NO3)
        NO3 = NO3 / (1.0 + cff)
        Phy = Phy + NO3 * cff

        # ---- Ivlev grazing (implicit in Phy) ---------------------------
        cffg = Zoo * dtdays * bio.ZooGR * \
            (1.0 - jnp.exp(-bio.Ivlev * Phy)) / Phy
        Phy = Phy / (1.0 + cffg)
        Zoo = Zoo + Phy * (1.0 - bio.ZooEEN - bio.ZooEED) * cffg
        NO3 = NO3 + Phy * bio.ZooEEN * cffg
        Det = Det + Phy * bio.ZooEED * cffg

        # ---- mortality / remineralization (implicit) -------------------
        c2, c3 = dtdays * bio.PhyMRN, dtdays * bio.PhyMRD
        Phy = Phy / (1.0 + c2 + c3)
        NO3 = NO3 + Phy * c2
        Det = Det + Phy * c3
        c2, c3 = dtdays * bio.ZooMRN, dtdays * bio.ZooMRD
        Zoo = Zoo / (1.0 + c2 + c3)
        NO3 = NO3 + Zoo * c2
        Det = Det + Zoo * c3
        c2 = dtdays * bio.DetRR
        Det = Det / (1.0 + c2)
        NO3 = NO3 + Det * c2

        # ---- sinking (upwind, CFL-limited) -----------------------------
        def sink(q, w_mday):
            if w_mday == 0.0:
                return q
            w = w_mday / 86400.0 * cfg.dt / max(bio.BioIter, 1)
            # downward flux through interior interfaces: from layer above
            flux = jnp.minimum(w, 0.9 * Hz[1:]) * q[1:]    # (N-1,...)
            dq = jnp.concatenate([flux, jnp.zeros_like(q[:1])], axis=0) \
                - jnp.concatenate([jnp.zeros_like(q[:1]), flux], axis=0)
            return q + dq / Hz

        Phy = sink(Phy, bio.wPhy)
        Det = sink(Det, bio.wDet)

    # increment relative to the clamped baseline (biology.F applies
    # t(nnew) += (Bio - Bio_old)*Hz so the clamping itself is not a
    # nutrient source)
    inc = jnp.zeros_like(t)
    inc = inc.at[nb + INO3].set(NO3 - NO3_0)
    inc = inc.at[nb + IPHY].set(Phy - Phy_0)
    inc = inc.at[nb + IZOO].set(Zoo - Zoo_0)
    inc = inc.at[nb + IDET].set(Det - Det_0)
    return inc


def make_npzd_hook(cfg: ModelConfig, bio: NPZDConfig, grid: Grid):
    """Biology hook for Model(bio_fn=...): returns the tracer INCREMENT
    added (Hz-weighted) to the corrector seed before step3d_t, matching
    the reference's call placement (main3d.F:1027)."""
    def hook(t, Hz, z_w, forcing):
        return npzd_powell(cfg, bio, grid, t, Hz, z_w, forcing.srflx)
    return hook
