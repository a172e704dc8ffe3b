"""Equation of state.

Linear EOS follows ROMS/Nonlinear/rho_eos.F:694-723:
    rho = R0 - R0*Tcoef*(T - T0) + R0*Scoef*(S - S0) - 1000   (density anomaly)
The vertically averaged density rhoA and perturbation rhoS used by the
barotropic pressure gradient (VAR_RHO_2D, rho_eos.F:726-748) are computed
with the same top-down accumulation.

The nonlinear Jackett & McDougall (1995) polynomial (rho_eos.F:12-37)
carries exact analytic T/S derivatives (EOS_TDERIVATIVE branches,
rho_eos.F:276-340) for the thermal-expansion alpha and saline-contraction
beta coefficients, and the Brunt-Vaisala frequency uses the adiabatic
parcel-displacement form (rho_eos.F:395-424).

Check values (rho_eos.F:21-37), T=3 C, S=35.5 PSU, Z=-5000 m:
    alpha = 2.1014611551470e-04 1/C     den  = 1050.3639165364 kg/m3
    beta  = 7.2575037309946e-04 1/PSU   den1 = 1028.2845117925 kg/m3
(asserted in tests/test_physics_validation.py).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..config import ModelConfig


def rho_eos_linear(cfg: ModelConfig, t):
    """t: (NT, N, Mj, Li); returns density anomaly rho (N, Mj, Li)."""
    e = cfg.eos
    rho = e.R0 - e.R0 * e.Tcoef * (t[0] - e.T0)
    if cfg.NT > 1 and e.Scoef != 0.0:
        rho = rho + e.R0 * e.Scoef * (t[1] - e.S0)
    return rho - 1000.0


# --- Jackett & McDougall (1995) polynomial coefficients (rho_eos.F) -------
_Q = dict(
    # Density at one atmosphere (mod_eoscoef.F Q/U/V/W).
    Q00=+9.99842594e+2, Q01=+6.793952e-2, Q02=-9.095290e-3,
    Q03=+1.001685e-4, Q04=-1.120083e-6, Q05=+6.536332e-9,
    U00=+8.24493e-1, U01=-4.08990e-3, U02=+7.64380e-5,
    U03=-8.24670e-7, U04=+5.38750e-9,
    V00=-5.72466e-3, V01=+1.02270e-4, V02=-1.65460e-6,
    W00=+4.8314e-4,
    # Secant bulk modulus (mod_eoscoef.F A/B/D/E/F/G/H).
    A00=+1.909256e+4, A01=+2.098925e+2, A02=-3.041638e+0,
    A03=-1.852732e-3, A04=-1.361629e-5,
    B00=+1.044077e+2, B01=-6.500517e+0, B02=+1.553190e-1,
    B03=+2.326469e-4,
    D00=-5.587545e+0, D01=+7.390729e-1, D02=-1.909078e-2,
    E00=+4.721788e-1, E01=+1.028859e-2, E02=-2.512549e-4,
    E03=-5.939910e-7,
    F00=-1.571896e-2, F01=-2.598241e-4, F02=+7.267926e-6,
    G00=+2.042967e-3,
    G01=+1.045941e-5, G02=-5.782165e-10, G03=+1.296821e-7,
    H00=-2.595994e-7, H01=-1.248266e-9, H02=-3.508914e-9,
)


def _jm95_parts(cfg: ModelConfig, t):
    """Depth-independent JM95 pieces: den1 and bulk modulus polynomials
    bulk0/bulk1/bulk2 with bulk(z) = bulk0 - z*(bulk1 - z*bulk2)
    (rho_eos.F:270-325).  Returns (T, S, sqrtS, den1, b0, b1, b2)."""
    Q = _Q
    T = jnp.maximum(t[0], -2.0)
    S = jnp.maximum(t[1], 0.0) if cfg.NT > 1 else jnp.zeros_like(T)
    sqrtS = jnp.sqrt(S)

    den1 = (Q["Q00"] + T * (Q["Q01"] + T * (Q["Q02"] + T * (Q["Q03"]
            + T * (Q["Q04"] + T * Q["Q05"]))))
            + S * (Q["U00"] + T * (Q["U01"] + T * (Q["U02"]
                   + T * (Q["U03"] + T * Q["U04"]))))
            + S * sqrtS * (Q["V00"] + T * (Q["V01"] + T * Q["V02"]))
            + S * S * Q["W00"])

    b0 = (Q["A00"] + T * (Q["A01"] + T * (Q["A02"] + T * (Q["A03"]
          + T * Q["A04"])))
          + S * (Q["B00"] + T * (Q["B01"] + T * (Q["B02"] + T * Q["B03"])))
          + S * sqrtS * (Q["D00"] + T * (Q["D01"] + T * Q["D02"])))
    b1 = (Q["E00"] + T * (Q["E01"] + T * (Q["E02"] + T * Q["E03"]))
          + S * (Q["F00"] + T * (Q["F01"] + T * Q["F02"]))
          + S * sqrtS * Q["G00"])
    b2 = (Q["G01"] + T * (Q["G02"] + T * Q["G03"])
          + S * (Q["H00"] + T * (Q["H01"] + T * Q["H02"])))
    return T, S, sqrtS, den1, b0, b1, b2


def rho_eos_jm95(cfg: ModelConfig, t, z_r):
    """Nonlinear in-situ density anomaly (Jackett & McDougall 1995)."""
    _, _, _, den1, b0, b1, b2 = _jm95_parts(cfg, t)
    bulk = b0 - z_r * (b1 - z_r * b2)
    rho = den1 * bulk / (bulk + 0.1 * z_r)
    return rho - 1000.0


def eos_alpha_beta(cfg: ModelConfig, t, z_r, all_levels: bool = False):
    """Exact thermal expansion alpha (1/C) and saline contraction beta
    (1/PSU) from the analytic polynomial derivatives (rho_eos.F:276-340,
    427-465, EOS_TDERIVATIVE).

    By default only the surface level is evaluated (the reference's
    non-LMD_DDMIX branch): pass full-depth arrays and read [-1], or
    all_levels=True for the alfaobeta double-diffusion profile.
    Also returns alfaobeta = Tcof/Scof at every level when requested.
    Returns (alpha, beta) with the input's leading shape (or its [-1]
    slice when all_levels is False).
    """
    Q = _Q
    if not all_levels:
        t = t[:, -1:] if t.ndim == 4 else t
        z_r = z_r[-1:] if hasattr(z_r, "ndim") and z_r.ndim == 3 else z_r
    T, S, sqrtS, den1, b0, b1, b2 = _jm95_parts(cfg, t)

    # d(den1)/dT, d(den1)/dS (rho_eos.F:276-296)
    dC0 = Q["Q01"] + T * (2.0 * Q["Q02"] + T * (3.0 * Q["Q03"]
          + T * (4.0 * Q["Q04"] + T * 5.0 * Q["Q05"])))
    dC1 = Q["U01"] + T * (2.0 * Q["U02"] + T * (3.0 * Q["U03"]
          + T * 4.0 * Q["U04"]))
    dC2 = Q["V01"] + T * 2.0 * Q["V02"]
    C1 = Q["U00"] + T * (Q["U01"] + T * (Q["U02"] + T * (Q["U03"]
         + T * Q["U04"])))
    C2 = Q["V00"] + T * (Q["V01"] + T * Q["V02"])
    Dden1DS = C1 + 1.5 * C2 * sqrtS + 2.0 * Q["W00"] * S
    Dden1DT = dC0 + S * (dC1 + sqrtS * dC2)

    # d(bulk)/dT, d(bulk)/dS (rho_eos.F:310-340)
    dC3 = Q["A01"] + T * (2.0 * Q["A02"] + T * (3.0 * Q["A03"]
          + T * 4.0 * Q["A04"]))
    dC4 = Q["B01"] + T * (2.0 * Q["B02"] + T * 3.0 * Q["B03"])
    dC5 = Q["D01"] + T * 2.0 * Q["D02"]
    dC6 = Q["E01"] + T * (2.0 * Q["E02"] + T * 3.0 * Q["E03"])
    dC7 = Q["F01"] + T * 2.0 * Q["F02"]
    dC8 = Q["G02"] + T * 2.0 * Q["G03"]
    dC9 = Q["H01"] + T * 2.0 * Q["H02"]
    C4 = Q["B00"] + T * (Q["B01"] + T * (Q["B02"] + T * Q["B03"]))
    C5 = Q["D00"] + T * (Q["D01"] + T * Q["D02"])
    C7 = Q["F00"] + T * (Q["F01"] + T * Q["F02"])
    C9 = Q["H00"] + T * (Q["H01"] + T * Q["H02"])
    Tp = z_r
    DbulkDS = C4 + sqrtS * 1.5 * C5 - Tp * (C7 + sqrtS * 1.5 * Q["G00"]
                                            - Tp * C9)
    DbulkDT = dC3 + S * (dC4 + sqrtS * dC5) - Tp * (dC6 + S * dC7
              - Tp * (dC8 + S * dC9))

    # assemble (rho_eos.F:440-465)
    bulk = b0 - Tp * (b1 - Tp * b2)
    Tpr10 = 0.1 * Tp
    den = den1 * bulk / (bulk + Tpr10)
    cff = bulk + Tpr10
    cff1 = Tpr10 * den1
    cff2 = bulk * cff
    wrk = den * cff * cff
    Tcof = -(DbulkDT * cff1 + Dden1DT * cff2)
    Scof = (DbulkDS * cff1 + Dden1DS * cff2)
    alpha = Tcof / wrk
    beta = Scof / wrk
    if all_levels:
        alfaobeta = Tcof / Scof
        return alpha, beta, alfaobeta
    return alpha[..., -1, :, :] if alpha.ndim == 3 else alpha, \
        beta[..., -1, :, :] if beta.ndim == 3 else beta


def rho_eos(cfg: ModelConfig, t, z_r, Hz, z_w):
    """Density anomaly plus barotropic-coupling averages.

    Returns (rho, pden, rhoA, rhoS, bvf):
      pden: surface-referenced potential density anomaly (rho_eos.F pden)
      rhoA: nondimensional vertically averaged density (rho_eos.F:726-748)
      rhoS: nondimensional density perturbation for the 2D pressure gradient
      bvf:  Brunt-Vaisala frequency squared at w interfaces (N+1, Mj, Li);
            zero at surface/bottom interfaces.  Linear EOS: potential-
            density gradient; JM95: adiabatic parcel displacement to the
            interface depth (rho_eos.F:395-424).
    """
    from .. import constants
    if cfg.eos.linear:
        rho = rho_eos_linear(cfg, t)
        pden = rho
        bvf_i = -(constants.g / cfg.rho0) * (pden[1:] - pden[:-1]) \
            / (z_r[1:] - z_r[:-1])
    else:
        _, _, _, den1, b0, b1, b2 = _jm95_parts(cfg, t)
        bulk = b0 - z_r * (b1 - z_r * b2)
        rho = den1 * bulk / (bulk + 0.1 * z_r) - 1000.0
        pden = den1 - 1000.0
        # adiabatic parcels displaced to the interface depth z_w[k]
        # (rho_eos.F:398-416); bvf normalized by the local mean density.
        zw_i = z_w[1:-1]
        bulk_up = b0[1:] - zw_i * (b1[1:] - b2[1:] * zw_i)
        bulk_dn = b0[:-1] - zw_i * (b1[:-1] - b2[:-1] * zw_i)
        den_up = den1[1:] * bulk_up / (bulk_up + 0.1 * zw_i)
        den_dn = den1[:-1] * bulk_dn / (bulk_dn + 0.1 * zw_i)
        bvf_i = -constants.g * (den_up - den_dn) / \
            (0.5 * (den_up + den_dn) * (z_r[1:] - z_r[:-1]))

    # Top-down accumulation (rho_eos.F:731-741): starting at the surface,
    #   rhoA_N = rho_N Hz_N;  rhoS_N = 0.5 rho_N Hz_N^2
    #   k: rhoS += Hz_k (rhoA + 0.5 rho_k Hz_k);  rhoA += rho_k Hz_k
    rhoHz = rho * Hz
    # cumulative sums from the top: reverse, cumsum, reverse
    csum_above = jnp.cumsum(rhoHz[::-1], axis=0)[::-1] - rhoHz  # sum_{m>k}
    rhoA = jnp.sum(rhoHz, axis=0)
    rhoS = jnp.sum(Hz * (csum_above + 0.5 * rhoHz), axis=0)

    D_inv = 1.0 / (z_w[-1] - z_w[0])
    o_rho0 = 1.0 / cfg.rho0
    rhoA = o_rho0 * D_inv * rhoA
    rhoS = 2.0 * o_rho0 * D_inv * D_inv * rhoS

    zeros = jnp.zeros_like(bvf_i[:1])
    bvf = jnp.concatenate([zeros, bvf_i, zeros], axis=0)
    return rho, pden, rhoA, rhoS, bvf
