"""Equation of state.

Linear EOS follows ROMS/Nonlinear/rho_eos.F:694-723:
    rho = R0 - R0*Tcoef*(T - T0) + R0*Scoef*(S - S0) - 1000   (density anomaly)
The vertically averaged density rhoA and perturbation rhoS used by the
barotropic pressure gradient (VAR_RHO_2D, rho_eos.F:726-748) are computed
with the same top-down accumulation.

The nonlinear Jackett & McDougall (1995) polynomial (rho_eos.F:12-37)
is provided for the benchmark physics.
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


def rho_eos_jm95(cfg: ModelConfig, t, z_r):
    """Nonlinear in-situ density anomaly (Jackett & McDougall 1995).

    Matches the reference's check values (rho_eos.F:20-37):
    rho(T=3C, S=35.5, Z=-5000m) should be 1050.3639165364 kg/m3 before
    subtracting 1000.
    """
    Q = _Q
    T = t[0]
    S = jnp.maximum(t[1], 0.0) if cfg.NT > 1 else jnp.zeros_like(T)
    sqrtS = jnp.sqrt(S)

    den1 = (Q["Q00"] + T * (Q["Q01"] + T * (Q["Q02"] + T * (Q["Q03"]
            + T * (Q["Q04"] + T * Q["Q05"]))))
            + S * (Q["U00"] + T * (Q["U01"] + T * (Q["U02"]
                   + T * (Q["U03"] + T * Q["U04"]))))
            + S * sqrtS * (Q["V00"] + T * (Q["V01"] + T * Q["V02"]))
            + S * S * Q["W00"])

    K0 = (Q["A00"] + T * (Q["A01"] + T * (Q["A02"] + T * (Q["A03"]
          + T * Q["A04"])))
          + S * (Q["B00"] + T * (Q["B01"] + T * (Q["B02"] + T * Q["B03"])))
          + S * sqrtS * (Q["D00"] + T * (Q["D01"] + T * Q["D02"])))
    K1 = (Q["E00"] + T * (Q["E01"] + T * (Q["E02"] + T * Q["E03"]))
          + S * (Q["F00"] + T * (Q["F01"] + T * Q["F02"]))
          + S * sqrtS * Q["G00"])
    K2 = (Q["G01"] + T * (Q["G02"] + T * Q["G03"])
          + S * (Q["H00"] + T * (Q["H01"] + T * Q["H02"])))

    bulk = K0 - z_r * (K1 - z_r * K2)
    rho = den1 * bulk / (bulk + 0.1 * z_r)
    return rho - 1000.0


def rho_eos(cfg: ModelConfig, t, z_r, Hz, z_w):
    """Density anomaly plus barotropic-coupling averages.

    Returns (rho, pden, rhoA, rhoS, bvf):
      pden: surface-referenced potential density anomaly (rho_eos.F pden)
      rhoA: nondimensional vertically averaged density (rho_eos.F:726-748)
      rhoS: nondimensional density perturbation for the 2D pressure gradient
      bvf:  Brunt-Vaisala frequency squared at w interfaces (N+1, Mj, Li),
            bvf = -(g/rho0) d(pden)/dz (rho_eos.F "Compute Brunt-Vaisala");
            zero at surface/bottom interfaces.  For the nonlinear EOS this
            uses the potential-density gradient (the reference's exact
            adiabatic-derivative form arrives with the EOS-derivatives
            milestone).
    """
    if cfg.eos.linear:
        rho = rho_eos_linear(cfg, t)
    else:
        rho = rho_eos_jm95(cfg, t, z_r)

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

    # Brunt-Vaisala frequency from potential density (surface-referenced:
    # for the linear EOS pden == rho; for JM95 use the z=0 polynomial).
    from .. import constants
    if cfg.eos.linear:
        pden = rho
    else:
        pden = rho_eos_jm95(cfg, t, jnp.zeros_like(z_r))
    bvf_i = -(constants.g / cfg.rho0) * (pden[1:] - pden[:-1]) \
        / (z_r[1:] - z_r[:-1])
    zeros = jnp.zeros_like(bvf_i[:1])
    bvf = jnp.concatenate([zeros, bvf_i, zeros], axis=0)
    return rho, pden, rhoA, rhoS, bvf
