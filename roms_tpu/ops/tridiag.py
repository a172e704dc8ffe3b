"""Batched tridiagonal solvers along the vertical (k) axis.

The reference solves its implicit vertical viscosity/diffusion systems with
hand-rolled Thomas sweeps inside per-tile loops (step3d_uv.F:458-497,
step3d_t.F vertical-diffusion section).  Here each sweep step is a
`lax.scan` iteration operating on a full (Mm+2, Lm+2) horizontal slab, so
the VPU processes whole planes per step; k is never decomposed (matching
the reference's design constraint, SURVEY.md section 2.2).

All arrays are [k, j, i] with k axis 0.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def tridiag_solve(lower, diag, upper, rhs):
    """Solve tridiagonal systems along axis 0 (Thomas algorithm).

    lower[k] multiplies x[k-1] (lower[0] ignored);
    diag[k]  multiplies x[k];
    upper[k] multiplies x[k+1] (upper[-1] ignored).
    Shapes: (N, ...) with arbitrary trailing batch dims.

    On TPU with 3-D operands the solve is dispatched to the Pallas
    VMEM-resident kernel (ops/pallas_tridiag.py, ~11% faster than the
    XLA scan and bit-exact); every other case takes the scan path.
    """
    import os
    from .kernel_gate import dtype_supported, pallas_enabled
    use_pallas = (jax.default_backend() == "tpu"
                  and jax.device_count() == 1
                  and pallas_enabled()
                  and dtype_supported(rhs.dtype)
                  and not os.environ.get("ROMS_TPU_NO_PALLAS_TRIDIAG"))
    if rhs.ndim > 3 and use_pallas and \
            os.environ.get("ROMS_TPU_PALLAS_TRIDIAG_4D") == "1":
        # stacked-system batches (N, B, Mj, Li) CAN collapse into the
        # VMEM Pallas path, but measured SLOWER than the scan at
        # BENCHMARK3 (step3d_t 19.9 vs 14.3 ms — the flattened grid
        # degenerates into ~1.1k tiny-block launches), so this route is
        # opt-in.  It must also never run under a mesh: the reshape
        # merges the replicated batch dim with the sharded eta dim and
        # GSPMD inserts field-sized all-gathers.  The scan path handles
        # trailing batch dims natively with no data movement.
        shp = rhs.shape

        def flat(x):
            return x.reshape(x.shape[0], -1, shp[-1])
        return tridiag_solve(flat(lower), flat(diag), flat(upper),
                             flat(rhs)).reshape(shp)
    if use_pallas and rhs.ndim == 3 and rhs.shape[0] <= 128:
        from .pallas_tridiag import tridiag_solve_pallas
        return tridiag_solve_pallas(lower, diag, upper, rhs)

    def fwd(carry, xs):
        cp_prev, dp_prev = carry
        a, b, c, d = xs
        denom = 1.0 / (b - a * cp_prev)
        cp = c * denom
        dp = (d - a * dp_prev) * denom
        return (cp, dp), (cp, dp)

    zeros = jnp.zeros_like(rhs[0])
    (_, _), (cps, dps) = lax.scan(fwd, (zeros, zeros),
                                  (lower, diag, upper, rhs))

    def bwd(x_next, xs):
        cp, dp = xs
        x = dp - cp * x_next
        return x, x

    _, sol = lax.scan(bwd, zeros, (cps, dps), reverse=True)
    return sol


def spline_flux_solve(Hzk, AK, q, dt):
    """Implicit vertical-flux solve with parabolic-spline reconstruction.

    Used by SPLINES_VVISC / SPLINES_VDIFF paths (step3d_uv.F:393-437,
    step3d_t.F "SPLINES_VDIFF" block).  Solves for interface flux potential
    DC[k] (k = 1..N-1 interfaces) of the system

        FC(k)*DC(k-1) + BC(k)*DC(k) + CF(k)*DC(k+1) = q(k+1) - q(k)

    with FC(k) = Hzk(k)/6   - dt*AK(k-1)/Hzk(k)
         CF(k) = Hzk(k+1)/6 - dt*AK(k+1)/Hzk(k+1)
         BC(k) = (Hzk(k)+Hzk(k+1))/3 + dt*AK(k)*(1/Hzk(k)+1/Hzk(k+1))
    and DC(0) = DC(N) = 0, then returns the update

        dq(k) = dt/Hzk(k) * (AK(k)*DC(k) - AK(k-1)*DC(k-1)).

    Args:
      Hzk: (N, ...) layer thickness at the solve points.
      AK:  (N+1, ...) vertical mixing coefficient at interfaces (0..N).
      q:   (N, ...) field (velocity in m/s or tracer) at mid-levels.
      dt:  scalar time step.
    Returns dq with the same shape as q.
    """
    N = q.shape[0]
    oHz = 1.0 / Hzk
    sixth = 1.0 / 6.0
    third = 1.0 / 3.0

    # Interface systems k=1..N-1 (index kk=0..N-2 below).
    FC = sixth * Hzk[:-1] - dt * AK[:-2] * oHz[:-1]
    CF = sixth * Hzk[1:] - dt * AK[2:] * oHz[1:]
    BC = (third * (Hzk[:-1] + Hzk[1:])
          + dt * AK[1:-1] * (oHz[:-1] + oHz[1:]))
    rhs = q[1:] - q[:-1]

    DC_int = tridiag_solve(FC, BC, CF, rhs)       # (N-1, ...)
    zeros = jnp.zeros_like(q[:1])
    DC = jnp.concatenate([zeros, DC_int, zeros], axis=0)   # (N+1, ...)

    flux = AK * DC                                 # (N+1, ...)
    return dt * oHz * (flux[1:] - flux[:-1])


def implicit_vdiff_solve(Hzk, AK, dz_inv, q_times_Hz, dt, lam=1.0):
    """Standard backward-implicit vertical diffusion (non-splines path).

    step3d_uv.F:441-497 / step3d_t.F standard block:
        FC(k) = -lam*dt*AK(k)/dz(k)  at interfaces k=1..N-1,
        BC(k) = Hzk(k) - FC(k) - FC(k-1),
        solve  tri(BC, FC) x = q_times_Hz;  returns x (in q units).

    Args:
      Hzk:        (N, ...) layer thicknesses.
      AK:         (N+1, ...) interface mixing coefficient.
      dz_inv:     (N-1, ...) 1/(z_r[k+1]-z_r[k]) at interior interfaces.
      q_times_Hz: (N, ...) right-hand side in (units * m).
      dt, lam:    scalars.
    """
    N = q_times_Hz.shape[0]
    FC_int = -lam * dt * AK[1:-1] * dz_inv        # (N-1, ...)
    zeros = jnp.zeros_like(q_times_Hz[:1])
    FC = jnp.concatenate([zeros, FC_int, zeros], axis=0)  # (N+1, ...)
    diag = Hzk - FC[1:] - FC[:-1]
    lower = FC[:-1]
    upper = FC[1:]
    return tridiag_solve(lower, diag, upper, q_times_Hz)


def implicit_adv_solve(Hzk, FC, rhs_hzw):
    """Upwind backward-implicit vertical advection (step3d_t.F:1553-1680,
    step3d_uv.F:507-600, OMEGA_IMPLICIT).

    Solves, per column,
        (Hz_k + FCmax_{k+1/2} - FCmin_{k-1/2}) x_k
          + FCmin_{k+1/2} x_{k+1} - FCmax_{k-1/2} x_{k-1} = rhs_k
    where FC = dt*pm*pn*Wi at interfaces ((N+1, ...), zero rows top and
    bottom) and rhs is the Hz-weighted field.  Returns the concentration
    x (NOT Hz-weighted).
    """
    FCmax = jnp.maximum(FC, 0.0)
    FCmin = jnp.minimum(FC, 0.0)
    diag = Hzk + FCmax[1:] - FCmin[:-1]
    upper = FCmin[1:]
    lower = -FCmax[:-1]
    return tridiag_solve(lower, diag, upper, rhs_hzw)
