"""Fused 3D-momentum corrector Pallas kernels (step3d_uv).

Two VMEM passes replace the ~45 whole-array field passes of
core/step3d_uv.py (step3d_uv.F:261-1716):

  * `uv_solve_pallas` — AB3 seed + parabolic-spline implicit vertical
    viscosity (both u and v systems solved in-kernel with unrolled
    Thomas sweeps) + first barotropic-mean replacement
    (step3d_uv.F:261-700); output is pre-BC.
  * `uv_finish_pallas` — post-BC re-correction, ubar/vbar from
    DU_avg1, and the DU_avg2-consistent time-centered mass fluxes
    Huon/Hvom with periodic lane refresh (step3d_uv.F:1390-1716).

j-shifted averages (Hz_v, AKv, DC0v) are PRECOMPUTED outside the
kernel with `st.jm1`: the finish stage runs after bc_u/bc_v, and its
ring-row values feed interior stencils on the NEXT step, so the
kernel must reproduce the jnp path's jnp.roll row-wrap values exactly
rather than zeroing dead rows (contrast ops/pallas_rhs3d.py, whose
ring rows ARE dead).  Lane (i) shifts wrap identically to jnp.roll via
pltpu.roll, so Hz_u/AKu stay in-kernel.

Numerics match core/step3d_uv.py expression-for-expression; the only
permitted deviations are XLA FMA-contraction and k-sum reduction-order
ulps, bounded by the trajectory test in tests/test_pallas_uv.py.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SIXTH = 1.0 / 6.0
THIRD = 1.0 / 3.0


def _roll(x, s):
    return pltpu.roll(x, s % x.shape[-1], axis=x.ndim - 1)


def _im1(x):
    return _roll(x, 1)


def _iota_l(shape):
    return jax.lax.broadcasted_iota(jnp.int32, shape, len(shape) - 1)


def _perx(x, Li):
    i = _iota_l(x.shape)
    x = jnp.where(i == 0, _roll(x, -(Li - 2)), x)
    return jnp.where(i == Li - 1, _roll(x, Li - 2), x)


def _spline_dq(Hzk, AK, q, dt):
    """Unrolled in-VMEM spline_flux_solve (ops/tridiag.py:60-102):
    returns dq so that the solved field is q + dq.  Hzk: (N,.),
    AK: (N+1,.), q: (N,.)."""
    N = q.shape[0]
    oHz = 1.0 / Hzk
    lo = [SIXTH * Hzk[k] - dt * AK[k] * oHz[k] for k in range(N - 1)]
    up = [SIXTH * Hzk[k + 1] - dt * AK[k + 2] * oHz[k + 1]
          for k in range(N - 1)]
    dg = [THIRD * (Hzk[k] + Hzk[k + 1])
          + dt * AK[k + 1] * (oHz[k] + oHz[k + 1])
          for k in range(N - 1)]
    rhs = [q[k + 1] - q[k] for k in range(N - 1)]

    # Thomas, associated exactly like ops/pallas_tridiag._thomas_kernel
    cp = [None] * (N - 1)
    dp = [None] * (N - 1)
    inv0 = 1.0 / dg[0]
    cp[0] = up[0] * inv0
    dp[0] = rhs[0] * inv0
    for k in range(1, N - 1):
        denom = 1.0 / (dg[k] - lo[k] * cp[k - 1])
        cp[k] = up[k] * denom
        dp[k] = (rhs[k] - lo[k] * dp[k - 1]) * denom
    DC = [None] * (N - 1)
    DC[N - 2] = dp[N - 2]
    for k in range(N - 3, -1, -1):
        DC[k] = dp[k] - cp[k] * DC[k + 1]

    zero = jnp.zeros_like(q[0])
    DCf = [zero] + DC + [zero]               # interfaces 0..N
    flux = [AK[k] * DCf[k] for k in range(N + 1)]
    return jnp.stack([dt * oHz[k] * (flux[k + 1] - flux[k])
                      for k in range(N)])


def _correct(q, Hzq, scale, avg1, mask):
    """Replace the vertical mean with the fast-time average
    (step3d_uv.F:595-700): q <- (q - err)*mask."""
    D = jnp.sum(Hzq, axis=0)
    err = (jnp.sum(q * Hzq, axis=0) * scale - avg1) / (D * scale)
    return (q - err[None]) * mask[None]


def _solve_kernel(dt, up_ref, vp_ref, ru_ref, rv_ref, hz_ref, hzv_ref,
                  ak_ref, akv_ref, dc0u_ref, dc0v_ref, um_ref, vm_ref,
                  onu_ref, omv_ref, du1_ref, dv1_ref,
                  out_u, out_v):
    Hz = hz_ref[...]
    Hz_u = 0.5 * (Hz + _im1(Hz))
    Hz_v = hzv_ref[...]
    Akv = ak_ref[...]
    AKu = 0.5 * (Akv + _im1(Akv))
    AKv_ = akv_ref[...]

    un = up_ref[...] + dc0u_ref[...][None] * ru_ref[...]
    vn = vp_ref[...] + dc0v_ref[...][None] * rv_ref[...]

    un = un / Hz_u
    vn = vn / Hz_v
    un = un + _spline_dq(Hz_u, AKu, un, dt)
    vn = vn + _spline_dq(Hz_v, AKv_, vn, dt)

    un = _correct(un, Hz_u, onu_ref[...], du1_ref[...], um_ref[...])
    vn = _correct(vn, Hz_v, omv_ref[...], dv1_ref[...], vm_ref[...])
    out_u[...] = un
    out_v[...] = vn


def _finish_kernel(ew, Li, un_ref, vn_ref, hz_ref, hzv_ref,
                   huo_ref, hvo_ref, um_ref, vm_ref, onu_ref, omv_ref,
                   du1_ref, dv1_ref, du2_ref, dv2_ref,
                   out_u, out_v, out_ub, out_vb, out_hu, out_hv):
    Hz = hz_ref[...]
    Hz_u = 0.5 * (Hz + _im1(Hz))
    Hz_v = hzv_ref[...]
    on_u = onu_ref[...]
    om_v = omv_ref[...]
    umask = um_ref[...]
    vmask = vm_ref[...]
    D_u = jnp.sum(Hz_u, axis=0)
    D_v = jnp.sum(Hz_v, axis=0)

    un = _correct(un_ref[...], Hz_u, on_u, du1_ref[...], umask)
    vn = _correct(vn_ref[...], Hz_v, om_v, dv1_ref[...], vmask)
    out_u[...] = un
    out_v[...] = vn
    out_ub[...] = du1_ref[...] / (D_u * on_u) * umask
    out_vb[...] = dv1_ref[...] / (D_v * om_v) * vmask

    DCk_u = Hz_u * on_u[None]
    DCk_v = Hz_v * om_v[None]
    Huon = 0.5 * (huo_ref[...] + un * DCk_u)
    Hvom = 0.5 * (hvo_ref[...] + vn * DCk_v)
    errU = (jnp.sum(Huon, axis=0) - du2_ref[...]) / (D_u * on_u)
    errV = (jnp.sum(Hvom, axis=0) - dv2_ref[...]) / (D_v * om_v)
    Huon = Huon - DCk_u * errU[None]
    Hvom = Hvom - DCk_v * errV[None]
    if ew:
        Huon = _perx(Huon, Li)
        Hvom = _perx(Hvom, Li)
    out_hu[...] = Huon
    out_hv[...] = Hvom


def _specs(N, Mj, Li, BJ, gj):
    s3 = pl.BlockSpec((N, BJ, Li), lambda j: (0, j, 0),
                      memory_space=pltpu.VMEM)
    s3w = pl.BlockSpec((N + 1, BJ, Li), lambda j: (0, j, 0),
                       memory_space=pltpu.VMEM)
    s2 = pl.BlockSpec((BJ, Li), lambda j: (j, 0),
                      memory_space=pltpu.VMEM)
    return s3, s3w, s2


def uv_solve_pallas(cfg, grid, u_part, v_part, ru, rv, Hz, Akv, cffab,
                    DU_avg1, DV_avg1, interpret=False):
    """Pre-BC (un, vn): seeds + spline viscosity + first barotropic
    replacement.  Requires cfg.mixing.splines_vvisc (gated by caller).

    Returns (un, vn) matching core/step3d_uv.py up to the first
    correct_u/correct_v (exclusive of bc/radiation)."""
    from . import stencil as st
    N, Mj, Li = ru.shape
    dtype = ru.dtype
    BJ = 8
    gj = pl.cdiv(Mj, BJ)
    s3, s3w, s2 = _specs(N, Mj, Li, BJ, gj)

    Hz_v = 0.5 * (Hz + st.jm1(Hz))
    AKv_ = 0.5 * (Akv + st.jm1(Akv))
    DC0u = cffab * (grid.pm + st.im1(grid.pm)) * \
        (grid.pn + st.im1(grid.pn))
    DC0v = cffab * (grid.pm + st.jm1(grid.pm)) * \
        (grid.pn + st.jm1(grid.pn))
    args = [u_part, v_part, ru, rv, Hz, Hz_v, Akv, AKv_,
            DC0u.astype(dtype), DC0v.astype(dtype),
            grid.umask.astype(dtype), grid.vmask.astype(dtype),
            grid.on_u.astype(dtype), grid.om_v.astype(dtype),
            DU_avg1, DV_avg1]
    specs = [s3, s3, s3, s3, s3, s3, s3w, s3w,
             s2, s2, s2, s2, s2, s2, s2, s2]
    return pl.pallas_call(
        functools.partial(_solve_kernel, float(cfg.dt)),
        out_shape=(jax.ShapeDtypeStruct((N, Mj, Li), dtype),) * 2,
        grid=(gj,),
        in_specs=specs,
        out_specs=(s3, s3),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=110 * 1024 * 1024),
    )(*args)


def uv_finish_pallas(cfg, grid, un, vn, Hz, Huon_old, Hvom_old,
                     DU_avg1, DV_avg1, DU_avg2, DV_avg2,
                     interpret=False):
    """Post-BC finish: re-correction, ubar/vbar, mass-flux rebuild."""
    from . import stencil as st
    N, Mj, Li = un.shape
    dtype = un.dtype
    BJ = 8
    gj = pl.cdiv(Mj, BJ)
    s3, s3w, s2 = _specs(N, Mj, Li, BJ, gj)
    ew = bool(cfg.bc.ew_periodic)

    Hz_v = 0.5 * (Hz + st.jm1(Hz))
    args = [un, vn, Hz, Hz_v, Huon_old, Hvom_old,
            grid.umask.astype(dtype), grid.vmask.astype(dtype),
            grid.on_u.astype(dtype), grid.om_v.astype(dtype),
            DU_avg1, DV_avg1, DU_avg2, DV_avg2]
    specs = [s3, s3, s3, s3, s3, s3, s2, s2, s2, s2, s2, s2, s2, s2]
    shp3 = jax.ShapeDtypeStruct((N, Mj, Li), dtype)
    shp2 = jax.ShapeDtypeStruct((Mj, Li), dtype)
    return pl.pallas_call(
        functools.partial(_finish_kernel, ew, Li),
        out_shape=(shp3, shp3, shp2, shp2, shp3, shp3),
        grid=(gj,),
        in_specs=specs,
        out_specs=(s3, s3, s2, s2, s3, s3),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=110 * 1024 * 1024),
    )(*args)


def _interp():
    return os.environ.get("ROMS_TPU_PALLAS_UV_INTERPRET", "") == "1"


def use_pallas_uv(cfg) -> bool:
    """Kernel covers the splines-viscosity path on non-NS-periodic
    grids without NS-periodic row wrap; OMEGA_IMPLICIT falls back."""
    from .kernel_gate import pallas_enabled
    if not pallas_enabled():
        return False
    if cfg.bc.ns_periodic or not cfg.mixing.splines_vvisc:
        return False
    if cfg.omega_implicit:
        return False
    flag = os.environ.get("ROMS_TPU_PALLAS_UV", "")
    if flag == "0":
        return False
    if flag == "1":
        return True
    from .kernel_gate import dtype_supported
    if not dtype_supported(cfg.dtype):
        return False
    return jax.default_backend() == "tpu" and jax.device_count() == 1
