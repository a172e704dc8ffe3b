"""Fused splines density-Jacobian pressure gradient (prsgrd32.h).

One VMEM pass per j-block computes the full core/prsgrd.prsgrd32 chain
(ROMS/Nonlinear/prsgrd32.h:158-378): vertical spline derivatives with
harmonic-mean limiting, the top-down pressure integral (unrolled over
the static N levels — no HBM scan carries), and both horizontal
density-Jacobian directions.  The jnp path materializes ~25 field-sized
intermediates (dR/dZ/dRm/dZm/dP/csum/P/dZx/dRx/dZe/dRe...) in HBM; here
only rho/z_r/Hz are read once and ru/rv written once.

Mechanics follow ops/pallas_step2d.py: the predictor-style extended
window — every stencil input arrives as a (center, minus, plus) block
triple stitched into a (N, 3*BJ, Li) window, the whole chain is
evaluated over the window, and only the center BJ rows are stored.
Row-wrap contamination from the in-window shifts reaches <= 2 rows from
the window edges, 6+ rows away from anything stored.  Lane shifts are
`pltpu.roll` + explicit EW ring refresh (the kernel is gated to
EW-periodic, non-NS-periodic configs — the BENCHMARK/UPWELLING channel
class).  Output ring rows j = 0 / Mj-1 are zeroed (dead data every
consumer overwrites via the lateral BCs; proven by the full-step
trajectory test in tests/test_pallas_prsgrd.py).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_EPS = 1.0e-10
OneFifth = 0.2
OneTwelfth = 1.0 / 12.0


def _iota_l(shape):
    return jax.lax.broadcasted_iota(jnp.int32, shape, len(shape) - 1)


def _roll(x, s):
    return pltpu.roll(x, s % x.shape[-1], axis=x.ndim - 1)


def _im1(x):
    return _roll(x, 1)


def _ip1(x):
    return _roll(x, -1)


def _jm1(x):
    ax = x.ndim - 2
    return jnp.concatenate(
        [jax.lax.slice_in_dim(x, x.shape[ax] - 1, x.shape[ax], axis=ax),
         jax.lax.slice_in_dim(x, 0, x.shape[ax] - 1, axis=ax)], axis=ax)


def _jp1(x):
    ax = x.ndim - 2
    return jnp.concatenate(
        [jax.lax.slice_in_dim(x, 1, x.shape[ax], axis=ax),
         jax.lax.slice_in_dim(x, 0, 1, axis=ax)], axis=ax)


def _perx(x, Li):
    """st.periodic_x ring refresh: lane 0 <- Li-2, lane Li-1 <- 1."""
    i = _iota_l(x.shape)
    x = jnp.where(i == 0, _roll(x, -(Li - 2)), x)
    return jnp.where(i == Li - 1, _roll(x, Li - 2), x)


def _harmonic(a, b):
    cff = 2.0 * a * b
    good = cff > _EPS
    den = jnp.where(good, a + b, 1.0)
    return jnp.where(good, cff / den, 0.0)


def _harmonic_z(a, b):
    return 2.0 * a * b / (a + b)


def _kernel(Li, Mj, BJ, g, rho0, sal_scalar, has_tide, has_pair,
            rho_c, rho_m, rho_p, zr_c, zr_m, zr_p, hz_c, hz_m, hz_p,
            um_c, um_m, um_p, vm_c, vm_m, vm_p,
            zw_c, zw_m, zw_p, xt_c, xt_m, xt_p,
            onu_ref, omv_ref, out_ru, out_rv):
    def ext3(c, m, p):
        return jnp.concatenate([m[...], c[...], p[...]], axis=1)

    def ext2(c, m, p):
        return jnp.concatenate([m[...], c[...], p[...]], axis=0)

    rho = ext3(rho_c, rho_m, rho_p)
    z_r = ext3(zr_c, zr_m, zr_p)
    Hz = ext3(hz_c, hz_m, hz_p)
    umask = ext2(um_c, um_m, um_p)             # (3BJ, Li), broadcasts
    vmask = ext2(vm_c, vm_m, vm_p)
    zw_top = ext2(zw_c, zw_m, zw_p)            # (3BJ, Li) surface z_w
    xtra = ext2(xt_c, xt_m, xt_p)              # eq_tide / Pair / zeros
    N = rho.shape[0]

    GRho = g / rho0
    HalfGRho = 0.5 * GRho

    # ---- vertical spline derivatives (prsgrd32.h:165-187) ------------
    # positive static indices throughout: negative int indexing lowers
    # to dynamic_slice, unimplemented in Mosaic
    dR_i = rho[1:N] - rho[0:N - 1]
    dZ_i = z_r[1:N] - z_r[0:N - 1]
    dR = jnp.concatenate([dR_i[0:1], dR_i, dR_i[N - 2:N - 1]], axis=0)
    dZ = jnp.concatenate([dZ_i[0:1], dZ_i, dZ_i[N - 2:N - 1]], axis=0)
    dRm = _harmonic(dR[1:N + 1], dR[0:N])
    dZm = _harmonic_z(dZ[1:N + 1], dZ[0:N])

    # ---- pressure integral, unrolled top-down (:189-219) -------------
    cff1 = 1.0 / (z_r[N - 1] - z_r[N - 2])
    cff2 = 0.5 * (rho[N - 1] - rho[N - 2]) * (zw_top - z_r[N - 1]) * cff1
    P_top = g * (1.0 - sal_scalar) * zw_top \
        + GRho * (rho[N - 1] + cff2) * (zw_top - z_r[N - 1])
    if has_tide:
        P_top = P_top - g * xtra
    if has_pair:
        P_top = P_top + 100.0 / rho0 * (xtra - 1013.25)
    dP = HalfGRho * ((rho[1:N] + rho[0:N - 1]) * (z_r[1:N] - z_r[0:N - 1])
                     - OneFifth * ((dRm[1:N] - dRm[0:N - 1])
                                   * (z_r[1:N] - z_r[0:N - 1]
                                      - OneTwelfth * (dZm[1:N] + dZm[0:N - 1]))
                                   - (dZm[1:N] - dZm[0:N - 1])
                                   * (rho[1:N] - rho[0:N - 1]
                                      - OneTwelfth * (dRm[1:N] + dRm[0:N - 1]))))
    # P[k] = P_top + sum_{m>=k} dP[m]; static unroll matching
    # jnp.cumsum's sequential association exactly: the dP increments
    # accumulate among THEMSELVES top-down, P_top is added once per
    # level (P = P_top + csum, not a running total seeded with P_top)
    planes = [P_top]
    acc = None
    for k in range(N - 2, -1, -1):
        acc = dP[k] if acc is None else acc + dP[k]
        planes.append(P_top + acc)
    P = jnp.stack(planes[::-1], axis=0)

    # ---- xi direction (:228-300) --------------------------------------
    aux = (z_r - _im1(z_r)) * umask
    FC = (rho - _im1(rho)) * umask
    aux = _perx(aux, Li)
    FC = _perx(FC, Li)
    dZx = _perx(_harmonic(aux, _ip1(aux)), Li)
    dRx = _perx(_harmonic(FC, _ip1(FC)), Li)
    ru = 0.5 * (Hz + _im1(Hz)) * (
        _im1(P) - P - HalfGRho * (
            (rho + _im1(rho)) * (z_r - _im1(z_r))
            - OneFifth * ((dRx - _im1(dRx))
                          * (z_r - _im1(z_r)
                             - OneTwelfth * (dZx + _im1(dZx)))
                          - (dZx - _im1(dZx))
                          * (rho - _im1(rho)
                             - OneTwelfth * (dRx + _im1(dRx))))))

    # ---- eta direction (:306-377) --------------------------------------
    auy = (z_r - _jm1(z_r)) * vmask
    FE = (rho - _jm1(rho)) * vmask
    dZe = _harmonic(auy, _jp1(auy))
    dRe = _harmonic(FE, _jp1(FE))
    rv = 0.5 * (Hz + _jm1(Hz)) * (
        _jm1(P) - P - HalfGRho * (
            (rho + _jm1(rho)) * (z_r - _jm1(z_r))
            - OneFifth * ((dRe - _jm1(dRe))
                          * (z_r - _jm1(z_r)
                             - OneTwelfth * (dZe + _jm1(dZe)))
                          - (dZe - _jm1(dZe))
                          * (rho - _jm1(rho)
                             - OneTwelfth * (dRe + _jm1(dRe))))))

    # center rows; ring rows j = 0 / Mj-1 zeroed (full-rank mask: a
    # rank-promoting bool select can crash the Mosaic emitter)
    ctr = jax.lax.slice_in_dim
    ru_c = onu_ref[...][None] * ctr(ru, BJ, 2 * BJ, axis=1)
    rv_c = omv_ref[...][None] * ctr(rv, BJ, 2 * BJ, axis=1)
    grow3 = (jax.lax.broadcasted_iota(jnp.int32, ru_c.shape, 1)
             + pl.program_id(0) * BJ)
    ring = (grow3 == 0) | (grow3 >= Mj - 1)
    out_ru[...] = jnp.where(ring, 0.0, ru_c)
    out_rv[...] = jnp.where(ring, 0.0, rv_c)


def prsgrd32_pallas(cfg, grid, rho, z_r, z_w, Hz, eq_tide=None,
                    Pair=None, interpret: bool = False):
    """Drop-in for core/prsgrd.prsgrd32 on the gated config class."""
    N, Mj, Li = rho.shape
    dtype = rho.dtype
    BJ = 8
    gj = pl.cdiv(Mj, BJ)

    def s3(off):
        if off < 0:
            return pl.BlockSpec((N, BJ, Li),
                                lambda j: (0, jnp.maximum(j - 1, 0), 0),
                                memory_space=pltpu.VMEM)
        if off > 0:
            return pl.BlockSpec(
                (N, BJ, Li), lambda j: (0, jnp.minimum(j + 1, gj - 1), 0),
                memory_space=pltpu.VMEM)
        return pl.BlockSpec((N, BJ, Li), lambda j: (0, j, 0),
                            memory_space=pltpu.VMEM)

    def s2(off):
        if off < 0:
            return pl.BlockSpec((BJ, Li),
                                lambda j: (jnp.maximum(j - 1, 0), 0),
                                memory_space=pltpu.VMEM)
        if off > 0:
            return pl.BlockSpec(
                (BJ, Li), lambda j: (jnp.minimum(j + 1, gj - 1), 0),
                memory_space=pltpu.VMEM)
        return pl.BlockSpec((BJ, Li), lambda j: (j, 0),
                            memory_space=pltpu.VMEM)

    has_tide = eq_tide is not None
    has_pair = Pair is not None
    xtra = eq_tide if has_tide else (
        Pair if has_pair else jnp.zeros((Mj, Li), dtype))
    xtra = xtra.astype(dtype)
    zw_top = z_w[-1].astype(dtype)
    umask = grid.umask.astype(dtype)
    vmask = grid.vmask.astype(dtype)

    def trip3(x):
        return [x, x, x], [s3(0), s3(-1), s3(1)]

    def trip2(x):
        return [x, x, x], [s2(0), s2(-1), s2(1)]

    args, specs = [], []
    for x, t in ((rho, 3), (z_r, 3), (Hz, 3), (umask, 3), (vmask, 3),
                 (zw_top, 2), (xtra, 2)):
        # umask/vmask are 2-D; promote them to (N,...) triples only if
        # 3-D — 2-D fields ride the cheaper s2 specs and broadcast
        a, s = (trip3(x) if x.ndim == 3 else trip2(x))
        args += a
        specs += s
    args += [grid.on_u.astype(dtype), grid.om_v.astype(dtype)]
    specs += [s2(0), s2(0)]

    out_ru, out_rv = pl.pallas_call(
        functools.partial(_kernel, Li, Mj, BJ, float(cfg.g),
                          float(cfg.rho0),
                          float(cfg.sal_scalar or 0.0),
                          has_tide, has_pair),
        out_shape=(jax.ShapeDtypeStruct((N, Mj, Li), dtype),) * 2,
        grid=(gj,),
        in_specs=specs,
        out_specs=(s3(0), s3(0)),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=110 * 1024 * 1024),
    )(*args)
    return out_ru, out_rv


def use_pallas_prsgrd(cfg) -> bool:
    """EW-periodic, non-NS-periodic channel class with the default
    splines density-Jacobian scheme; everything else -> jnp."""
    from .kernel_gate import pallas_enabled
    if not pallas_enabled():
        return False
    if cfg.prsgrd != "djs":
        return False
    if not cfg.bc.ew_periodic or cfg.bc.ns_periodic:
        return False
    flag = os.environ.get("ROMS_TPU_PALLAS_PRSGRD", "")
    if flag == "0":
        return False
    if flag == "1":
        return True
    from .kernel_gate import dtype_supported
    if not dtype_supported(cfg.dtype):
        return False
    return jax.default_backend() == "tpu" and jax.device_count() == 1


def _interp():
    return os.environ.get("ROMS_TPU_PALLAS_PRSGRD_INTERPRET", "") == "1"
