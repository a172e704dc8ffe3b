"""Fused rotated (geopotential) tracer-diffusion Pallas kernel.

The triad operator of t3dmix2_geo.h (`core.hmix._rot_div_geo`) is a
first-order stencil in i/j with +-1 vertical coupling.  The
whole-array jnp path materializes ~95 field-passes per tracer at
BENCHMARK2 size (XLA cost analysis; measured AT its own bandwidth
roofline — the problem is traffic, not schedule).  One VMEM kernel
rebuilds the COMPLETE divergence for ALL tracers in a single pass:

  * i-shifts are in-kernel `pltpu.roll`s over full-lane blocks;
    hardware-verified (this image's Mosaic) to wrap at the LOGICAL
    lane width exactly like `jnp.roll`, including lane-unaligned Li,
    so negative shifts are just `s % Li`.
  * j-shifts use a 3-block halo read: each of q/z/Hz is passed three
    times with index maps j-1 / j / j+1 (clamped), and the j-1/j+1
    row alignments are stitched with one-row sublane concats
    (hardware-verified).  No shifted copies are ever materialized in
    HBM.
  * all NT tracers share one kernel launch, so the z/Hz geometry and
    its vertical gradients are read and differentiated once.

HBM traffic: 3*(NT+2) block reads + NT writes ~ 14 field-passes for
NT=2 vs ~95*NT for the jnp path.

Wrap semantics: the jnp path's `jnp.roll` wraps rows 0 and Mj-1
through the opposite edge; those two output rows are boundary-ring
rows that every consumer overwrites (t3dbc / `_lap_bc` before the
second biharmonic pass), so this kernel ZEROES them instead of
reproducing the wrap.  Interior rows match the jnp path bitwise.
NS-periodic grids fall back to the jnp path (the row wrap would be
physical there); the reference BENCHMARK family is EW-periodic /
NS-closed.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import stencil as st


def _iota_l(shape):
    return jax.lax.broadcasted_iota(jnp.int32, shape, len(shape) - 1)


def _roll(x, s):
    """jnp.roll-equivalent lane roll (pltpu.roll wraps at the logical
    lane width; negative shifts normalized to positive)."""
    return pltpu.roll(x, s % x.shape[-1], axis=x.ndim - 1)


def _im1(x):
    return _roll(x, 1)


def _ip1(x):
    return _roll(x, -1)


def _perx(x, Li):
    """st.periodic_x ring refresh: lane 0 <- Li-2, lane Li-1 <- 1."""
    i = _iota_l(x.shape)
    x = jnp.where(i == 0, _roll(x, -(Li - 2)), x)
    return jnp.where(i == Li - 1, _roll(x, Li - 2), x)


def _jm1_rows(c, m):
    """Rows shifted +1 (value at j-1): prev block's last row enters."""
    return jnp.concatenate([m[:, -1:, :], c[:, :-1, :]], axis=1)


def _jp1_rows(c, p):
    return jnp.concatenate([c[:, 1:, :], p[:, :1, :]], axis=1)


def _vert_grad(q, z):
    """Interface vertical gradient dT/dz with zeroed end interfaces."""
    g = (q[1:] - q[:-1]) / (z[1:] - z[:-1])
    zz = jnp.zeros_like(g[:1])
    return jnp.concatenate([zz, g, zz], axis=0)


def _kernel_geo(Li, NT, N, Mj, BJ, ew,
                q_c_ref, q_m_ref, q_p_ref,
                z_c_ref, z_m_ref, z_p_ref,
                h_c_ref, h_m_ref, h_p_ref,
                pmu_ref, pmn_ref, pnv_ref, pnvp_ref,
                cffu_ref, cffv_ref, cffvp_ref, c2_ref,
                out_ref):
    z = z_c_ref[...]
    zm = _jm1_rows(z_c_ref[...], z_m_ref[...])
    zp = _jp1_rows(z_c_ref[...], z_p_ref[...])
    Hz = h_c_ref[...]
    Hzm = _jm1_rows(h_c_ref[...], h_m_ref[...])
    Hzp = _jp1_rows(h_c_ref[...], h_p_ref[...])

    pm_u = pmu_ref[...][None]
    pmn = pmn_ref[...][None]
    pn_v = pnv_ref[...][None]
    pn_vp = pnvp_ref[...][None]

    dZdx = pm_u * (z - _im1(z))
    if ew:
        dZdx = _perx(dZdx, Li)
    dZde = pn_v * (z - zm)
    dZde_p = pn_vp * (zp - z)
    mnZ = jnp.minimum(dZdx, 0.0)
    mxZ = jnp.maximum(dZdx, 0.0)
    mnZe = jnp.minimum(dZde, 0.0)
    mxZe = jnp.maximum(dZde, 0.0)
    dZdx_p1 = _ip1(dZdx)
    c1z = jnp.minimum(dZdx[:-1], 0.0)
    c2z = jnp.minimum(dZdx_p1[1:], 0.0)
    c3z = jnp.maximum(dZdx[1:], 0.0)
    c4z = jnp.maximum(dZdx_p1[:-1], 0.0)
    e1z = jnp.minimum(dZde[:-1], 0.0)
    e2z = jnp.minimum(dZde_p[1:], 0.0)
    e3z = jnp.maximum(dZde[1:], 0.0)
    e4z = jnp.maximum(dZde_p[:-1], 0.0)

    # rows 0 / Mj-1 are ring rows whose jnp value is a non-physical
    # roll wrap; zero them (consumers overwrite them anyway)
    grow = (jax.lax.broadcasted_iota(jnp.int32, (BJ, Li), 0)
            + pl.program_id(0) * BJ)
    ring = (grow == 0) | (grow >= Mj - 1)

    for tr in range(NT):
        sl = slice(tr * N, (tr + 1) * N)
        q = q_c_ref[sl]
        qm = _jm1_rows(q_c_ref[sl], q_m_ref[sl])
        qp = _jp1_rows(q_c_ref[sl], q_p_ref[sl])
        cff_u = cffu_ref[tr][None]
        cff_v = cffv_ref[tr][None]
        cff_vp = cffvp_ref[tr][None]
        c2d = c2_ref[tr][None]

        dTdx = pm_u * (q - _im1(q))
        if ew:
            dTdx = _perx(dTdx, Li)
        dTde = pn_v * (q - qm)
        dTde_p = pn_vp * (qp - q)
        dTdz = _vert_grad(q, z)
        dTdzm = _jm1_rows(dTdz, _vert_grad(q_m_ref[sl], z_m_ref[...]))
        dTdzp = _jp1_rows(dTdz, _vert_grad(q_p_ref[sl], z_p_ref[...]))
        dTdz_im1 = _im1(dTdz)

        FX = cff_u * (Hz + _im1(Hz)) * (
            dTdx - 0.5 * (mnZ * (dTdz_im1[:-1] + dTdz[1:])
                          + mxZ * (dTdz_im1[1:] + dTdz[:-1])))
        if ew:
            FX = _perx(FX, Li)
        FE = cff_v * (Hz + Hzm) * (
            dTde - 0.5 * (mnZe * (dTdzm[:-1] + dTdz[1:])
                          + mxZe * (dTdzm[1:] + dTdz[:-1])))
        # FE one row up (the st.jm1(dTdz) of row j+1 is row j's dTdz)
        mnZe_p = jnp.minimum(dZde_p, 0.0)
        mxZe_p = jnp.maximum(dZde_p, 0.0)
        FE_p = cff_vp * (Hzp + Hz) * (
            dTde_p - 0.5 * (mnZe_p * (dTdz[:-1] + dTdzp[1:])
                            + mxZe_p * (dTdz[1:] + dTdzp[:-1])))

        dTz = dTdz[1:-1]
        dTdx_p1 = _ip1(dTdx)
        FS = c2d * (c1z * (c1z * dTz - dTdx[:-1])
                    + c2z * (c2z * dTz - dTdx_p1[1:])
                    + c3z * (c3z * dTz - dTdx[1:])
                    + c4z * (c4z * dTz - dTdx_p1[:-1])
                    + e1z * (e1z * dTz - dTde[:-1])
                    + e2z * (e2z * dTz - dTde_p[1:])
                    + e3z * (e3z * dTz - dTde[1:])
                    + e4z * (e4z * dTz - dTde_p[:-1]))
        zz = jnp.zeros_like(FS[:1])
        dFS = jnp.concatenate([zz, FS, zz], axis=0)
        div = pmn * ((_ip1(FX) - FX) + (FE_p - FE)) \
            + (dFS[1:] - dFS[:-1])
        out_ref[sl] = jnp.where(ring[None], 0.0, div)


def rot_div_geo_batched(cfg, grid, qs, d2s, Hz, z_r,
                        interpret: bool = False):
    """All-tracer rotated triad divergence (`core.hmix._rot_div_geo`
    for every tracer in one launch).  qs: (NT, N, Mj, Li); d2s:
    (NT, Mj, Li) per-tracer harmonic coefficients.  Output ring rows
    (j = 0, Mj-1) are zeroed — see module docstring."""
    NT, N, Mj, Li = qs.shape
    dtype = qs.dtype
    ew = bool(cfg.bc.ew_periodic)

    pm_u = (0.5 * (grid.pm + st.im1(grid.pm)) * grid.umask).astype(dtype)
    pmn = (grid.pm * grid.pn).astype(dtype)
    pn_v = (0.5 * (grid.pn + st.jm1(grid.pn)) * grid.vmask).astype(dtype)
    pn_vp = st.jp1(pn_v)
    cff_u = jnp.stack([0.25 * (d2 + st.im1(d2)) * grid.on_u
                       for d2 in d2s]).astype(dtype)
    cff_v = jnp.stack([0.25 * (d2 + st.jm1(d2)) * grid.om_v
                       for d2 in d2s]).astype(dtype)
    cff_vp = st.jp1(cff_v)
    c2d = jnp.stack([0.5 * d2 * jnp.ones_like(grid.pm)
                     for d2 in d2s]).astype(dtype)

    BJ = 8
    gj = pl.cdiv(Mj, BJ)

    def s3(L, off):
        if off < 0:
            return pl.BlockSpec((L, BJ, Li),
                                lambda j: (0, jnp.maximum(j - 1, 0), 0),
                                memory_space=pltpu.VMEM)
        if off > 0:
            return pl.BlockSpec(
                (L, BJ, Li),
                lambda j: (0, jnp.minimum(j + 1, gj - 1), 0),
                memory_space=pltpu.VMEM)
        return pl.BlockSpec((L, BJ, Li), lambda j: (0, j, 0),
                            memory_space=pltpu.VMEM)

    s2 = pl.BlockSpec((BJ, Li), lambda j: (j, 0),
                      memory_space=pltpu.VMEM)
    s2t = pl.BlockSpec((NT, BJ, Li), lambda j: (0, j, 0),
                       memory_space=pltpu.VMEM)

    qflat = qs.reshape(NT * N, Mj, Li)
    # Full-lane blocks need more scoped VMEM than Mosaic's 16 MB
    # default for the roll/halo intermediates — raise the limit
    # (v5e has 128 MB physical VMEM).
    out = pl.pallas_call(
        functools.partial(_kernel_geo, Li, NT, N, Mj, BJ, ew),
        out_shape=jax.ShapeDtypeStruct((NT * N, Mj, Li), dtype),
        grid=(gj,),
        in_specs=[s3(NT * N, -1 if k == 1 else (1 if k == 2 else 0))
                  for k in (0, 1, 2)]
        + [s3(N, 0), s3(N, -1), s3(N, 1)]
        + [s3(N, 0), s3(N, -1), s3(N, 1)]
        + [s2, s2, s2, s2, s2t, s2t, s2t, s2t],
        out_specs=s3(NT * N, 0),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=110 * 1024 * 1024),
    )(qflat, qflat, qflat, z_r, z_r, z_r, Hz, Hz, Hz,
      pm_u, pmn, pn_v, pn_vp, cff_u, cff_v, cff_vp, c2d)
    return out.reshape(NT, N, Mj, Li)


def rot_div_geo_pallas(cfg, grid, q, d2, Hz, z_r,
                       interpret: bool = False):
    """Single-tracer wrapper (used by tests); production dispatch
    goes through `rot_div_geo_batched`."""
    return rot_div_geo_batched(cfg, grid, q[None],
                               jnp.asarray(d2)[None]
                               * jnp.ones_like(grid.pm),
                               Hz, z_r, interpret=interpret)[0]


def use_pallas_hmix(cfg=None) -> bool:
    """On for single-chip TPU (see ops.pallas_kpp.use_pallas_kpp);
    pallas_call is GSPMD-opaque, so multi-device stays on jnp."""
    from .kernel_gate import pallas_enabled
    if not pallas_enabled():
        return False
    flag = os.environ.get("ROMS_TPU_PALLAS_HMIX", "")
    if flag == "0":
        return False
    if flag == "1":
        return True
    from .kernel_gate import dtype_supported
    if cfg is not None and not dtype_supported(cfg.dtype):
        return False
    return jax.default_backend() == "tpu" and jax.device_count() == 1
