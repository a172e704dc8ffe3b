"""Fused tracer-advection Pallas kernels (UP3 horizontal + C4 vertical).

One VMEM pass computes the complete advective update for ALL tracers:

  * predictor mode -> `t_half` of pre_step3d.F:260-700 (AB2 blend,
    UP3 horizontal + C4 vertical divergence, implied-thickness divide);
  * corrector mode -> the pre-diffusion `tn` of step3d_t.F:343-1205
    (t_part - dt*pmn*(hdiv + vdiv)).

The jnp path materializes each flux/gradient scratch array in HBM
(~40 field-passes per tracer); here the fluxes live only in VMEM.
Mechanics are the hardware-verified patterns of ops/pallas_hmix.py /
ops/pallas_rhs3d.py: lane shifts via `pltpu.roll` (wraps at the
logical lane width exactly like jnp.roll), row shifts via 3-block
halo reads stitched with sublane concats, vertical fluxes as plain
k-slicing over full-column blocks.

Grid iteration is (j-block, tracer) with the tracer axis innermost, so
the shared geometry blocks (Huon/Hvom/W/Hz) are fetched once per
j-block, not once per tracer.

Ring policy: output rows j = 0 / Mj-1 are ZEROED (the jnp path leaves
jnp.roll row-wrap values there) and the periodic ring lanes differ —
all dead data that boundary.bc_rho overwrites, proven bitwise by the
trajectory test in tests/test_pallas_tadv.py.  NS-periodic grids and
non-(UP3,C4) tracer schemes fall back to jnp.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SIXTH = 1.0 / 6.0
C2_, C3_ = 7.0 / 12.0, 1.0 / 12.0     # C4 vertical weights


def _iota_l(shape):
    return jax.lax.broadcasted_iota(jnp.int32, shape, len(shape) - 1)


def _roll(x, s):
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


def _zero_edge_lanes(x, Li):
    i = _iota_l(x.shape)
    return jnp.where((i == 0) | (i == Li - 1), 0.0, x)


class _Halo:
    """Row-shift views over a (center, minus, plus) block triple."""

    def __init__(self, c, m, p):
        self.c, self.m, self.p = c, m, p

    def sh(self, s):
        if s == 0:
            return self.c
        ax = self.c.ndim - 2
        if s < 0:
            k = -s
            m = jax.lax.slice_in_dim(self.m, self.m.shape[ax] - k,
                                     self.m.shape[ax], axis=ax)
            c = jax.lax.slice_in_dim(self.c, 0, self.c.shape[ax] - k,
                                     axis=ax)
            return jnp.concatenate([m, c], axis=ax)
        c = jax.lax.slice_in_dim(self.c, s, self.c.shape[ax], axis=ax)
        p = jax.lax.slice_in_dim(self.p, 0, s, axis=ax)
        return jnp.concatenate([c, p], axis=ax)


def _vert_c4_div(q, W):
    """C4 vertical flux divergence FC[1:]-FC[:-1] (column-local).
    q: (N, BJ, Li); W: (N+1, BJ, Li)."""
    N = q.shape[0]
    Fi = (C2_ * (q[1:N - 2] + q[2:N - 1])
          - C3_ * (q[0:N - 3] + q[3:N])) * W[2:N - 1]
    F1 = (0.5 * q[0] + C2_ * q[1] - C3_ * q[2]) * W[1]
    Fn = (0.5 * q[N - 1] + C2_ * q[N - 2] - C3_ * q[N - 3]) * W[N - 1]
    zeros = jnp.zeros_like(q[:1])
    FC = jnp.concatenate([zeros, F1[None], Fi, Fn[None], zeros], axis=0)
    return FC[1:] - FC[:-1]


def _up3_hdiv(Q, VM, umask, Huon, HV, ew, Li, grow, Mj):
    """UP3 horizontal flux divergence dx_p(FX)+dy_p(FE) for one tracer.
    Q/VM/HV are _Halo triples; umask/Huon center blocks."""
    q = Q.c
    Hvom = HV.c

    # -- FX (pre_step3d.F:300-345 / advection.hadv_flux upstream3) ----
    dqx = (q - _im1(q)) * umask
    curvx = _ip1(dqx) - dqx
    if ew:
        curvx = _perx(curvx, Li)
    else:
        curvx = _zero_edge_lanes(curvx, Li)
    FX = Huon * 0.5 * (q + _im1(q)) - SIXTH * (
        _im1(curvx) * jnp.maximum(Huon, 0.0)
        + curvx * jnp.minimum(Huon, 0.0))

    # -- FE at row alignments 0 and +1 --------------------------------
    def dqe_at(s):
        return (Q.sh(s) - Q.sh(s - 1)) * VM.sh(s)

    dqe = {s: dqe_at(s) for s in (-1, 0, 1, 2)}

    def curve_at(s):
        c = dqe[s + 1] - dqe[s]
        # non-NS-periodic: curve rows 0 and Mj-1 zeroed (the gradient
        # clamp of pre_step3d.F:415-427); NS-periodic falls back to jnp
        r = grow + s
        return jnp.where((r == 0) | (r == Mj - 1), 0.0, c)

    curve = {s: curve_at(s) for s in (-1, 0, 1)}

    def FE_at(s):
        hv = HV.sh(s)
        return hv * 0.5 * (Q.sh(s) + Q.sh(s - 1)) - SIXTH * (
            curve[s - 1] * jnp.maximum(hv, 0.0)
            + curve[s] * jnp.minimum(hv, 0.0))

    FE0 = FE_at(0)
    FE1 = FE_at(1)
    return (_ip1(FX) - FX) + (FE1 - FE0)


def _kernel(mode, Li, Mj, BJ, NT, ew, *refs):
    if mode == "predictor":
        (q_c, q_m, q_p, vm_c, vm_m, vm_p, hv_c, hv_m, hv_p,
         um_ref, hu_ref, w_ref, pmn_ref, aux_ref, hz_ref, sc_ref,
         out_ref) = refs
    else:
        (q_c, q_m, q_p, vm_c, vm_m, vm_p, hv_c, hv_m, hv_p,
         um_ref, hu_ref, w_ref, pmn_ref, aux_ref, sc_ref,
         out_ref) = refs
    grow3 = (jax.lax.broadcasted_iota(jnp.int32, q_c.shape, 1)
             + pl.program_id(0) * BJ)
    Q = _Halo(q_c[...], q_m[...], q_p[...])
    VM = _Halo(vm_c[...], vm_m[...], vm_p[...])
    HV = _Halo(hv_c[...], hv_m[...], hv_p[...])
    umask = um_ref[...]
    Huon = hu_ref[...]
    W = w_ref[...]
    pmn = pmn_ref[...][None]

    hdiv = _up3_hdiv(Q, VM, umask[None], Huon, HV, ew, Li, grow3, Mj)
    vdiv = _vert_c4_div(Q.c, W)

    if mode == "corrector":
        # tn = (t_part - dt*pmn*hdiv) - dt*pmn*vdiv, associated exactly
        # as step3d_t's sequential hadv_inc/vadv_inc adds so the fused
        # path stays BITWISE identical to the jnp path
        dt = sc_ref[0]
        out = (aux_ref[...] + (-dt) * pmn * hdiv) + (-dt) * pmn * vdiv
    else:
        # predictor: th = Hz*(cff1*q + cff2*q_prev) - cff*pmn*hdiv;
        # t_half = (th - cff*pmn*vdiv) / (Hz - cff*pmn*div(mass))
        cff, cff1, cff2 = sc_ref[0], sc_ref[1], sc_ref[2]
        Hz = hz_ref[...]
        q_prev = aux_ref[...]
        th = Hz * (cff1 * Q.c + cff2 * q_prev) - cff * pmn * hdiv
        mass_div = (_ip1(Huon) - Huon) + (HV.sh(1) - HV.c) \
            + (W[1:] - W[:-1])
        DC = 1.0 / (Hz - cff * pmn * mass_div)
        out = DC * (th - cff * pmn * vdiv)

    # full-rank mask: a rank-promoting bool select (ring[None]) crashes
    # the Mosaic emitter on ragged j-blocks under a 2-D grid
    ring = (grow3 == 0) | (grow3 >= Mj - 1)
    out_ref[...] = jnp.where(ring, 0.0, out)


def _call(mode, cfg, grid, q, aux, Huon, Hvom, W, Hz, scalars,
          interpret):
    """q, aux: (NT, N, Mj, Li); scalars: (3,) traced array.

    Tracer stacks are reshaped to (NT*N, Mj, Li) so every block is 3-D
    with the tracer selected by the leading block index — the 4-D
    (1, N, BJ, Li) layout crashed the Mosaic emitter on ragged last
    j-blocks (Mj % BJ != 0; BENCHMARK2's Mj=130)."""
    NT, N, Mj, Li = q.shape
    dtype = q.dtype
    ew = bool(cfg.bc.ew_periodic)
    BJ = 8
    gj = pl.cdiv(Mj, BJ)
    q = q.reshape(NT * N, Mj, Li)
    aux = aux.reshape(NT * N, Mj, Li)

    def s4(off):
        if off < 0:
            return pl.BlockSpec(
                (N, BJ, Li),
                lambda j, it: (it, jnp.maximum(j - 1, 0), 0),
                memory_space=pltpu.VMEM)
        if off > 0:
            return pl.BlockSpec(
                (N, BJ, Li),
                lambda j, it: (it, jnp.minimum(j + 1, gj - 1), 0),
                memory_space=pltpu.VMEM)
        return pl.BlockSpec((N, BJ, Li), lambda j, it: (it, j, 0),
                            memory_space=pltpu.VMEM)

    def s3(L, off):
        if off < 0:
            return pl.BlockSpec(
                (L, BJ, Li),
                lambda j, it: (0, jnp.maximum(j - 1, 0), 0),
                memory_space=pltpu.VMEM)
        if off > 0:
            return pl.BlockSpec(
                (L, BJ, Li),
                lambda j, it: (0, jnp.minimum(j + 1, gj - 1), 0),
                memory_space=pltpu.VMEM)
        return pl.BlockSpec((L, BJ, Li), lambda j, it: (0, j, 0),
                            memory_space=pltpu.VMEM)

    def s2(off):
        if off < 0:
            return pl.BlockSpec(
                (BJ, Li), lambda j, it: (jnp.maximum(j - 1, 0), 0),
                memory_space=pltpu.VMEM)
        if off > 0:
            return pl.BlockSpec(
                (BJ, Li),
                lambda j, it: (jnp.minimum(j + 1, gj - 1), 0),
                memory_space=pltpu.VMEM)
        return pl.BlockSpec((BJ, Li), lambda j, it: (j, 0),
                            memory_space=pltpu.VMEM)

    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    vmask = grid.vmask.astype(dtype)
    umask = grid.umask.astype(dtype)
    pmn = (grid.pm * grid.pn).astype(dtype)

    args = [q, q, q, vmask, vmask, vmask, Hvom, Hvom, Hvom,
            umask, Huon, W, pmn, aux]
    specs = [s4(0), s4(-1), s4(1), s2(0), s2(-1), s2(1),
             s3(N, 0), s3(N, -1), s3(N, 1),
             s2(0), s3(N, 0), s3(N + 1, 0), s2(0), s4(0)]
    if mode == "predictor":
        args.append(Hz)
        specs.append(s3(N, 0))
    args.append(scalars.astype(dtype))
    specs.append(smem)

    out = pl.pallas_call(
        functools.partial(_kernel, mode, Li, Mj, BJ, NT, ew),
        out_shape=jax.ShapeDtypeStruct((NT * N, Mj, Li), dtype),
        grid=(gj, NT),
        in_specs=specs,
        out_specs=s4(0),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=110 * 1024 * 1024),
    )(*args)
    return out.reshape(NT, N, Mj, Li)


def _interp():
    return os.environ.get("ROMS_TPU_PALLAS_TADV_INTERPRET", "") == "1"


def corrector_pallas(cfg, grid, t_half, t_part, Huon, Hvom, W, Hz):
    """Pre-diffusion tn for all tracers (step3d_t.F:343-1205 advection).
    t_half/t_part: (NT, N, Mj, Li)."""
    sc = jnp.array([cfg.dt, 0.0, 0.0])
    return _call("corrector", cfg, grid, t_half, t_part, Huon, Hvom, W,
                 None, sc, _interp())


def predictor_pallas(cfg, grid, t, t_prev, Huon, Hvom, W, Hz,
                     cff, cff1, cff2):
    """t_half for all tracers (pre_step3d.F:260-700), pre-bc_rho."""
    sc = jnp.stack([cff, cff1, cff2])
    return _call("predictor", cfg, grid, t, t_prev, Huon, Hvom, W, Hz,
                 sc, _interp())


def use_pallas_tadv(cfg, mode: str = "") -> bool:
    """Kernel covers UP3 horizontal + C4 vertical for EVERY tracer on
    non-NS-periodic grids only.  The env flag also accepts a mode name
    ("predictor"/"corrector") to enable just one site for A/B work."""
    from .kernel_gate import pallas_enabled
    if not pallas_enabled():
        return False
    from ..config import CENTERED4, UPSTREAM3
    if cfg.bc.ns_periodic:
        return False
    for itrc in range(cfg.NT):
        if cfg.tracer_hadv(itrc) != UPSTREAM3:
            return False
        if cfg.tracer_vadv(itrc) != CENTERED4:
            return False
    flag = os.environ.get("ROMS_TPU_PALLAS_TADV", "")
    if flag == "0":
        return False
    if flag == "1" or (flag and flag == mode):
        return True
    if flag:
        return False
    from .kernel_gate import dtype_supported
    if not dtype_supported(cfg.dtype):
        return False
    return jax.default_backend() == "tpu" and jax.device_count() == 1
