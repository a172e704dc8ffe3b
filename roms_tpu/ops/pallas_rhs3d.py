"""Fused 3D momentum right-hand side Pallas kernel.

Computes `core.rhs3d.rhs3d_momentum` — Coriolis, curvilinear metric
terms, UP3 horizontal advection and C4_SW vertical advection of
momentum (rhs3d.F:495-1830) — in ONE VMEM pass over (u, v, Hz, Huon,
Hvom, W, ru, rv) instead of the ~70 whole-array field-passes the jnp
path materializes.

Mechanics as in ops/pallas_hmix.py (hardware-verified on this image):
  * i-shifts: `pltpu.roll` over full-lane blocks, which wraps at the
    LOGICAL lane width exactly like `jnp.roll`;
  * j-shifts: 3-block halo reads (index maps j-1 / j / j+1, clamped)
    stitched with sublane concats — the +-2 stencil needs at most two
    rows from a neighbouring 8-row block;
  * vertical: full-column blocks, so the C4 interface fluxes are
    plain k-slicing.

Output ring rows (j = 0, Mj-1) are ZEROED instead of reproducing the
jnp path's non-physical jnp.roll row wrap; both are dead data (ru/rv
ring rows only reach pre-BC velocity rings, which bc_u/bc_v
overwrite) — verified by bitwise multi-step trajectory equality in
tests/test_pallas_rhs3d.py.  NS-periodic grids fall back to jnp.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

GADV = -0.25     # upstream-bias hyperdiffusion weight (rhs3d.F:329)


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


def _patch_x_edges(x, Li, c1, c2):
    """x[..., c1] = x[..., c1 +- 1 towards interior] etc: the UP3
    non-periodic gradient extensions (rhs3d.F:732-746).  c1/c2 are
    (lane, source-lane) pairs."""
    i = _iota_l(x.shape)
    for lane, src in (c1, c2):
        x = jnp.where(i == lane % Li, _roll(x, lane - src), x)
    return x


class _Halo:
    """Row-shift views over a (center, minus, plus) block triple."""

    def __init__(self, c, m, p):
        self.c, self.m, self.p = c, m, p

    def sh(self, s):
        """Value at row j+s aligned at row j (|s| <= block rows)."""
        if s == 0:
            return self.c
        if s < 0:
            k = -s
            return jnp.concatenate(
                [self.m[:, -k:, :], self.c[:, :-k, :]], axis=1)
        return jnp.concatenate(
            [self.c[:, s:, :], self.p[:, :s, :]], axis=1)


def _lap_x(x):
    return _im1(x) - 2.0 * x + _ip1(x)


def _hz_jm1(c, m):
    """Hz at row j-1 (Hz only ever shifts by -1, so no plus-view)."""
    return jnp.concatenate([m[:, -1:, :], c[:, :-1, :]], axis=1)


def _kernel(Li, Mj, BJ, ew, uv_cor, curv, uv_adv, N, k0, k1, ka,
            u_c, u_m, u_p, v_c, v_m, v_p, hz_c, hz_m,
            hu_c, hu_m, hu_p, hv_c, hv_m, hv_p, w_c, w_m, w_p,
            ru_ref, rv_ref, fomn_ref, fomn_jm1_ref,
            dndx_ref, dndx_jm1_ref, dmde_ref, dmde_jm1_ref,
            out_u, out_v):
    # vertical-chunk view (the k-split that keeps BENCHMARK3 lane
    # widths inside VMEM): u/v/W arrive with +-2 halo depth rows
    # [ka, ...); Hz/Huon/Hvom/ru/rv with the chunk's cell rows
    # [k0, k1).  Horizontal physics runs on the KB cell rows; the C4
    # vertical flux reads the full halo depth.
    KB = k1 - k0
    o0 = k0 - ka

    def ctrk(x):
        return jax.lax.slice_in_dim(x, o0, o0 + KB, axis=0)

    ufull = u_c[...]
    vfull = v_c[...]
    U = _Halo(ctrk(u_c[...]), ctrk(u_m[...]), ctrk(u_p[...]))
    V = _Halo(ctrk(v_c[...]), ctrk(v_m[...]), ctrk(v_p[...]))
    HU = _Halo(hu_c[...], hu_m[...], hu_p[...])
    HV = _Halo(hv_c[...], hv_m[...], hv_p[...])
    u = U.c
    v = V.c
    Hz = hz_c[...]
    Huon = HU.c
    Hvom = HV.c
    ru = ru_ref[...]
    rv = rv_ref[...]
    fomn = fomn_ref[...][None]
    dndx = dndx_ref[...][None]
    dmde = dmde_ref[...][None]
    # j-1-aligned copies of the 2D metric fields: the VFe(j-1)
    # recomputations below need the row-(j-1) metric values, which
    # vary with j (beta-plane fomn, curvilinear dndx/dmde)
    fomn_m = fomn_jm1_ref[...][None]
    dndx_m = dndx_jm1_ref[...][None]
    dmde_m = dmde_jm1_ref[...][None]

    # --- Coriolis (rhs3d.F:502-527) ---
    if uv_cor:
        cff = 0.5 * Hz * fomn
        UFx = cff * (v + V.sh(1))
        VFe = cff * (u + _ip1(u))
        if ew:
            UFx = _perx(UFx, Li)
            VFe = _perx(VFe, Li)
        ru = ru + 0.5 * (UFx + _im1(UFx))
        # VFe needs its j-1 row: recompute at the m alignment
        cff_m = 0.5 * _hz_jm1(hz_c[...], hz_m[...]) * fomn_m
        VFe_m = cff_m * (U.sh(-1) + _ip1(U.sh(-1)))
        if ew:
            VFe_m = _perx(VFe_m, Li)
        rv = rv - 0.5 * (VFe + VFe_m)

    # --- curvilinear metric terms (rhs3d.F:577-660) ---
    if curv:
        c1 = 0.5 * (v + V.sh(1))
        c2 = 0.5 * (u + _ip1(u))
        cff = Hz * (c1 * dndx - c2 * dmde)
        UFx = cff * c1
        VFe = cff * c2
        if ew:
            UFx = _perx(UFx, Li)
            VFe = _perx(VFe, Li)
        ru = ru + 0.5 * (UFx + _im1(UFx))
        Hzm = _hz_jm1(hz_c[...], hz_m[...])
        um = U.sh(-1)
        c1m = 0.5 * (V.sh(-1) + v)
        c2m = 0.5 * (um + _ip1(um))
        VFe_m = Hzm * (c1m * dndx_m - c2m * dmde_m) * c2m
        if ew:
            VFe_m = _perx(VFe_m, Li)
        rv = rv - 0.5 * (VFe + VFe_m)

    if uv_adv:
        # --- UP3 horizontal advection (rhs3d.F:668-1010) ---
        def uxx_at(s):
            x = _lap_x(U.sh(s))
            h = _lap_x(HU.sh(s))
            if ew:
                x, h = _perx(x, Li), _perx(h, Li)
            else:
                x = _patch_x_edges(x, Li, (1, 2), (-1, -2))
                h = _patch_x_edges(h, Li, (1, 2), (-1, -2))
            return x, h

        uxx, Huxx = uxx_at(0)
        UFx = 0.25 * (jnp.where(u + _ip1(u) > 0.0,
                                uxx, _ip1(uxx)) * GADV
                      + (u + _ip1(u))) * \
            ((Huon + _ip1(Huon)) + GADV * 0.5 * (Huxx + _ip1(Huxx)))
        if ew:
            UFx = _perx(UFx, Li)

        def uee_at(s):
            x = U.sh(s - 1) - 2.0 * U.sh(s) + U.sh(s + 1)
            return x

        # uee with non-NS-periodic row patches uee(0)<-uee(1),
        # uee(Mj-1)<-uee(Mj-2): build patched uee at alignments 0, -1
        grow = (jax.lax.broadcasted_iota(jnp.int32, u.shape, 1)
                + pl.program_id(0) * BJ)
        uee_c = uee_at(0)
        uee_p1 = uee_at(1)
        uee_m1 = uee_at(-1)
        uee_m2 = uee_at(-2)
        # patched value at row r: row 0 takes row 1, row Mj-1 takes Mj-2
        uee = jnp.where(grow == 0, uee_p1,
                        jnp.where(grow == Mj - 1, uee_m1, uee_c))
        ueem = jnp.where(grow - 1 == 0, uee_c,
                         jnp.where(grow - 1 == Mj - 1, uee_m2, uee_m1))
        Hvxx = _lap_x(Hvom)
        Hvxx_m = _lap_x(HV.sh(-1))
        if ew:
            Hvxx, Hvxx_m = _perx(Hvxx, Li), _perx(Hvxx_m, Li)
        cff2 = Hvom + _im1(Hvom)
        curv_u = jnp.where(cff2 > 0.0, ueem, uee)
        UFe = 0.25 * (u + U.sh(-1) + GADV * curv_u) * \
            (cff2 + GADV * 0.5 * (Hvxx + _im1(Hvxx)))
        # UFe at alignment +1 for the divergence
        cff2p = HV.sh(1) + _im1(HV.sh(1))
        uee_p2 = uee_at(2)
        ueep = jnp.where(grow + 1 == 0, uee_p2,
                         jnp.where(grow + 1 == Mj - 1, uee_c, uee_p1))
        curv_up = jnp.where(cff2p > 0.0, uee, ueep)
        Hvxx_p = _lap_x(HV.sh(1))
        if ew:
            Hvxx_p = _perx(Hvxx_p, Li)
        UFe_p = 0.25 * (U.sh(1) + u + GADV * curv_up) * \
            (cff2p + GADV * 0.5 * (Hvxx_p + _im1(Hvxx_p)))

        def vxx_at(s):
            x = _lap_x(V.sh(s))
            if ew:
                x = _perx(x, Li)
            else:
                x = _patch_x_edges(x, Li, (0, 1), (-1, -2))
            return x

        vxx = vxx_at(0)
        Huee_c = HU.sh(-1) - 2.0 * Huon + HU.sh(1)
        cff2 = Huon + HU.sh(-1)
        curv_v = jnp.where(cff2 > 0.0, _im1(vxx), vxx)
        VFx = 0.25 * (v + _im1(v) + GADV * curv_v) * \
            (cff2 + GADV * 0.5 * (Huee_c + HU.sh(-2)
                                  - 2.0 * HU.sh(-1) + Huon))
        # NOTE: st.lap_y(Huon) at alignment -1 is
        #   HU.sh(-2) - 2*HU.sh(-1) + HU.sh(0)
        if ew:
            VFx = _perx(VFx, Li)

        def vee_hvee_at(s):
            x = V.sh(s - 1) - 2.0 * V.sh(s) + V.sh(s + 1)
            h = HV.sh(s - 1) - 2.0 * HV.sh(s) + HV.sh(s + 1)
            return x, h

        vee_c, Hvee_c = vee_hvee_at(0)
        vee_p1, Hvee_p1 = vee_hvee_at(1)
        vee_p2, Hvee_p2 = vee_hvee_at(2)
        vee_m1, Hvee_m1 = vee_hvee_at(-1)

        def patch_v(row_off, at_c, at_p, at_m):
            """vee patches: row 1 takes row 2, row Mj-1 takes Mj-2."""
            r = grow + row_off
            return jnp.where(r == 1, at_p,
                             jnp.where(r == Mj - 1, at_m, at_c))

        vee = patch_v(0, vee_c, vee_p1, vee_m1)
        Hvee = patch_v(0, Hvee_c, Hvee_p1, Hvee_m1)
        veep = patch_v(1, vee_p1, vee_p2, vee_c)
        Hveep = patch_v(1, Hvee_p1, Hvee_p2, Hvee_c)
        cff1 = v + V.sh(1)
        curv_ve = jnp.where(cff1 > 0.0, vee, veep)
        VFe = 0.25 * (cff1 + GADV * curv_ve) * \
            ((Hvom + HV.sh(1)) + GADV * 0.5 * (Hvee + Hveep))
        # VFe at alignment -1 for the divergence
        veem2, Hveem2 = vee_hvee_at(-2)
        veem = patch_v(-1, vee_m1, vee_c, veem2)
        Hveem = patch_v(-1, Hvee_m1, Hvee_c, Hveem2)
        cff1m = V.sh(-1) + v
        curv_vem = jnp.where(cff1m > 0.0, veem, vee)
        VFe_m = 0.25 * (cff1m + GADV * curv_vem) * \
            ((HV.sh(-1) + Hvom) + GADV * 0.5 * (Hveem + Hvee))

        ru = ru - (UFx - _im1(UFx)) - (UFe_p - UFe)
        rv = rv - (_ip1(VFx) - VFx) - (VFe - VFe_m)

        # --- C4_SW vertical advection (rhs3d.F:1133-1168) ---
        # reference applies periodic_x to W BEFORE the averages
        # (rhs3d jnp path), so every row alignment needs the lane-ring
        # refresh when EW-periodic
        c1, c2 = 9.0 / 16.0, 1.0 / 16.0
        W = _Halo(w_c[...], w_m[...], w_p[...])
        Wc, Wm, Wp, Wm2 = W.c, W.sh(-1), W.sh(1), W.sh(-2)
        if ew:
            Wc, Wm, Wp, Wm2 = (_perx(Wc, Li), _perx(Wm, Li),
                               _perx(Wp, Li), _perx(Wm2, Li))
        # reach-2 arm: re-wrap the intermediate shift on the periodic
        # lane ring (core.rhs3d.vadv_uv staged re-wrap — a plain
        # roll-by-2 is off by two columns at the torus seam)
        Wmx = _im1(Wc)
        if ew:
            Wmx = _perx(Wmx, Li)
        Wu = c1 * (Wc + Wmx) - c2 * (_ip1(Wc) + _im1(Wmx))
        Wv = c1 * (Wc + Wm) - c2 * (Wp + Wm2)

        def flux(q, Wq):
            # chunk-aware interface-flux assembly over global
            # interfaces kk = k0..k1 (Wq row li = kk-k0; q row g-ka).
            # Positive static indices only: negative int indexing
            # lowers to dynamic_slice, unimplemented in Mosaic.
            parts = []
            if k0 == 0:
                parts.append(jnp.zeros_like(q[:1]))
            if k0 <= 1 <= k1:
                F1 = (c1 * (q[0] + q[1]) - c2 * (q[0] + q[2])) \
                    * Wq[1 - k0]
                parts.append(F1[None])
            lo, hi = max(k0, 2), min(k1, N - 2)
            if hi >= lo:
                Fi = (c1 * (q[lo - 1 - ka:hi - ka]
                            + q[lo - ka:hi + 1 - ka])
                      - c2 * (q[lo - 2 - ka:hi - 1 - ka]
                              + q[lo + 1 - ka:hi + 2 - ka])) \
                    * Wq[lo - k0:hi + 1 - k0]
                parts.append(Fi)
            if k0 <= N - 1 <= k1:
                Fn = (c1 * (q[N - 2 - ka] + q[N - 1 - ka])
                      - c2 * (q[N - 3 - ka] + q[N - 1 - ka])) \
                    * Wq[N - 1 - k0]
                parts.append(Fn[None])
            if k1 == N:
                parts.append(jnp.zeros_like(q[:1]))
            return jnp.concatenate(parts, axis=0)

        FCu = flux(ufull, Wu)
        FCv = flux(vfull, Wv)
        ru = ru - (FCu[1:] - FCu[:-1])
        rv = rv - (FCv[1:] - FCv[:-1])

    # full-rank mask (a rank-promoting bool select can crash the
    # Mosaic emitter on ragged j-blocks; see ops/pallas_tadv.py)
    grow3 = (jax.lax.broadcasted_iota(jnp.int32, u.shape, 1)
             + pl.program_id(0) * BJ)
    ring = (grow3 == 0) | (grow3 >= Mj - 1)
    out_u[...] = jnp.where(ring, 0.0, ru)
    out_v[...] = jnp.where(ring, 0.0, rv)


def rhs3d_momentum_pallas(cfg, grid, u, v, Hz, Huon, Hvom, W, ru, rv,
                          interpret: bool = False):
    """Drop-in for core.rhs3d.rhs3d_momentum (output ring rows j=0 and
    Mj-1 zeroed; see module docstring)."""
    N, Mj, Li = u.shape
    dtype = u.dtype
    ew = bool(cfg.bc.ew_periodic)

    # BJ is pinned at 8: TPU blocks need sublane counts divisible by 8,
    # and the halo views only reach +-2 rows, so 8 is already minimal.
    # VMEM scaling comes from the k-chunk split instead: at BENCHMARK3
    # lane width (Li=2050) the full-depth windows (~90 MB double-
    # buffered) exceed VMEM, so the column is processed in nk chunks of
    # ~N/nk cells with a +-2-row halo on u/v (the C4 vertical stencil).
    BJ = 8
    gj = pl.cdiv(Mj, BJ)

    def est_bytes(kb):
        rows = 6 * (kb + 4) + 2 * kb + 6 * kb + 3 * (kb + 1) + 4 * kb
        return rows * BJ * Li * 4 * 2
    nk = int(os.environ.get("ROMS_TPU_PALLAS_RHS3D_NK", "0"))
    if nk < 1:
        # 45 MB window budget: the estimator counts only the block
        # windows; lane padding (Li -> next 128 multiple), outputs and
        # compute scratch roughly double true scoped VMEM (BENCHMARK3
        # measured 157 MB against an 86 MB estimate at nk=1)
        nk = 1
        while est_bytes(pl.cdiv(N, nk)) > 45 * 1024 * 1024 and nk < N:
            nk += 1
    KB = pl.cdiv(N, nk)

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

    def trip(x, L):
        return [(x, s3(L, 0)), (x, s3(L, -1)), (x, s3(L, 1))]

    def slk(x, lo, hi):
        return jax.lax.slice_in_dim(x, lo, hi, axis=0)

    outs_u, outs_v = [], []
    for c in range(nk):
        k0 = c * KB
        k1 = min(N, k0 + KB)
        ka = max(k0 - 2, 0)
        kb = min(k1 + 2, N)
        uh, vh = slk(u, ka, kb), slk(v, ka, kb)
        pairs = (trip(uh, kb - ka) + trip(vh, kb - ka)
                 + [(slk(Hz, k0, k1), s3(k1 - k0, 0)),
                    (slk(Hz, k0, k1), s3(k1 - k0, -1))]
                 + trip(slk(Huon, k0, k1), k1 - k0)
                 + trip(slk(Hvom, k0, k1), k1 - k0)
                 + trip(slk(W, k0, k1 + 1), k1 - k0 + 1)
                 + [(slk(ru, k0, k1), s3(k1 - k0, 0)),
                    (slk(rv, k0, k1), s3(k1 - k0, 0))])
        for f2 in (grid.fomn, grid.dndx, grid.dmde):
            f2 = f2.astype(dtype)
            pairs.append((f2, s2))
            pairs.append((jnp.roll(f2, 1, axis=0), s2))
        args = [p[0] for p in pairs]
        specs = [p[1] for p in pairs]

        ou, ov = pl.pallas_call(
            functools.partial(_kernel, Li, Mj, BJ, ew,
                              bool(cfg.uv_cor),
                              bool(cfg.curvgrid and cfg.uv_adv),
                              bool(cfg.uv_adv), N, k0, k1, ka),
            out_shape=(jax.ShapeDtypeStruct((k1 - k0, Mj, Li),
                                            dtype),) * 2,
            grid=(gj,),
            in_specs=specs,
            out_specs=(s3(k1 - k0, 0), s3(k1 - k0, 0)),
            interpret=interpret,
            compiler_params=None if interpret else pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
                vmem_limit_bytes=110 * 1024 * 1024),
        )(*args)
        outs_u.append(ou)
        outs_v.append(ov)
    if nk == 1:
        return outs_u[0], outs_v[0]
    return (jnp.concatenate(outs_u, axis=0),
            jnp.concatenate(outs_v, axis=0))


def use_pallas_rhs3d(cfg=None) -> bool:
    from .kernel_gate import pallas_enabled
    if not pallas_enabled():
        return False
    flag = os.environ.get("ROMS_TPU_PALLAS_RHS3D", "")
    if flag == "0":
        return False
    if flag == "1":
        return True
    from .kernel_gate import dtype_supported
    if cfg is not None and not dtype_supported(cfg.dtype):
        return False
    return jax.default_backend() == "tpu" and jax.device_count() == 1
