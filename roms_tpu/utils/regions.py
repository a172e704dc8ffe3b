"""Per-phase region timing report (timers.F analog).

The reference brackets every kernel with wclock_on/off over 88 named
regions and prints a reduced table at finalize
(ROMS/Utility/timers.F:249-313, mod_strings.F:138-250).  Under XLA the
step compiles into one fused program, so region timing is measured by
jitting each phase in isolation over the real model arrays — the same
physics, the same shapes, separately compiled.  The table reports each
region's isolated time and its share of the measured full step
(regions overlap-free; the sum can exceed the step because isolation
pays fusion boundaries the full step amortizes).

Usage:
    from roms_tpu.utils.regions import region_report
    print(region_report(model, state))
"""

from __future__ import annotations

import time
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

HBM_GBPS = 819.0     # v5e


def _timeit(fn, args, reps, warmup=3):
    out = None
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def region_phases(model, state) -> Dict[str, Tuple]:
    """Build the (jitted phase fn, args) table for a Model + State.

    Regions mirror the reference profile regions (mod_strings.F):
    2D kernel (09), 3D RHS (21), predictor (22), pressure gradient
    (23), vertical closures (18-20), correctors (34-35)...
    """
    from ..core import (lmd as lmd_mod, omega as omega_mod, prsgrd,
                        rhs3d, set_vbc)
    from ..core.pre_step3d import pre_step3d
    from ..core.rho_eos import rho_eos
    from ..core.step3d_t import step3d_t
    from ..core.step3d_uv import step3d_uv
    from ..grid.depth import set_depth, set_massflux
    from ..ops import stencil as st

    cfg = model.cfg
    grid = model.grid

    def prep_fluxes(state):
        Huon, Hvom = set_massflux(grid, state.u, state.v, state.Hz)
        if cfg.bc.ew_periodic:
            Huon, Hvom = st.periodic_x(Huon), st.periodic_x(Hvom)
        if cfg.bc.ns_periodic:
            Huon, Hvom = st.periodic_y(Huon), st.periodic_y(Hvom)
        return Huon, Hvom

    Huon, Hvom = jax.jit(prep_fluxes)(state)
    rho, pden, rhoA, rhoS, bvf = jax.jit(
        lambda s: rho_eos(cfg, s.t, s.z_r, s.Hz, s.z_w))(state)
    if model._forcing_takes_state:
        sss = state.t[1][-1] if cfg.NT > 1 else jnp.zeros_like(rho[-1])
        forcing = model.forcing_fn(state.time, state.t[0][-1], sss,
                                   rho[-1])
    else:
        forcing = model.forcing_fn(state.time)
    bustr, bvstr = jax.jit(
        lambda s: set_vbc.bottom_drag(cfg, grid, s.u, s.v, s.Hz,
                                      s.z_r, s.z_w))(state)
    W = jax.jit(lambda H, V, s: omega_mod.omega(cfg, grid, H, V,
                                                s.z_w))(Huon, Hvom,
                                                        state)

    phases = {}
    phases["set_massflux"] = (jax.jit(prep_fluxes), (state,))
    phases["rho_eos"] = (jax.jit(
        lambda s: rho_eos(cfg, s.t, s.z_r, s.Hz, s.z_w)), (state,))
    phases["bottom_drag"] = (jax.jit(
        lambda s: set_vbc.bottom_drag(cfg, grid, s.u, s.v, s.Hz,
                                      s.z_r, s.z_w)), (state,))
    phases["omega"] = (jax.jit(
        lambda H, V, s: omega_mod.omega(cfg, grid, H, V, s.z_w)),
        (Huon, Hvom, state))
    if cfg.mixing.vmix == "lmd" and not cfg.mixing.bkpp:
        from ..ops import pallas_kpp
        if pallas_kpp.use_pallas_kpp(cfg):
            phases["lmd_kpp(pallas)"] = (jax.jit(
                lambda s, pden, bvf, f: pallas_kpp.lmd_kpp_fused(
                    cfg, grid, s.t, s.u, s.v, pden, bvf, s.Hz, s.z_r,
                    s.z_w, f)), (state, pden, bvf, forcing))
        else:
            def kpp(s, bvf, f):
                Akv, Akt = lmd_mod.lmd_vmix_interior(cfg, s.u, s.v,
                                                     bvf, s.Hz)
                return lmd_mod.lmd_skpp(cfg, grid, s.t, s.u, s.v,
                                        pden, bvf, s.Hz, s.z_r, s.z_w,
                                        f, Akv, Akt)
            phases["lmd_kpp"] = (jax.jit(kpp), (state, bvf, forcing))

    def prestep(s, H, V, W, f, bu, bv):
        return pre_step3d(cfg, grid, s.u, s.v, s.t, s.t_prev,
                          s.ru_prev, s.rv_prev, s.ru_prev2, s.rv_prev2,
                          s.Hz, s.z_r, s.z_w, H, V, W, f, bu, bv,
                          s.iic)
    phases["pre_step3d"] = (jax.jit(prestep),
                            (state, Huon, Hvom, W, forcing, bustr,
                             bvstr))
    phases["prsgrd"] = (jax.jit(
        lambda rho, s: prsgrd.prsgrd32(cfg, grid, rho, s.z_r, s.z_w,
                                       s.Hz)), (rho, state))
    ru0, rv0 = jax.jit(
        lambda rho, s: prsgrd.prsgrd32(cfg, grid, rho, s.z_r, s.z_w,
                                       s.Hz))(rho, state)
    phases["rhs3d_momentum"] = (jax.jit(
        lambda s, H, V, W, a, b: rhs3d.rhs3d_momentum(
            cfg, grid, s.u, s.v, s.Hz, H, V, W, a, b)),
        (state, Huon, Hvom, W, ru0, rv0))

    def fast(s, rufrc, rvfrc, rhoS, rhoA):
        return model.fast_loop(grid, s.zeta, s.ubar, s.vbar, rufrc,
                               rvfrc, rhoS, rhoA, s.ru0_prev,
                               s.rv0_prev, s.ru0_prev2, s.rv0_prev2,
                               s.iic, None, None)
    rufrc, rvfrc = jax.jit(
        lambda ru, rv, f, bu, bv: rhs3d.integrate_rufrc(
            cfg, grid, ru, rv, f, bu, bv))(ru0, rv0, forcing, bustr,
                                           bvstr)
    phases[f"fast_loop({model.nfast})"] = (
        jax.jit(fast), (state, rufrc, rvfrc, rhoS, rhoA))
    return phases


def region_report(model, state, reps: int = 10) -> str:
    """timers.F-style wall-clock table over the model phases."""
    step = jax.jit(model._step_grid)
    t_step = _timeit(step, (state, model.grid), reps)
    try:
        ca = step.lower(state, model.grid).compile().cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        bytes_acc = ca.get("bytes accessed", float("nan"))
    except Exception:
        bytes_acc = float("nan")

    results = {}
    for name, (fn, args) in region_phases(model, state).items():
        try:
            results[name] = _timeit(fn, args, reps)
        except Exception as e:
            results[name] = float("nan")

    lines = ["", " Elapsed wall time per region (nonlinear model):", ""]
    for name, t in sorted(results.items(),
                          key=lambda kv: -(kv[1] if kv[1] == kv[1]
                                           else 0.0)):
        pct = 100.0 * t / t_step if t == t else float("nan")
        lines.append(f"  {name:<24s} {t * 1e3:9.3f} ms "
                     f"({pct:5.1f}% of step, isolated)")
    lines.append(f"  {'FULL STEP':<24s} {t_step * 1e3:9.3f} ms")
    if bytes_acc == bytes_acc:
        ideal = bytes_acc / (HBM_GBPS * 1e9)
        lines.append(f"  bytes accessed/step = {bytes_acc:.3e}; "
                     f"HBM roofline {ideal * 1e3:.2f} ms "
                     f"({t_step / ideal:.1f}x off)")
    return "\n".join(lines)
