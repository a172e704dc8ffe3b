#!/usr/bin/env python
"""Per-phase region timing of the baroclinic step (timers.F analog).

The reference prints an 88-region wall-clock table at finalize
(ROMS/Utility/timers.F:249-313).  Under XLA the step is one fused
program, so this tool times each phase as an isolated jit over the real
model arrays — the region table that steers kernel-fusion work.  It
also prints the full-step XLA cost analysis (flops, bytes accessed)
and the HBM roofline implied by the measured step time.

Usage (TPU):
  PYTHONPATH=/root/repo:/root/.axon_site python tools/phase_bench.py \
      --size 2 [--variant full|light] [--reps 20]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HBM_GBPS = 819.0     # v5e HBM bandwidth


def timeit(fn, args, reps, warmup=3):
    import jax
    out = None
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--size", type=int, default=2, choices=[1, 2, 3])
    p.add_argument("--variant", default="full", choices=["full", "light"])
    p.add_argument("--reps", type=int, default=20)
    p.add_argument("--dtype", default="float32")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    if jax.default_backend() == "tpu":
        jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    from roms_tpu.core.stepping import Model
    from roms_tpu.core import (gls as gls_mod, hmix, lmd as lmd_mod,
                               omega as omega_mod, prsgrd, rhs3d, set_vbc)
    from roms_tpu.core.pre_step3d import pre_step3d
    from roms_tpu.core.rho_eos import rho_eos
    from roms_tpu.core.step3d_t import step3d_t
    from roms_tpu.core.step3d_uv import step3d_uv
    from roms_tpu.grid.depth import set_depth, set_massflux
    from roms_tpu.ops import stencil as st
    from roms_tpu.functionals import benchmark

    full = args.variant == "full"
    Lm, Mm, N = 512 * 2 ** (args.size - 1), 64 * 2 ** (args.size - 1), 30
    cfg = benchmark.make_config(Lm=Lm, Mm=Mm, N=N, dtype=args.dtype,
                                full_physics=full)
    grid = benchmark.make_grid(cfg)
    state = benchmark.make_initial(cfg, grid)
    forcing_fn = (benchmark.make_bulk_forcing_fn(cfg, grid) if full
                  else benchmark.make_forcing_fn(cfg, grid))
    model = Model(cfg, grid, forcing_fn)

    # ---- full step first: measured time + cost analysis ----
    step = jax.jit(model._step_grid)
    lowered = step.lower(state, grid)
    compiled = lowered.compile()
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        flops = ca.get("flops", float("nan"))
        bytes_acc = ca.get("bytes accessed", float("nan"))
    except Exception as e:
        flops = bytes_acc = float("nan")
        print(f"# cost_analysis unavailable: {e}", file=sys.stderr)
    t_step = timeit(step, (state, grid), args.reps)

    # ---- build phase inputs by replaying the prep chain ----
    z_r, z_w, Hz = state.z_r, state.z_w, state.Hz
    iic = state.iic

    def prep_fluxes(state, grid):
        Huon, Hvom = set_massflux(grid, state.u, state.v, state.Hz)
        if cfg.bc.ew_periodic:
            Huon, Hvom = st.periodic_x(Huon), st.periodic_x(Hvom)
        return Huon, Hvom

    Huon, Hvom = jax.jit(prep_fluxes)(state, grid)
    rho, pden, rhoA, rhoS, bvf = jax.jit(
        lambda s: rho_eos(cfg, s.t, s.z_r, s.Hz, s.z_w))(state)
    if full:
        forcing = forcing_fn(state.time, state.t[0][-1], state.t[1][-1],
                             rho[-1])
    else:
        forcing = forcing_fn(state.time)
    bustr, bvstr = jax.jit(
        lambda s: set_vbc.bottom_drag(cfg, grid, s.u, s.v, s.Hz, s.z_r,
                                      s.z_w))(state)
    if full:
        from roms_tpu.ops import pallas_kpp

        def kpp(state, bvf, forcing):
            # measure the SAME path stepping.py dispatches (fused
            # Pallas kernel on a single TPU; jnp otherwise)
            if not cfg.mixing.bkpp and pallas_kpp.use_pallas_kpp(cfg):
                return pallas_kpp.lmd_kpp_fused(
                    cfg, grid, state.t, state.u, state.v, pden, bvf,
                    state.Hz, state.z_r, state.z_w, forcing)
            Akv, Akt = lmd_mod.lmd_vmix_interior(cfg, state.u, state.v,
                                                 bvf, state.Hz)
            return lmd_mod.lmd_skpp(cfg, grid, state.t, state.u, state.v,
                                    pden, bvf, state.Hz, state.z_r,
                                    state.z_w, forcing, Akv, Akt)
        Akv, Akt, ghats, hsbl = jax.jit(kpp)(state, bvf, forcing)
        ghats_flux = Akt * ghats
    else:
        Akv = jnp.full_like(z_w, cfg.mixing.akv_bak)
        Akt = jnp.stack([jnp.full_like(z_w, ab)
                         for ab in cfg.mixing.akt_bak])
        ghats_flux = None
    W = jax.jit(lambda H, V, zw: omega_mod.omega(cfg, grid, H, V, zw))(
        Huon, Hvom, z_w)

    phases = {}
    phases["set_massflux+periodic"] = (jax.jit(prep_fluxes), (state, grid))
    from roms_tpu.ops import pallas_rho

    def eos(s):
        # same dispatch as stepping.py (fused kernel on single TPU)
        if pallas_rho.use_pallas_rho(cfg):
            return pallas_rho.rho_eos_pallas(cfg, s.t, s.z_r, s.Hz,
                                             s.z_w)
        return rho_eos(cfg, s.t, s.z_r, s.Hz, s.z_w)
    phases["rho_eos"] = (jax.jit(eos), (state,))
    if full:
        def bulk_only(s, rho_s):
            return forcing_fn(s.time, s.t[0][-1], s.t[1][-1], rho_s)
        phases["bulk_flux(COARE)"] = (jax.jit(bulk_only), (state, rho[-1]))
        phases["lmd_kpp"] = (jax.jit(kpp), (state, bvf, forcing))
    phases["bottom_drag"] = (jax.jit(
        lambda s: set_vbc.bottom_drag(cfg, grid, s.u, s.v, s.Hz, s.z_r,
                                      s.z_w)), (state,))
    phases["omega"] = (jax.jit(
        lambda H, V, zw: omega_mod.omega(cfg, grid, H, V, zw)),
        (Huon, Hvom, z_w))

    def prestep(s, Huon, Hvom, W, forcing, bustr, bvstr):
        return pre_step3d(cfg, grid, s.u, s.v, s.t, s.t_prev,
                          s.ru_prev, s.rv_prev, s.ru_prev2, s.rv_prev2,
                          s.Hz, s.z_r, s.z_w, Huon, Hvom, W, forcing,
                          bustr, bvstr, s.iic, ghats=ghats_flux)
    phases["pre_step3d"] = (jax.jit(prestep),
                            (state, Huon, Hvom, W, forcing, bustr, bvstr))
    t_half, t_part, u_part, v_part = jax.jit(prestep)(
        state, Huon, Hvom, W, forcing, bustr, bvstr)

    from roms_tpu.ops import pallas_prsgrd

    def pg(rho, s):
        # same dispatch as stepping.py
        if pallas_prsgrd.use_pallas_prsgrd(cfg):
            return pallas_prsgrd.prsgrd32_pallas(cfg, grid, rho,
                                                 s.z_r, s.z_w, s.Hz)
        return prsgrd.prsgrd32(cfg, grid, rho, s.z_r, s.z_w, s.Hz)
    phases["prsgrd32"] = (jax.jit(pg), (rho, state))
    ru0, rv0 = jax.jit(pg)(rho, state)

    if cfg.mixing.mix_geo_ts:
        phases["t3dmix2_geo"] = (jax.jit(
            lambda s, tp: hmix.t3dmix2_geo(cfg, grid, s.t, tp, s.Hz,
                                           s.z_r)), (state, t_part))
    phases["rhs3d_momentum"] = (jax.jit(
        lambda s, H, V, W, ru, rv: rhs3d.rhs3d_momentum(
            cfg, grid, s.u, s.v, s.Hz, H, V, W, ru, rv)),
        (state, Huon, Hvom, W, ru0, rv0))
    ru, rv = jax.jit(
        lambda s, H, V, W, a, b: rhs3d.rhs3d_momentum(
            cfg, grid, s.u, s.v, s.Hz, H, V, W, a, b))(
        state, Huon, Hvom, W, ru0, rv0)
    rufrc, rvfrc = jax.jit(
        lambda ru, rv, f, bu, bv: rhs3d.integrate_rufrc(
            cfg, grid, ru, rv, f, bu, bv))(ru, rv, forcing, bustr, bvstr)

    phases["uv3dmix2_s"] = (jax.jit(
        lambda s, up, vp, rf, rvf: hmix.uv3dmix2_s(
            cfg, grid, s.u, s.v, up, vp, s.Hz, rf, rvf)),
        (state, u_part, v_part, rufrc, rvfrc))

    def fast(s, rufrc, rvfrc, rhoS, rhoA):
        return model.fast_loop(grid, s.zeta, s.ubar, s.vbar, rufrc,
                               rvfrc, rhoS, rhoA, s.ru0_prev, s.rv0_prev,
                               s.ru0_prev2, s.rv0_prev2, s.iic, None,
                               None)
    phases[f"fast_loop({model.nfast}substeps)"] = (
        jax.jit(fast), (state, rufrc, rvfrc, rhoS, rhoA))
    avg = jax.jit(fast)(state, rufrc, rvfrc, rhoS, rhoA)[0]

    phases["set_depth"] = (jax.jit(
        lambda z: set_depth(grid, z)), (avg.Zt_avg1,))
    z_r2, z_w2, Hz2 = jax.jit(lambda z: set_depth(grid, z))(avg.Zt_avg1)

    def s3duv(up, vp, ru, rv, Hz2, z_r2, Akv, avg, H, V, s):
        return step3d_uv(cfg, grid, up, vp, ru, rv, Hz2, z_r2, Akv, avg,
                         H, V, s.iic, u_old=s.u, v_old=s.v)
    phases["step3d_uv"] = (jax.jit(s3duv),
                           (u_part, v_part, ru, rv, Hz2, z_r2, Akv, avg,
                            Huon, Hvom, state))
    out_uv = jax.jit(s3duv)(u_part, v_part, ru, rv, Hz2, z_r2, Akv, avg,
                            Huon, Hvom, state)
    Huon2, Hvom2 = out_uv[4], out_uv[5]
    W2 = jax.jit(lambda H, V, zw: omega_mod.omega(cfg, grid, H, V, zw))(
        Huon2, Hvom2, z_w2)

    def s3dt(th, tp, H, V, W, Hz2, z_r2, Akt, s):
        return step3d_t(cfg, grid, th, tp, H, V, W, Hz2, z_r2, Akt,
                        t_old=s.t)
    phases["step3d_t"] = (jax.jit(s3dt),
                          (t_half, t_part, Huon2, Hvom2, W2, Hz2, z_r2,
                           Akt, state))

    # ---- measure ----
    print(f"# BENCHMARK{args.size} {Lm}x{Mm}x{N} variant={args.variant} "
          f"dtype={args.dtype} backend={jax.default_backend()}")
    results = {}
    for name, (fn, a) in phases.items():
        try:
            results[name] = timeit(fn, a, args.reps)
        except Exception as e:
            print(f"# phase {name} failed: {type(e).__name__}: {e}",
                  file=sys.stderr)

    tot = sum(results.values())
    print(f"\n Elapsed time per region (ms), full step = "
          f"{t_step * 1e3:9.3f} ms:\n")
    for name, t in sorted(results.items(), key=lambda kv: -kv[1]):
        print(f"  {name:<28s} {t * 1e3:9.3f} ms  "
              f"({100.0 * t / t_step:5.1f}% of step)")
    print(f"  {'SUM OF PHASES':<28s} {tot * 1e3:9.3f} ms  "
          f"({100.0 * tot / t_step:5.1f}% of step)")
    if flops == flops:
        print(f"\n cost_analysis: flops/step = {flops:.3e}  "
              f"bytes accessed = {bytes_acc:.3e}")
        print(f" roofline: HBM-bound ideal = "
              f"{bytes_acc / (HBM_GBPS * 1e9) * 1e3:.2f} ms/step "
              f"vs measured {t_step * 1e3:.2f} ms "
              f"({t_step / (bytes_acc / (HBM_GBPS * 1e9)):.1f}x off)")
    print(json.dumps({"step_ms": t_step * 1e3,
                      "phases_ms": {k: v * 1e3
                                    for k, v in results.items()}}))


if __name__ == "__main__":
    main()
