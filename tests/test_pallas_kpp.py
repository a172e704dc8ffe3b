"""Fused Pallas KPP kernel vs the whole-array jnp reference path
(core/lmd.py).  Runs in interpreter mode on CPU; on TPU the same kernel
is the production path for the BENCHMARK physics."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from roms_tpu.core import lmd as lmd_mod
from roms_tpu.core.rho_eos import rho_eos
from roms_tpu.functionals import benchmark


@pytest.fixture(scope="module")
def setup():
    cfg = benchmark.make_config(Lm=126, Mm=30, N=16, dtype="float64",
                                full_physics=True)
    grid = benchmark.make_grid(cfg)
    state = benchmark.make_initial(cfg, grid)
    # perturb so boundary-layer depths vary across columns
    key = jax.random.PRNGKey(0)
    du = 0.05 * jax.random.normal(key, state.u.shape, state.u.dtype)
    state = state._replace(u=state.u + du,
                           v=state.v + 0.5 * du)
    forcing_fn = benchmark.make_bulk_forcing_fn(cfg, grid)
    rho, pden, _, _, bvf = jax.jit(
        lambda s: rho_eos(cfg, s.t, s.z_r, s.Hz, s.z_w))(state)
    forcing = forcing_fn(state.time, state.t[0][-1], state.t[1][-1],
                         rho[-1])
    return cfg, grid, state, pden, bvf, forcing


def _reference(cfg, grid, state, pden, bvf, forcing):
    Akv, Akt = lmd_mod.lmd_vmix_interior(cfg, state.u, state.v, bvf,
                                         state.Hz)
    return lmd_mod.lmd_skpp(cfg, grid, state.t, state.u, state.v, pden,
                            bvf, state.Hz, state.z_r, state.z_w,
                            forcing, Akv, Akt)


def test_block_math_matches_reference(setup):
    """kpp_block (the in-kernel math, called directly on full arrays)
    reproduces lmd_vmix_interior+lmd_skpp."""
    cfg, grid, state, pden, bvf, forcing = setup
    from roms_tpu.ops.pallas_kpp import lmd_kpp_fused
    Akv_r, Akt_r, ghats_r, hsbl_r = _reference(cfg, grid, state, pden,
                                               bvf, forcing)
    Akv_p, Akt_p, ghats_p, hsbl_p = lmd_kpp_fused(
        cfg, grid, state.t, state.u, state.v, pden, bvf, state.Hz,
        state.z_r, state.z_w, forcing, interpret=True)
    a = np.asarray
    # interior columns (the boundary ring differs only via the roll
    # wrap of u_r, identical here since EW-periodic)
    np.testing.assert_allclose(a(hsbl_p), a(hsbl_r), rtol=1e-9,
                               atol=1e-9)
    np.testing.assert_allclose(a(Akv_p), a(Akv_r), rtol=1e-8,
                               atol=1e-12)
    np.testing.assert_allclose(a(Akt_p[0]), a(Akt_r[0]), rtol=1e-8,
                               atol=1e-12)
    np.testing.assert_allclose(a(ghats_p), a(ghats_r), rtol=1e-8,
                               atol=1e-15)


def test_fused_step_matches_jnp_step(setup):
    """Full model step with ROMS_TPU_PALLAS_KPP=1 (interpret on CPU)
    equals the jnp-KPP step."""
    import os
    cfg, grid, state, pden, bvf, forcing = setup
    from roms_tpu.core.stepping import Model
    forcing_fn = benchmark.make_bulk_forcing_fn(cfg, grid)
    m = Model(cfg, grid, forcing_fn)
    s_ref = m.step(state)
    os.environ["ROMS_TPU_PALLAS_KPP"] = "1"
    os.environ["ROMS_TPU_PALLAS_RHO"] = "1"
    os.environ["ROMS_TPU_PALLAS_KPP_INTERPRET"] = "1"
    try:
        m2 = Model(cfg, grid, forcing_fn)
        s_pal = m2.step(state)
    finally:
        del os.environ["ROMS_TPU_PALLAS_KPP"]
        del os.environ["ROMS_TPU_PALLAS_RHO"]
        del os.environ["ROMS_TPU_PALLAS_KPP_INTERPRET"]
    a = np.asarray
    np.testing.assert_allclose(a(s_pal.u), a(s_ref.u), rtol=1e-7,
                               atol=1e-10)
    np.testing.assert_allclose(a(s_pal.t), a(s_ref.t), rtol=1e-7,
                               atol=1e-10)


def test_pallas_bulk_matches_reference():
    """Fused COARE kernel (interpret mode) equals the XLA path."""
    import jax.numpy as jnp
    from roms_tpu.core.bulk_flux import bulk_flux
    from roms_tpu.ops.pallas_bulk import bulk_flux_pallas
    cfg = benchmark.make_config(Lm=126, Mm=30, N=8, dtype="float64",
                                full_physics=True)
    grid = benchmark.make_grid(cfg)
    state = benchmark.make_initial(cfg, grid)
    atm = benchmark.make_atm_fn(cfg, grid)(jnp.asarray(43200.0))
    sst = state.t[0][-1] + 0.5
    sss = state.t[1][-1]
    rho_s = jnp.zeros_like(sst) + 25.0
    ref = bulk_flux(cfg, atm, sst, sss, rho_s)
    pal = bulk_flux_pallas(cfg, atm, sst, sss, rho_s, interpret=True)
    for a, b, name in zip(pal, ref[:4],
                          ("sustr", "svstr", "stT", "stS")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-10, atol=1e-14,
                                   err_msg=name)


def test_pallas_rho_matches_reference():
    """Fused EOS kernel (interpret mode) equals the XLA path."""
    from roms_tpu.core.rho_eos import rho_eos
    from roms_tpu.ops.pallas_rho import rho_eos_pallas
    cfg = benchmark.make_config(Lm=126, Mm=30, N=12, dtype="float64",
                                full_physics=True)
    grid = benchmark.make_grid(cfg)
    state = benchmark.make_initial(cfg, grid)
    ref = rho_eos(cfg, state.t, state.z_r, state.Hz, state.z_w)
    pal = rho_eos_pallas(cfg, state.t, state.z_r, state.Hz, state.z_w,
                         interpret=True)
    for a, b, name in zip(pal, ref,
                          ("rho", "pden", "rhoA", "rhoS", "bvf")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-12, atol=1e-13,
                                   err_msg=name)
