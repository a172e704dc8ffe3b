"""Fused prep-chain kernel (ops/pallas_prep.py): rho_eos + KPP in one
launch vs the unfused pair (pallas_rho + pallas_kpp, interpret mode)
and vs the whole-array jnp path.  The fused kernel reuses the exact
block bodies, so outputs must match the unfused kernels bitwise in f64
and the jnp path to roundoff."""

import numpy as np
import pytest

import jax

from roms_tpu.core import lmd as lmd_mod
from roms_tpu.core.rho_eos import rho_eos
from roms_tpu.functionals import benchmark

pytestmark = pytest.mark.quick


@pytest.fixture(scope="module")
def setup():
    cfg = benchmark.make_config(Lm=126, Mm=30, N=16, dtype="float64",
                                full_physics=True)
    grid = benchmark.make_grid(cfg)
    state = benchmark.make_initial(cfg, grid)
    key = jax.random.PRNGKey(7)
    du = 0.05 * jax.random.normal(key, state.u.shape, state.u.dtype)
    state = state._replace(u=state.u + du, v=state.v + 0.5 * du)
    forcing_fn = benchmark.make_bulk_forcing_fn(cfg, grid)
    rho, pden, rhoA, rhoS, bvf = jax.jit(
        lambda s: rho_eos(cfg, s.t, s.z_r, s.Hz, s.z_w))(state)
    forcing = forcing_fn(state.time, state.t[0][-1], state.t[1][-1],
                         rho[-1])
    return cfg, grid, state, (rho, pden, rhoA, rhoS, bvf), forcing


def test_surface_rho_matches_full_eos(setup):
    """surface_rho (the 2-D standalone evaluation feeding bulk_flux)
    equals the top level of the full EOS bitwise."""
    cfg, grid, state, eos, _ = setup
    from roms_tpu.ops.pallas_prep import surface_rho
    rs = surface_rho(cfg, state.t, state.z_r)
    np.testing.assert_array_equal(np.asarray(rs),
                                  np.asarray(eos[0][-1]))


def test_prep_fused_matches_unfused_kernels(setup):
    """prep_fused == (pallas_rho outputs, lmd_kpp_fused outputs)."""
    cfg, grid, state, eos, forcing = setup
    rho, pden, rhoA, rhoS, bvf = eos
    from roms_tpu.ops.pallas_kpp import lmd_kpp_fused
    from roms_tpu.ops.pallas_prep import prep_fused
    from roms_tpu.ops.pallas_rho import rho_eos_pallas
    # feed the unfused KPP the pallas-rho EOS so its pden/bvf inputs
    # are bit-identical to what the fused kernel computes in-register
    _, pden_k, _, _, bvf_k = rho_eos_pallas(cfg, state.t, state.z_r,
                                            state.Hz, state.z_w,
                                            interpret=True)
    Akv_k, Akt_k, ghats_k, hsbl_k = lmd_kpp_fused(
        cfg, grid, state.t, state.u, state.v, pden_k, bvf_k, state.Hz,
        state.z_r, state.z_w, forcing, interpret=True)

    (rho_p, pden_p, rhoA_p, rhoS_p, Akv_p, Akt_p, ghats_p,
     hsbl_p) = prep_fused(cfg, grid, state.t, state.u, state.v,
                          state.Hz, state.z_r, state.z_w, forcing,
                          interpret=True)
    a = np.asarray
    np.testing.assert_allclose(a(rho_p), a(rho), rtol=1e-12,
                               atol=1e-12)
    np.testing.assert_allclose(a(pden_p), a(pden), rtol=1e-12,
                               atol=1e-12)
    np.testing.assert_allclose(a(rhoA_p), a(rhoA), rtol=1e-12)
    np.testing.assert_allclose(a(rhoS_p), a(rhoS), rtol=1e-12)
    # identical block bodies -> identical results vs the unfused KPP
    # up to compiler reassociation of the shared trace (~1 ulp)
    np.testing.assert_allclose(a(Akv_p), a(Akv_k), rtol=1e-13,
                               atol=1e-18)
    np.testing.assert_allclose(a(Akt_p), a(Akt_k), rtol=1e-13,
                               atol=1e-18)
    np.testing.assert_allclose(a(ghats_p), a(ghats_k), rtol=1e-13,
                               atol=1e-18)
    np.testing.assert_allclose(a(hsbl_p), a(hsbl_k), rtol=1e-13)


def test_model_step_prep_fused_vs_separate_kernels(setup, monkeypatch):
    """Full Model.step with the fused prep chain vs the separate
    rho/KPP kernels (both interpret mode on CPU)."""
    cfg, grid, state, eos, forcing = setup
    from roms_tpu.core.stepping import Model
    forcing_fn = benchmark.make_bulk_forcing_fn(cfg, grid)
    monkeypatch.setenv("ROMS_TPU_PALLAS_KPP", "1")
    monkeypatch.setenv("ROMS_TPU_PALLAS_RHO", "1")
    monkeypatch.setenv("ROMS_TPU_PALLAS_KPP_INTERPRET", "1")
    monkeypatch.setenv("ROMS_TPU_PALLAS_PREP", "0")
    s_sep = Model(cfg, grid, forcing_fn).step(state)
    monkeypatch.setenv("ROMS_TPU_PALLAS_PREP", "1")
    s_fus = Model(cfg, grid, forcing_fn).step(state)
    a = np.asarray
    for f in ("zeta", "ubar", "vbar", "u", "v", "t"):
        np.testing.assert_allclose(a(getattr(s_fus, f)),
                                   a(getattr(s_sep, f)),
                                   rtol=1e-10, atol=1e-13,
                                   err_msg=f)


def test_prep_fused_matches_jnp_path(setup):
    """prep_fused KPP outputs vs the whole-array core/lmd.py chain."""
    cfg, grid, state, eos, forcing = setup
    rho, pden, rhoA, rhoS, bvf = eos
    from roms_tpu.ops.pallas_prep import prep_fused
    Akv_r, Akt_r = lmd_mod.lmd_vmix_interior(cfg, state.u, state.v,
                                             bvf, state.Hz)
    Akv_r, Akt_r, ghats_r, hsbl_r = lmd_mod.lmd_skpp(
        cfg, grid, state.t, state.u, state.v, pden, bvf, state.Hz,
        state.z_r, state.z_w, forcing, Akv_r, Akt_r)
    (_, _, _, _, Akv_p, Akt_p, ghats_p, hsbl_p) = prep_fused(
        cfg, grid, state.t, state.u, state.v, state.Hz, state.z_r,
        state.z_w, forcing, interpret=True)
    a = np.asarray
    np.testing.assert_allclose(a(hsbl_p), a(hsbl_r), rtol=1e-9,
                               atol=1e-9)
    np.testing.assert_allclose(a(Akv_p), a(Akv_r), rtol=1e-8,
                               atol=1e-12)
    np.testing.assert_allclose(a(Akt_p[0]), a(Akt_r[0]), rtol=1e-8,
                               atol=1e-12)
