"""GLS turbulence closure tests (UPWELLING + GLS_MIXING variant of
ROMS/Include/upwelling.h:44-47)."""

import dataclasses

import numpy as np
import pytest

from roms_tpu.core.stepping import Model
from roms_tpu.functionals import upwelling


def _run(stab, nsteps=20, **gls_kw):
    cfg = upwelling.make_config(Lm=20, Mm=24, N=12, dtype="float64")
    cfg = cfg.replace(mixing=dataclasses.replace(
        cfg.mixing, vmix="gls", gls_stab=stab, **gls_kw))
    grid = upwelling.make_grid(cfg)
    state = upwelling.make_initial(cfg, grid)
    model = Model(cfg, grid, upwelling.make_forcing_fn(cfg, grid))
    return cfg, model.run(state, nsteps)


class TestGLS:
    @pytest.mark.parametrize("stab", ["canuto_a", "kantha_clayson"])
    def test_stable_and_physical(self, stab):
        cfg, s = _run(stab)
        a = np.asarray
        assert np.isfinite(a(s.mix.tke)).all()
        assert np.isfinite(a(s.u)).all() and np.isfinite(a(s.t)).all()
        # tke bounded below by gls_Kmin (gls_corstep.F MAX clipping)
        assert a(s.mix.tke).min() >= cfg.mixing.gls_kmin - 1e-18
        assert a(s.mix.gls).min() >= cfg.mixing.gls_pmin
        # mixing coefficients at least background, physically bounded
        assert a(s.mix.Akv).min() >= cfg.mixing.akv_bak - 1e-18
        assert a(s.mix.Akv).max() < 1.0
        # wind stirring must raise the surface-interface TKE (Dirichlet
        # stress balance, gls_corstep.F:660-668) above background
        assert a(s.mix.tke)[-1].max() > 1.5 * cfg.mixing.gls_kmin

    def test_keps_vs_komega_parameters(self):
        """k-epsilon parameter set (gls_p=3,m=1.5,n=-1 default) and
        k-omega (p=-1,m=0.5,n=-1) both integrate stably."""
        cfg, s = _run("canuto_a", gls_p=-1.0, gls_m=0.5, gls_n=-1.0,
                      gls_cmu0=0.5477, gls_c1=0.555, gls_c2=0.833,
                      gls_c3m=-0.6, gls_c3p=1.0, gls_sigk=2.0,
                      gls_sigp=2.0)
        assert np.isfinite(np.asarray(s.mix.tke)).all()
        assert np.isfinite(np.asarray(s.u)).all()


def test_bkpp_full_physics():
    """LMD surface+bottom KPP with COARE fluxes and OBC volume guard:
    the complete BENCHMARK physics column integrates stably."""
    import dataclasses
    import numpy as np
    from roms_tpu.functionals import benchmark
    from roms_tpu.core.stepping import Model
    cfg = benchmark.make_config(Lm=32, Mm=16, N=12, dtype="float64")
    cfg = cfg.replace(mixing=dataclasses.replace(
        cfg.mixing, vmix="lmd", solar_source=True, bkpp=True))
    grid = benchmark.make_grid(cfg)
    st = benchmark.make_initial(cfg, grid)
    m = Model(cfg, grid, benchmark.make_bulk_forcing_fn(cfg, grid))
    s = m.run(st, 8)
    assert np.isfinite(np.asarray(s.u)).all()
    assert np.isfinite(np.asarray(s.t)).all()


def test_my25_preset_runs_and_mixes():
    """MY2.5 via the k-kl GLS member (my25_corstep.F equivalence,
    Umlauf & Burchard 2003 Table 1): runs stably and deepens the
    surface mixed layer under wind."""
    import dataclasses
    import numpy as np
    from roms_tpu.core import gls as gls_mod
    from roms_tpu.core.stepping import Model
    from roms_tpu.functionals import upwelling

    cfg = upwelling.make_config(dtype="float64")
    cfg = cfg.replace(mixing=gls_mod.my25_mixing_config(cfg.mixing))
    grid = upwelling.make_grid(cfg)
    s0 = upwelling.make_initial(cfg, grid)
    s0 = s0._replace(mix=gls_mod.initial_mix(cfg))
    m = Model(cfg, grid, upwelling.make_forcing_fn(cfg, grid))
    s = m.run(s0, 80)
    assert np.isfinite(np.asarray(s.t[0])).all()
    Akv = np.asarray(s.mix.Akv)
    # turbulence developed somewhere in the wind-forced surface layer
    assert Akv.max() > 3.0 * cfg.mixing.akv_bak
    assert np.isfinite(Akv).all()


def test_bvf_mix_closure():
    """bvf_mix.F: stable stratification gives clip(nu0/sqrt(N2)) in
    [numin, numax]; unstable columns get the convective 1 m2/s."""
    import numpy as np
    import jax.numpy as jnp
    from roms_tpu.core.stepping import Model, make_bvf_mix
    from roms_tpu.functionals import upwelling

    cfg = upwelling.make_config(dtype="float64")
    grid = upwelling.make_grid(cfg)
    s0 = upwelling.make_initial(cfg, grid)
    vmix = make_bvf_mix(cfg)
    Akv, Akt = vmix(s0, grid, s0.z_w)
    a = np.asarray(Akv)[3:-3]
    assert (a >= 3.0e-5 - 1e-12).all() and (a <= 4.0e-4 + 1e-12).all()
    # invert the stratification -> convective value
    t_inv = s0.t.at[0].set(s0.t[0][::-1])
    s_inv = s0._replace(t=t_inv)
    Akv_i, _ = vmix(s_inv, grid, s0.z_w)
    assert float(np.asarray(Akv_i)[5:-5].max()) == 1.0
    # model runs stably under the closure
    m = Model(cfg, grid, upwelling.make_forcing_fn(cfg, grid),
              vmix_fn=vmix)
    s = m.run(s0, 10)
    assert np.isfinite(np.asarray(s.t)).all()
