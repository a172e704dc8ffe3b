"""HSIMT TVD tracer advection tests (step3d_t.F HSIMT branches)."""

import numpy as np
import pytest

from roms_tpu.config import HSIMT
from roms_tpu.core.stepping import Model
from roms_tpu.functionals import upwelling


def test_hsimt_monotone_upwelling():
    """Advecting a monotone T(z) profile in the upwelling circulation
    must create no new extrema (the TVD property)."""
    cfg = upwelling.make_config(Lm=16, Mm=18, N=8,
                                dtype="float64").replace(hadv=HSIMT,
                                                         vadv=HSIMT)
    grid = upwelling.make_grid(cfg)
    st0 = upwelling.make_initial(cfg, grid)
    m = Model(cfg, grid, upwelling.make_forcing_fn(cfg, grid),
              upwelling.make_vmix_fn(cfg))
    s = m.run(st0, 40)
    T = np.asarray(s.t[0])
    T0 = np.asarray(st0.t[0])
    assert np.isfinite(T).all()
    assert T[:, 1:-1, 1:-1].min() >= T0.min() - 1e-9
    assert T[:, 1:-1, 1:-1].max() <= T0.max() + 1e-9


def test_hsimt_k_kl_gls_combo():
    """HSIMT advection + k-kl (MY2.5-parameter) GLS closure integrate
    stably (the gls_p=0/m=1/n=1 wall-function branch)."""
    import dataclasses
    cfg = upwelling.make_config(Lm=12, Mm=12, N=8, dtype="float64")
    cfg = cfg.replace(
        hadv=HSIMT, vadv=HSIMT,
        mixing=dataclasses.replace(
            cfg.mixing, vmix="gls", gls_stab="kantha_clayson",
            gls_p=0.0, gls_m=1.0, gls_n=1.0, gls_cmu0=0.5544,
            gls_c1=0.9, gls_c2=0.52, gls_c3m=2.5, gls_c3p=1.0,
            gls_sigk=1.96, gls_sigp=1.96))
    grid = upwelling.make_grid(cfg)
    st0 = upwelling.make_initial(cfg, grid)
    m = Model(cfg, grid, upwelling.make_forcing_fn(cfg, grid))
    s = m.run(st0, 15)
    assert np.isfinite(np.asarray(s.t)).all()
    assert np.isfinite(np.asarray(s.mix.tke)).all()
    assert np.asarray(s.mix.Akv).max() < 1.0
