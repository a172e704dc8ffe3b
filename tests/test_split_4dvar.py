"""Split-phase 4D-Var drivers (split_i4dvar_roms.h semantics): the
background / increment / analysis phases run as separate executions
with file-only hand-off and reproduce the single-call analysis."""

import numpy as np
import pytest

import jax.numpy as jnp

from roms_tpu.assim.i4dvar import (Control, Observations, i4dvar,
                                   observe_trajectory)
from roms_tpu.assim.split import (phase_analysis, phase_background,
                                  phase_increment)
from roms_tpu.core.stepping import Model
from roms_tpu.functionals import upwelling


def make_model():
    cfg = upwelling.make_config(Lm=8, Mm=8, N=4, dt=120.0, ndtfast=8,
                                dtype="float64")
    grid = upwelling.make_grid(cfg)
    model = Model(cfg, grid, upwelling.make_forcing_fn(cfg, grid),
                  upwelling.make_vmix_fn(cfg))
    return cfg, grid, model


def make_obs(cfg, model, grid, nsteps):
    """Synthetic observations from a perturbed truth run."""
    truth = upwelling.make_initial(cfg, grid)
    truth = truth._replace(t=truth.t.at[0].add(
        0.1 * jnp.exp(-(jnp.arange(cfg.shape2d[1]) - 5.0)[None, None, :] ** 2)))
    jj, ii = np.meshgrid(np.arange(2, 8), np.arange(2, 8),
                         indexing="ij")
    obs = Observations(
        field="temp", step=nsteps,
        indices=jnp.asarray(np.stack([np.full(jj.size, cfg.N - 1),
                                      jj.ravel(), ii.ravel()], 1)),
        values=None, error=0.01)
    vals = observe_trajectory(model, grid, truth, obs, nsteps)
    return obs._replace(values=vals)


def test_split_phases_match_single_call(tmp_path):
    nsteps = 3
    n_inner = 5
    cfg, grid, model = make_model()
    x_b = upwelling.make_initial(cfg, grid)
    obs = make_obs(cfg, model, grid, nsteps)
    zc = jnp.zeros_like(x_b.zeta)
    sigmas = Control(zeta=zc + 0.0, u=jnp.zeros_like(x_b.u),
                     v=jnp.zeros_like(x_b.v),
                     t=jnp.zeros_like(x_b.t) + 0.2)

    x_single, diag_single = i4dvar(model, grid, x_b, obs, nsteps,
                                   sigmas, n_inner=n_inner, n_outer=1)

    # three phases, each on a FRESH model object (separate execution)
    exdir = str(tmp_path / "exchange")
    _, grid1, m1 = make_model()
    d1 = phase_background(m1, grid1, x_b, obs, nsteps, exdir)
    _, grid2, m2 = make_model()
    d2 = phase_increment(m2, grid2, obs, nsteps, sigmas, exdir,
                         n_inner=n_inner)
    _, grid3, m3 = make_model()
    x_split, d3 = phase_analysis(m3, grid3, obs, nsteps, exdir)

    np.testing.assert_allclose(np.asarray(x_split.t),
                               np.asarray(x_single.t), atol=1e-12)
    np.testing.assert_allclose(np.asarray(x_split.zeta),
                               np.asarray(x_single.zeta), atol=1e-12)
    assert d3["rms_innovation_a"] < d1["rms_innovation_b"]
    np.testing.assert_allclose(d2["residual_history"],
                               diag_single["residual_history"],
                               rtol=1e-10)
    # exchange artifacts exist (the file-only hand-off)
    import os
    for f in ("background.npz", "increment.npz", "analysis.npz"):
        assert os.path.exists(os.path.join(exdir, f))
