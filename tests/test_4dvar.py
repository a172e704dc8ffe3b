"""Incremental 4D-Var twin experiment (the reference's I4D-Var driver,
Drivers/i4dvar.F): observations generated from a 'true' run must pull a
perturbed background toward the truth."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from roms_tpu.assim.i4dvar import Control, Observations, i4dvar
from roms_tpu.core.stepping import Model
from roms_tpu.functionals import upwelling


@pytest.mark.slow
def test_i4dvar_twin_experiment():
    cfg = upwelling.make_config(Lm=10, Mm=10, N=5, dtype="float64")
    grid = upwelling.make_grid(cfg)
    model = Model(cfg, grid, upwelling.make_forcing_fn(cfg, grid),
                  upwelling.make_vmix_fn(cfg))

    x0 = model.run(upwelling.make_initial(cfg, grid), 2)

    # truth = background + smooth temperature anomaly
    key = jax.random.PRNGKey(7)
    bump = 0.5 * jnp.exp(
        -((jnp.arange(cfg.shape2d[0])[:, None] - 5.0) ** 2
          + (jnp.arange(cfg.shape2d[1])[None, :] - 5.0) ** 2) / 8.0)
    t_true = x0.t.at[0].add(bump[None])
    x_true = x0._replace(t=t_true)

    nsteps, obs_step = 3, 3
    # observe temperature everywhere in the interior at the final step
    jj, ii = np.meshgrid(np.arange(1, cfg.shape2d[0] - 1),
                         np.arange(1, cfg.shape2d[1] - 1), indexing="ij")
    kk = np.full_like(jj, cfg.N - 1)
    idx = jnp.asarray(np.stack([kk.ravel(), jj.ravel(), ii.ravel()],
                               axis=1))

    from roms_tpu.assim.i4dvar import observe_trajectory
    obs_field = "temp"
    y = observe_trajectory(model, grid,
                           x_true, Observations(obs_step, obs_field, idx,
                                                None, 0.1), nsteps)
    obs = Observations(step=obs_step, field=obs_field, indices=idx,
                       values=y, error=0.05)

    sig = Control(zeta=0.01, u=0.01, v=0.01, t=0.3)
    x_a, stats = i4dvar(model, grid, x0, obs, nsteps, sig,
                        n_inner=5, n_outer=1)

    # analysis fits the observations much better than the background
    assert stats["rms_innovation_a"] < 0.35 * stats["rms_innovation_b"]
    # and the analysis increment points toward the true anomaly
    dT = np.asarray(x_a.t[0, -1] - x0.t[0, -1])
    truth = np.asarray(bump)
    corr = np.corrcoef(dT[1:-1, 1:-1].ravel(),
                       truth[1:-1, 1:-1].ravel())[0, 1]
    assert corr > 0.6, corr


@pytest.mark.slow
def test_rbl4dvar_twin_experiment():
    """Dual (observation-space) formulation reaches the same kind of
    innovation reduction as the primal solver (Drivers/rbl4dvar.h)."""
    from roms_tpu.assim.i4dvar import observe_trajectory, rbl4dvar
    cfg = upwelling.make_config(Lm=10, Mm=10, N=5, dtype="float64")
    grid = upwelling.make_grid(cfg)
    model = Model(cfg, grid, upwelling.make_forcing_fn(cfg, grid),
                  upwelling.make_vmix_fn(cfg))
    x0 = model.run(upwelling.make_initial(cfg, grid), 2)
    bump = 0.5 * jnp.exp(
        -((jnp.arange(cfg.shape2d[0])[:, None] - 5.0) ** 2
          + (jnp.arange(cfg.shape2d[1])[None, :] - 5.0) ** 2) / 8.0)
    x_true = x0._replace(t=x0.t.at[0].add(bump[None]))

    nsteps, obs_step = 3, 3
    jj, ii = np.meshgrid(np.arange(1, cfg.shape2d[0] - 1),
                         np.arange(1, cfg.shape2d[1] - 1), indexing="ij")
    kk = np.full_like(jj, cfg.N - 1)
    idx = jnp.asarray(np.stack([kk.ravel(), jj.ravel(), ii.ravel()],
                               axis=1))
    obs0 = Observations(field="temp", step=obs_step, indices=idx,
                        values=jnp.zeros(idx.shape[0]), error=0.05)
    y_true = observe_trajectory(model, grid, x_true, obs0, nsteps)
    obs = obs0._replace(values=y_true)

    sig = Control(zeta=0.01, u=0.01, v=0.01, t=0.3)
    d0 = float(jnp.abs(
        y_true - observe_trajectory(model, grid, x0, obs0, nsteps)).max())
    x_a, stats = rbl4dvar(model, grid, x0, obs, nsteps, sig,
                          n_inner=5, n_outer=1)
    assert stats["final_innovation"] < 0.5 * d0, (stats, d0)


def test_normalization_factors_unitize_variance():
    """normalization.F randomized method: after dividing by the
    estimated factors, B^{1/2} probes have ~unit variance."""
    from roms_tpu.assim.i4dvar import (Control, compute_normalization,
                                       make_bsqrt)
    import jax
    shp = (8, 10)
    tmpl = Control(zeta=jnp.zeros(shp), u=jnp.zeros((3,) + shp),
                   v=jnp.zeros((3,) + shp), t=jnp.zeros((2, 3) + shp))
    bsqrt = make_bsqrt(Control(zeta=1.0, u=1.0, v=1.0, t=1.0),
                       smooth=2)
    norm = compute_normalization(bsqrt, tmpl, nsamples=128)
    # apply a fresh probe and normalize: variance near 1 in interior
    key = jax.random.PRNGKey(99)
    ks = jax.random.split(key, 4)
    probe = Control(*[jax.random.normal(k, jnp.shape(x))
                      for k, x in zip(ks, jax.tree_util.tree_leaves(
                          tmpl))])
    out = bsqrt(probe)
    z = np.asarray(out.zeta / norm.zeta)
    # a single realization: check the magnitude scale is O(1), far
    # from the raw smoothed variance which is much smaller
    assert 0.2 < np.abs(z).std() < 3.0
    raw = np.asarray(out.zeta)
    assert raw.std() < 0.9     # smoothing shrank the raw variance


def test_quality_control_rejects_outliers():
    from roms_tpu.assim.i4dvar import Observations, quality_control
    vals = jnp.asarray([1.0, 2.0, 50.0, 3.0])
    yb = jnp.asarray([1.1, 1.8, 2.0, 2.9])
    obs = Observations(field="temp", step=1,
                       indices=jnp.zeros((4, 3), jnp.int32),
                       values=vals, error=0.5)
    obs_qc, reject = quality_control(obs, yb, threshold=4.0)
    assert bool(reject[2]) and not bool(reject[0])
    assert float(obs_qc.error[2]) > 1.0e9
    assert float(obs_qc.error[0]) == 0.5


def test_obs_file_roundtrip(tmp_path):
    """s4dvar observation survey files: write -> read -> convert to
    Observations feeds the solvers unchanged."""
    import os
    from roms_tpu.io.obs import (read_obs_file, to_observations,
                                 write_obs_file)
    n = 12
    rng = np.random.default_rng(3)
    X = rng.integers(1, 8, n).astype(float)
    Y = rng.integers(1, 8, n).astype(float)
    Z = np.full(n, 4.0)
    vals = rng.standard_normal(n)
    errs = np.full(n, 0.1)
    path = os.path.join(tmp_path, "obs.nc")
    write_obs_file(path, "temp", 3600.0, X, Y, Z, vals, errs)
    data = read_obs_file(path)
    assert (data["type"] == 6).all()
    np.testing.assert_allclose(data["value"], vals)
    obs = to_observations(data, "temp", step=3, dt=300.0)
    assert obs.indices.shape == (n, 3)
    np.testing.assert_allclose(np.asarray(obs.values), vals)
