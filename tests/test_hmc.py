"""HMC sampler: correctness on analytic targets + hyper-posterior smoke."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from chimera_tpu.inference.hmc import (
    Transform,
    make_transformed_log_prob,
    run_hmc,
    sample_hyperposterior,
)


def test_transform_roundtrip_and_jacobian():
    tr = Transform(jnp.array([0.0, -jnp.inf, 2.0, -jnp.inf]),
                   jnp.array([1.0, jnp.inf, jnp.inf, 5.0]))
    x = jnp.array([0.3, -1.7, 4.2, 1.0])
    y = tr.unconstrain(x)
    np.testing.assert_allclose(np.asarray(tr.constrain(y)), np.asarray(x),
                               rtol=1e-10)
    # log-Jacobian == log|det d constrain/dy| via autodiff
    jac = jax.jacobian(tr.constrain)(y)
    expect = np.log(np.abs(np.linalg.det(np.asarray(jac))))
    np.testing.assert_allclose(float(tr.log_jacobian(y)), expect, rtol=1e-8)


def test_hmc_recovers_gaussian():
    """Anisotropic Gaussian: sample mean/cov match after adaptation."""
    cov = jnp.array([[1.0, 0.6], [0.6, 2.0]])
    prec = jnp.linalg.inv(cov)
    mu = jnp.array([1.0, -2.0])

    def logp(y):
        d = y - mu
        return -0.5 * d @ prec @ d

    y0 = jnp.zeros((8, 2))
    ys, stats = run_hmc(jax.random.PRNGKey(0), logp, y0,
                        n_warmup=300, n_samples=700, n_leapfrog=8)
    flat = np.asarray(ys[100:]).reshape(-1, 2)
    np.testing.assert_allclose(flat.mean(0), np.asarray(mu), atol=0.15)
    np.testing.assert_allclose(np.cov(flat.T), np.asarray(cov), atol=0.4)
    acc = float(np.mean(stats["accept"]))
    assert 0.5 < acc <= 1.0


def test_hmc_bounded_target():
    """Beta(2,3)-like bounded target through the logit transform."""
    def log_density_x(x):
        return jnp.log(x) + 2.0 * jnp.log(1.0 - x)

    tr = Transform(jnp.array([0.0]), jnp.array([1.0]))

    def logp(y):
        x = tr.constrain(y)
        return jnp.sum(log_density_x(x)) + tr.log_jacobian(y)

    y0 = tr.unconstrain(jnp.full((6, 1), 0.5))
    ys, _ = run_hmc(jax.random.PRNGKey(1), logp, y0,
                    n_warmup=300, n_samples=600, n_leapfrog=8)
    xs = np.asarray(jax.vmap(jax.vmap(tr.constrain))(ys))[100:].ravel()
    assert (xs > 0).all() and (xs < 1).all()
    np.testing.assert_allclose(xs.mean(), 2.0 / 5.0, atol=0.05)  # Beta(2,3)


@pytest.mark.slow
def test_hyperposterior_hmc_smoke(fiducial_population, mock_catalog,
                                  mock_injections, mock_z_grids):
    from chimera_tpu import HyperLikelihood, SelectionFunction

    theta_inj, n_inj = mock_injections
    sel = SelectionFunction.create(theta_inj, n_inj)
    hl = HyperLikelihood.create(mock_catalog, mock_z_grids,
                                fiducial_population, sel, num_bins=64)
    samples, stats = sample_hyperposterior(
        jax.random.PRNGKey(0), hl, ["H0"], {"H0": (40.0, 120.0)},
        init={"H0": 75.0}, n_chains=2, n_warmup=40, n_samples=40,
        n_leapfrog=5)
    h0 = np.asarray(samples["H0"])
    assert h0.shape == (40, 2)
    assert np.isfinite(h0).all()
    assert (h0 > 40.0).all() and (h0 < 120.0).all()
    # chains moved and stayed in a plausible region
    assert h0.std() > 0.0


def test_hmc_checkpoint_resume(tmp_path):
    """save_hmc/load_hmc/continue_hmc: a split run equals its state chain
    (the gradient-sampler analog of the ensemble's numbered-file restart)."""
    from chimera_tpu.inference import continue_hmc, load_hmc, save_hmc

    cov = jnp.array([[1.0, 0.3], [0.3, 0.5]])
    prec = jnp.linalg.inv(cov)

    def logp(y):
        return -0.5 * y @ prec @ y

    y0 = jnp.zeros((4, 2))
    ys, stats = run_hmc(jax.random.PRNGKey(0), logp, y0,
                        n_warmup=100, n_samples=50, n_leapfrog=6)
    key_next = jax.random.PRNGKey(99)
    f = str(tmp_path / "hmc_0.h5")
    save_hmc(f, ys, stats, key_next, ["a", "b"])

    state, eps, inv_mass, key, names = load_hmc(f)
    assert names == ["a", "b"]
    np.testing.assert_allclose(np.asarray(state.y),
                               np.asarray(stats["final_state"].y))
    np.testing.assert_allclose(float(eps), float(stats["step_size"]))

    ys2, stats2 = continue_hmc(key, logp, state, eps, inv_mass,
                               n_samples=50, n_leapfrog=6)
    assert ys2.shape == (50, 4, 2)
    assert np.isfinite(np.asarray(stats2["log_prob"])).all()
    # resuming twice from the same checkpoint is deterministic
    ys3, _ = continue_hmc(key, logp, state, eps, inv_mass,
                          n_samples=50, n_leapfrog=6)
    np.testing.assert_allclose(np.asarray(ys2), np.asarray(ys3))
