"""Ensemble-sampler and checkpoint tests."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from chimera_tpu.inference import (
    init_state,
    initialize_walkers,
    latest_chain_file,
    load_chain,
    load_state,
    make_vector_log_prob,
    next_chain_file,
    run,
    save_chain,
    step,
)


def _gauss_logprob(mu, sig):
    def f(x):  # (n, d) -> (n,)
        return -0.5 * jnp.sum(((x - mu) / sig) ** 2, axis=-1)
    return f


def test_sampler_recovers_gaussian():
    """Stretch-move ensemble samples a 3-D Gaussian with correct moments."""
    mu = jnp.array([1.0, -2.0, 0.5])
    sig = jnp.array([0.5, 2.0, 1.0])
    logp = _gauss_logprob(mu, sig)
    key = jax.random.PRNGKey(0)
    coords = mu + 0.1 * jax.random.normal(key, (64, 3))
    state = init_state(jax.random.PRNGKey(1), coords, logp)
    state, hist = run(state, logp, n_steps=3000, thin=10)
    # discard burn-in
    samples = np.asarray(hist["coords"][100:]).reshape(-1, 3)
    np.testing.assert_allclose(samples.mean(axis=0), np.asarray(mu), atol=0.12)
    np.testing.assert_allclose(samples.std(axis=0), np.asarray(sig), rtol=0.12)
    acc = float(state.n_accepted.mean()) / int(state.iteration)
    assert 0.1 < acc < 0.9


def test_step_is_jittable():
    logp = _gauss_logprob(jnp.zeros(2), jnp.ones(2))
    coords = jax.random.normal(jax.random.PRNGKey(0), (16, 2))
    state = init_state(jax.random.PRNGKey(1), coords, logp)
    jitted = jax.jit(lambda s: step(s, logp))
    s1 = jitted(state)
    assert int(s1.iteration) == 1
    assert s1.coords.shape == (16, 2)


def test_vector_log_prob_bounds(fiducial_population, mock_catalog,
                                mock_injections, mock_z_grids):
    from chimera_tpu import HyperLikelihood, SelectionFunction

    theta_inj, n_inj = mock_injections
    sel = SelectionFunction.create(theta_inj, n_inj)
    hl = HyperLikelihood.create(mock_catalog, mock_z_grids,
                                fiducial_population, sel, num_bins=100)
    f = make_vector_log_prob(hl, ["H0"], bounds={"H0": (40.0, 120.0)})
    vals = np.asarray(f(jnp.array([[70.0], [30.0], [130.0]])))
    assert np.isfinite(vals[0])
    assert vals[1] == -np.inf and vals[2] == -np.inf


def test_initialize_walkers_bounds():
    key = jax.random.PRNGKey(2)
    x = initialize_walkers(key, {"H0": 70.0, "Om0": 0.3}, 32, ["H0", "Om0"],
                           scale={"H0": 5.0, "Om0": 0.05},
                           bounds={"H0": (40, 120), "Om0": (0.05, 0.95)})
    assert x.shape == (32, 2)
    assert (np.asarray(x[:, 0]) >= 40).all() and (np.asarray(x[:, 0]) <= 120).all()


def test_checkpoint_roundtrip(tmp_path):
    logp = _gauss_logprob(jnp.zeros(2), jnp.ones(2))
    coords = jax.random.normal(jax.random.PRNGKey(0), (16, 2))
    state = init_state(jax.random.PRNGKey(1), coords, logp)
    state, hist = run(state, logp, n_steps=20, thin=2)

    prefix = os.path.join(tmp_path, "chain")
    path = next_chain_file(prefix)
    assert path.endswith("_0.h5")
    save_chain(path, state, hist, ["a", "b"])
    assert latest_chain_file(prefix) == path
    assert next_chain_file(prefix).endswith("_1.h5")

    state2, names = load_state(path)
    assert names == ["a", "b"]
    np.testing.assert_array_equal(np.asarray(state2.coords),
                                  np.asarray(state.coords))
    np.testing.assert_array_equal(np.asarray(state2.key), np.asarray(state.key))
    chain = load_chain(path)
    assert chain["chain"].shape == (10, 16, 2)

    # resumed run continues deterministically vs an unbroken run
    s_resume, _ = run(state2, logp, n_steps=10, thin=10)
    s_full, _ = run(state, logp, n_steps=10, thin=10)
    np.testing.assert_allclose(np.asarray(s_resume.coords),
                               np.asarray(s_full.coords), rtol=1e-12)


@pytest.mark.slow
def test_end_to_end_h0_sampling(fiducial_population, mock_catalog,
                                mock_injections, mock_z_grids):
    """Short MCMC over H0 on the mock spectral-siren likelihood: walkers
    concentrate in a sane H0 region around the truth."""
    from chimera_tpu import HyperLikelihood, SelectionFunction

    theta_inj, n_inj = mock_injections
    sel = SelectionFunction.create(theta_inj, n_inj)
    hl = HyperLikelihood.create(mock_catalog, mock_z_grids,
                                fiducial_population, sel, num_bins=100)
    logp = make_vector_log_prob(hl, ["H0"], bounds={"H0": (40.0, 120.0)})
    walkers = initialize_walkers(jax.random.PRNGKey(3), {"H0": 70.0}, 16,
                                 ["H0"], scale={"H0": 10.0},
                                 bounds={"H0": (40.0, 120.0)})
    state = init_state(jax.random.PRNGKey(4), walkers, logp)
    state, hist = run(state, logp, n_steps=60, thin=10)
    samples = np.asarray(hist["coords"][2:]).ravel()
    assert 50.0 < np.median(samples) < 95.0
