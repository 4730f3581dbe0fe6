"""ChEES-HMC: correctness on analytic targets, adaptation sanity, and the
ESS-per-gradient edge over fixed-length HMC that justifies its existence
(VERDICT round-2 item 7; no reference counterpart — the reference's only
sampler is emcee, utils/emcee_utils.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from chimera_tpu.inference.chees import run_chees
from chimera_tpu.inference.diagnostics import effective_sample_size, rhat
from chimera_tpu.inference.hmc import run_hmc


def test_diagnostics_iid_gaussian():
    """On S x C iid draws ESS ~= S*C and split-Rhat ~= 1."""
    x = jax.random.normal(jax.random.PRNGKey(0), (1000, 8, 2))
    ess = np.asarray(effective_sample_size(x))
    assert ess.shape == (2,)
    assert (ess > 0.5 * 8000).all() and (ess < 1.6 * 8000).all()
    r = np.asarray(rhat(x))
    np.testing.assert_allclose(r, 1.0, atol=0.02)


def test_diagnostics_detect_correlation_and_nonmixing():
    key = jax.random.PRNGKey(1)
    eps = jax.random.normal(key, (2000, 4))
    # AR(1) with rho=0.9: true ESS factor (1-rho)/(1+rho) ~= 1/19
    def ar_step(x, e):
        x = 0.9 * x + jnp.sqrt(1 - 0.81) * e
        return x, x
    _, chain = jax.lax.scan(ar_step, jnp.zeros(4), eps)
    ess = float(effective_sample_size(chain)[0])
    assert ess < 0.12 * 8000  # far below nominal
    # non-mixing chains (disjoint offsets) must trip Rhat
    bad = chain + jnp.arange(4)[None, :] * 10.0
    assert float(rhat(bad)[0]) > 2.0


def test_chees_recovers_gaussian():
    """Anisotropic correlated Gaussian: moments + adapted trajectory."""
    cov = jnp.array([[1.0, 0.8], [0.8, 2.0]])
    prec = jnp.linalg.inv(cov)
    mu = jnp.array([1.0, -2.0])

    def logp(y):
        d = y - mu
        return -0.5 * d @ prec @ d

    y0 = jnp.zeros((16, 2))
    ys, stats = run_chees(jax.random.PRNGKey(0), logp, y0,
                          n_warmup=400, n_samples=600)
    flat = np.asarray(ys[100:]).reshape(-1, 2)
    np.testing.assert_allclose(flat.mean(0), np.asarray(mu), atol=0.15)
    np.testing.assert_allclose(np.cov(flat.T), np.asarray(cov), atol=0.45)
    acc = float(np.mean(stats["accept"]))
    assert 0.4 < acc <= 1.0
    # adaptation produced a finite learned trajectory time (mean leapfrog
    # steps ~ t/(2 eps) because of the Halton jitter, so the count itself
    # can legitimately be small on an easy target)
    assert np.isfinite(float(stats["trajectory_time"]))
    assert float(stats["trajectory_time"]) >= float(stats["step_size"])
    assert float(rhat(ys).max()) < 1.1


def test_chees_ess_per_gradient_beats_fixed_hmc():
    """The point of ChEES: >=2x ESS per gradient evaluation vs fixed
    n_leapfrog HMC on an ill-conditioned Gaussian (condition number 100 —
    the regime where one global trajectory length is hard to pick by hand).
    Gradient evaluations, not wall time, so the test is hardware-neutral."""
    var = jnp.array([1.0, 0.01])

    def logp(y):
        return -0.5 * jnp.sum(y * y / var)

    c = 16
    y0 = 0.1 * jax.random.normal(jax.random.PRNGKey(3), (c, 2))
    n_s = 600

    ys_f, stats_f = run_hmc(jax.random.PRNGKey(4), logp, y0,
                            n_warmup=400, n_samples=n_s, n_leapfrog=8)
    grads_f = n_s * 8 * c
    ess_f = float(effective_sample_size(ys_f).min())

    ys_c, stats_c = run_chees(jax.random.PRNGKey(4), logp, y0,
                              n_warmup=400, n_samples=n_s)
    grads_c = float(np.asarray(stats_c["steps_total"])) * c
    ess_c = float(effective_sample_size(ys_c).min())

    ratio = (ess_c / grads_c) / (ess_f / grads_f)
    assert ratio > 2.0, (
        f"ChEES ESS/grad {ess_c / grads_c:.4f} vs fixed {ess_f / grads_f:.4f}"
        f" (ratio {ratio:.2f})")


@pytest.mark.slow
def test_hyperposterior_chees_smoke(fiducial_population, mock_catalog,
                                    mock_injections, mock_z_grids):
    from chimera_tpu import HyperLikelihood, SelectionFunction
    from chimera_tpu.inference.chees import sample_hyperposterior_chees

    theta_inj, n_inj = mock_injections
    sel = SelectionFunction.create(theta_inj, n_inj)
    hl = HyperLikelihood.create(mock_catalog, mock_z_grids,
                                fiducial_population, sel, num_bins=64)
    samples, stats = sample_hyperposterior_chees(
        jax.random.PRNGKey(0), hl, ["H0"], {"H0": (40.0, 120.0)},
        init={"H0": 75.0}, n_chains=2, n_warmup=40, n_samples=40,
        max_steps=16)
    h0 = np.asarray(samples["H0"])
    assert h0.shape == (40, 2)
    assert np.isfinite(h0).all()
    assert (h0 > 40.0).all() and (h0 < 120.0).all()
    assert h0.std() > 0.0
