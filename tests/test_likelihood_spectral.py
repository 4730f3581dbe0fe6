"""End-to-end spectral-siren (catalog-free) hyper-likelihood tests.

This is the framework's first golden gate (SURVEY.md 7.2 item 4): the
equivalent of reference examples/test1dspectral.ipynb — an H0 scan over a
fiducial mock catalog must peak near the injected H0=70.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from chimera_tpu import HyperLikelihood, SelectionFunction
from chimera_tpu.likelihood import log_hyperlikelihood


@pytest.fixture(scope="module")
def hyperlike(fiducial_population, mock_catalog, mock_injections, mock_z_grids):
    theta_inj, n_inj = mock_injections
    sel = SelectionFunction.create(theta_inj, n_inj, n_eff_min=5.0)
    return HyperLikelihood.create(
        theta_gw=mock_catalog,
        z_grids=mock_z_grids,
        population=fiducial_population,
        selection=sel,
        kernel="epan",
        binning=True,
        num_bins=100,
    )


def test_loglike_finite_at_fiducial(hyperlike):
    val = float(hyperlike.log_like(H0=70.0))
    assert np.isfinite(val)


def test_h0_scan_peaks_near_fiducial(hyperlike):
    h0_grid = jnp.linspace(40.0, 120.0, 17)
    logls = hyperlike.log_like_batch({"H0": h0_grid})
    logls = np.asarray(logls)
    assert np.isfinite(logls).all()
    h0_best = float(h0_grid[np.argmax(logls)])
    # Mock catalog of 16 events: generous tolerance around the truth.
    assert 55.0 <= h0_best <= 90.0


def test_batch_matches_serial(hyperlike):
    h0s = jnp.array([60.0, 70.0, 85.0])
    batch = np.asarray(hyperlike.log_like_batch({"H0": h0s}))
    serial = np.array([float(hyperlike.log_like(H0=float(h))) for h in h0s])
    np.testing.assert_allclose(batch, serial, rtol=1e-10)


def test_multi_parameter_update(hyperlike):
    val = float(hyperlike.log_like(H0=75.0, Om0=0.3, alpha=3.0, gamma=2.5))
    assert np.isfinite(val)


def test_gradient_wrt_h0(hyperlike):
    # jit the grad: one compiled (and persistently cached) program instead
    # of an eager op-by-op backward sweep on the 1-core test box.
    g = jax.jit(jax.grad(
        lambda h0: log_hyperlikelihood(hyperlike, {"H0": h0})))(
        jnp.asarray(70.0))
    assert np.isfinite(float(g))


def test_compute_all_decomposition(hyperlike):
    log_evs, log_num, log_nexp, log_hyper = hyperlike.compute_all(H0=70.0)
    assert log_evs.shape == (hyperlike.n_events,)
    np.testing.assert_allclose(float(jnp.sum(log_evs)), float(log_num), rtol=1e-12)
    np.testing.assert_allclose(
        float(log_num - hyperlike.n_events * log_nexp), float(log_hyper),
        rtol=1e-10)


def test_scale_free_vs_rate_convention(hyperlike, fiducial_population):
    """Non-scale-free likelihood with R0 chosen so N_exp = N_ev should rank
    H0 values consistently with the scale-free one near the peak."""
    from chimera_tpu import pytree

    pop_nsf = pytree.replace(fiducial_population, scale_free=False)
    hl_nsf = pytree.replace(hyperlike, population=pop_nsf)
    v = float(hl_nsf.log_like(H0=70.0))
    assert np.isfinite(v)


def test_unbinned_close_to_binned(hyperlike):
    from chimera_tpu import pytree

    hl_nb = pytree.replace(hyperlike, binning=False)
    a = float(hyperlike.log_like(H0=70.0))
    b = float(hl_nb.log_like(H0=70.0))
    # Binning is a controlled approximation; per-event logs agree to ~1%.
    assert abs(a - b) / abs(b) < 0.05


def test_neff_gate_zeroes_events(hyperlike):
    """At absurd cosmologies, events fall outside the mass model's support;
    the gate must turn them into -inf log-contributions, not NaNs."""
    val = hyperlike.log_like(H0=15.0)
    assert not np.isnan(float(val))
