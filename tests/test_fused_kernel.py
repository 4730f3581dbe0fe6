"""Fully-fused Pallas hot-loop kernel: parity with the stage-by-stage XLA
path (interpret mode on CPU; the same kernel compiles for real on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from chimera_tpu import HyperLikelihood, SelectionFunction, pytree
from chimera_tpu.likelihood import (
    _fused_eligible,
    _log_hyperlikelihood_batch_fused,
    log_hyperlikelihood_batch,
)


@pytest.fixture(scope="module")
def spectral_hl(fiducial_population, mock_catalog, mock_injections,
                mock_z_grids):
    theta_inj, n_inj = mock_injections
    sel = SelectionFunction.create(theta_inj, n_inj)
    return HyperLikelihood.create(mock_catalog, mock_z_grids,
                                  fiducial_population, sel, binning=False)


def test_eligibility(spectral_hl):
    assert _fused_eligible(spectral_hl)
    assert _fused_eligible(pytree.replace(spectral_hl, cut_grid=None))
    assert not _fused_eligible(pytree.replace(spectral_hl, binning=True))


@pytest.mark.parametrize("kernel", ["epan", "gauss"])
@pytest.mark.parametrize("cut_grid", [2.0, None])
def test_fused_matches_vmap_path(spectral_hl, kernel, cut_grid):
    hl = pytree.replace(spectral_hl, kernel=kernel, cut_grid=cut_grid)
    h0s = jnp.linspace(55.0, 95.0, 5)
    expect = np.asarray(log_hyperlikelihood_batch(hl, {"H0": h0s}))
    got = np.asarray(_log_hyperlikelihood_batch_fused(hl, {"H0": h0s}))
    np.testing.assert_allclose(got, expect, rtol=1e-8)


def test_fused_multi_param(spectral_hl):
    batch = {"H0": jnp.array([65.0, 75.0]), "Om0": jnp.array([0.2, 0.35]),
             "mu_g": jnp.array([33.0, 35.0])}
    expect = np.asarray(log_hyperlikelihood_batch(spectral_hl, batch))
    got = np.asarray(_log_hyperlikelihood_batch_fused(spectral_hl, batch))
    assert np.isfinite(got).all()
    np.testing.assert_allclose(got, expect, rtol=1e-8)


def test_fused_respects_event_mask(spectral_hl):
    """Padding events (zero mask) must not change the result."""
    from chimera_tpu.parallel import pad_events

    hl_pad = pad_events(spectral_hl, 16)  # 24 -> 32 events
    h0s = jnp.linspace(60.0, 90.0, 3)
    a = np.asarray(_log_hyperlikelihood_batch_fused(spectral_hl, {"H0": h0s}))
    b = np.asarray(_log_hyperlikelihood_batch_fused(hl_pad, {"H0": h0s}))
    np.testing.assert_allclose(b, a, rtol=1e-10)
