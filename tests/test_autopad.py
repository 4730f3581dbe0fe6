"""Auto-padding to fused-kernel tiling (round-2 item: no silent fallback).

``HyperLikelihood.create`` pads unbinned configurations to the fused
kernel's tiles — events to %8 (mask-exact, parallel.pad_events), PE samples
to %128 (zero-weight replicas of the max-dL sample; the XLA path statically
slices them back, the kernel corrects its z-moments through the logical-row
machinery).  These tests pin down:

* exact invariance: padded evaluation == unpadded evaluation (raw
  constructor bypassing create), both engines;
* no silent fallback: every unbinned config in the matrix is fused-eligible
  after create();
* differentiability: fused-vs-XLA gradient parity through the kernel's
  custom VJP, with padding present.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from chimera_tpu import HyperLikelihood, SelectionFunction, pytree
from chimera_tpu.catalog import EmptyCatalog
from chimera_tpu.data.mock import make_mock_catalog, make_mock_injections
from chimera_tpu.likelihood import (
    _fused_eligible,
    _resolved_batch_engine,
    log_hyperlikelihood_batch,
)
from chimera_tpu.models import (
    FLRW,
    MadauDickinsonRate,
    Population,
    PowerLawPeak,
    compute_z_grids,
)


@pytest.fixture(scope="module")
def odd_setup():
    """11 events x 200 samples — neither axis tiles without padding."""
    cosmo = FLRW.create(H0=70.0, Om0=0.25, z_grid_res=500)
    pop = Population.create(cosmo, PowerLawPeak.create(grid_res=500),
                            MadauDickinsonRate.create(),
                            gal_cat=EmptyCatalog())
    cat = make_mock_catalog(jax.random.PRNGKey(42), pop, n_events=11,
                            n_samples=200, snr_threshold=12.0)
    inj, n_gen = make_mock_injections(jax.random.PRNGKey(7), pop,
                                      n_generated=20_000, snr_threshold=12.0)
    z_grids = compute_z_grids(cosmo, cat, cosmo_prior={"H0": [40.0, 120.0]},
                              z_int_res=64)
    sel = SelectionFunction.create(inj, n_gen)
    return cat, z_grids, pop, sel


def test_create_pads_to_fused_tiles(odd_setup):
    cat, z_grids, pop, sel = odd_setup
    hl = HyperLikelihood.create(cat, z_grids, pop, sel, binning=False)
    assert hl.n_events == 16 and hl.theta_gw.n_samples == 256
    assert hl.n_samples_real == 200 and hl.n_events_input == 11
    assert int(hl.n_events_real) == 11
    assert _fused_eligible(hl), "odd shapes must not lose the fused path"
    # explicit request must not raise (the old silent-fallback bug's dual)
    _resolved_batch_engine(pytree.replace(hl, kde_engine="fused"))


@pytest.mark.parametrize("cut_grid", [2.0, None])
def test_padding_is_invariant(odd_setup, cut_grid):
    """Padded create() == raw unpadded constructor, XLA engine, f64."""
    cat, z_grids, pop, sel = odd_setup
    hl = HyperLikelihood.create(cat, z_grids, pop, sel, binning=False,
                                cut_grid=cut_grid, kde_engine="xla")
    # raw constructor: no padding at all
    from chimera_tpu.likelihood import _sort_samples_by_distance

    hl_raw = HyperLikelihood(
        theta_gw=_sort_samples_by_distance(cat.with_derived()),
        z_grids=z_grids, population=pop, selection=sel, kind="1d",
        binning=False, cut_grid=cut_grid, kde_engine="xla")
    h0s = jnp.linspace(55.0, 95.0, 5)
    a = np.asarray(log_hyperlikelihood_batch(hl, {"H0": h0s}))
    b = np.asarray(log_hyperlikelihood_batch(hl_raw, {"H0": h0s}))
    np.testing.assert_allclose(a, b, rtol=1e-12)


def test_fused_matches_xla_with_padding(odd_setup):
    cat, z_grids, pop, sel = odd_setup
    hl = HyperLikelihood.create(cat, z_grids, pop, sel, binning=False)
    h0s = jnp.linspace(55.0, 95.0, 4)
    a = np.asarray(log_hyperlikelihood_batch(
        pytree.replace(hl, kde_engine="xla"), {"H0": h0s}))
    b = np.asarray(log_hyperlikelihood_batch(
        pytree.replace(hl, kde_engine="fused"), {"H0": h0s}))
    assert np.isfinite(b).all()
    np.testing.assert_allclose(b, a, rtol=1e-8)


@pytest.mark.slow
def test_fused_grad_matches_xla(odd_setup):
    """The kernel's custom VJP: gradient parity with the XLA path, padding
    present (round-2 item 2)."""
    cat, z_grids, pop, sel = odd_setup
    hl = HyperLikelihood.create(cat, z_grids, pop, sel, binning=False)

    def scan_loss(hl_eng):
        def f(h0):
            batch = {"H0": jnp.stack([h0, h0 + 2.0]),
                     "Om0": jnp.array([0.25, 0.30])}
            return jnp.sum(log_hyperlikelihood_batch(hl_eng, batch))
        return f

    gf = jax.grad(scan_loss(pytree.replace(hl, kde_engine="fused")))(70.0)
    gx = jax.grad(scan_loss(pytree.replace(hl, kde_engine="xla")))(70.0)
    assert np.isfinite(float(gf))
    np.testing.assert_allclose(float(gf), float(gx), rtol=1e-6)


def test_compute_all_drops_padding_rows(odd_setup):
    cat, z_grids, pop, sel = odd_setup
    hl = HyperLikelihood.create(cat, z_grids, pop, sel, binning=False)
    log_evs, log_num, log_nexp, log_hyper = hl.compute_all(H0=70.0)
    assert log_evs.shape == (11,)
    np.testing.assert_allclose(float(jnp.sum(log_evs)), float(log_num),
                               rtol=1e-12)
