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
from chimera_tpu.likelihood import (
    _fused_eligible,
    _resolved_batch_engine,
    log_hyperlikelihood_batch,
)
from chimera_tpu.models import compute_z_grids


@pytest.fixture(scope="module")
def odd_setup(fiducial_population, mock_catalog, mock_injections):
    """11 events x 200 samples — neither axis tiles without padding.

    The odd-shaped catalog is SLICED out of the session mock (a PE cloud
    restricted to fewer samples is still a valid PE cloud) — regenerating
    mocks at the odd shapes would recompile the whole generator chain for
    shapes used nowhere else.
    """
    import jax.tree_util as jtu

    pop = fiducial_population
    cat = jtu.tree_map(lambda a: a[:11, :200] if a.ndim == 2 else a[:11],
                       mock_catalog)
    inj, n_gen = mock_injections
    z_grids = compute_z_grids(pop.cosmo, cat,
                              cosmo_prior={"H0": [40.0, 120.0]},
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
    h0s = jnp.linspace(55.0, 95.0, 3)
    a = np.asarray(hl.log_like_batch({"H0": h0s}))
    b = np.asarray(hl_raw.log_like_batch({"H0": h0s}))
    np.testing.assert_allclose(a, b, rtol=1e-12)


def test_fused_matches_xla_with_padding(odd_setup):
    cat, z_grids, pop, sel = odd_setup
    hl = HyperLikelihood.create(cat, z_grids, pop, sel, binning=False)
    h0s = jnp.linspace(55.0, 95.0, 3)
    a = np.asarray(
        pytree.replace(hl, kde_engine="xla").log_like_batch({"H0": h0s}))
    b = np.asarray(
        pytree.replace(hl, kde_engine="fused").log_like_batch({"H0": h0s}))
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
