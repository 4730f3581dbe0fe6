"""Mesh distribution tests on the virtual 8-device CPU mesh.

The key invariant (SURVEY.md 4 item 4): the sharded likelihood equals the
single-device one to float determinism.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from chimera_tpu import HyperLikelihood, SelectionFunction
from chimera_tpu.parallel import (
    log_like_batch_sharded,
    make_mesh,
    pad_events,
    pad_injections,
    shard_hyperlikelihood,
)


@pytest.fixture(scope="module")
def hyperlike(fiducial_population, mock_catalog, mock_injections, mock_z_grids):
    theta_inj, n_inj = mock_injections
    sel = SelectionFunction.create(theta_inj, n_inj)
    return HyperLikelihood.create(mock_catalog, mock_z_grids,
                                  fiducial_population, sel, num_bins=100)


def test_make_mesh_shapes():
    mesh = make_mesh(params=2, data=4)
    assert mesh.shape == {"params": 2, "data": 4}
    mesh1 = make_mesh(params=1)
    assert mesh1.shape == {"params": 1, "data": 8}


def test_pad_events_invariance(hyperlike):
    base = float(hyperlike.log_like(H0=70.0))
    padded = pad_events(hyperlike, 24)  # 16 -> 24: real padding rows
    assert padded.n_events % 8 == 0
    assert int(padded.n_events_real) == hyperlike.n_events
    np.testing.assert_allclose(float(padded.log_like(H0=70.0)), base,
                               rtol=1e-12)


def test_pad_injections_invariance(hyperlike):
    sel = hyperlike.selection
    padded = pad_injections(sel, 8)
    assert padded.theta_inj.n_detected % 8 == 0
    pop = hyperlike.population.update(H0=70.0)
    np.testing.assert_allclose(float(padded.n_exp(pop)),
                               float(sel.n_exp(pop)), rtol=1e-12)


def test_sharded_equals_single_device(hyperlike):
    mesh = make_mesh(params=1, data=8)
    hl_sharded = shard_hyperlikelihood(hyperlike, mesh)
    for h0 in (55.0, 70.0, 95.0):
        a = float(hyperlike.log_like(H0=h0))
        b = float(hl_sharded.log_like(H0=h0))
        np.testing.assert_allclose(b, a, rtol=1e-9)


def test_2d_mesh_batch(hyperlike):
    mesh = make_mesh(params=2, data=4)
    hl_sharded = shard_hyperlikelihood(hyperlike, mesh)
    h0s = jnp.linspace(55.0, 95.0, 8)
    got = np.asarray(log_like_batch_sharded(hl_sharded, {"H0": h0s}, mesh))
    expect = np.asarray(hyperlike.log_like_batch({"H0": h0s}))
    np.testing.assert_allclose(got, expect, rtol=1e-9)


def test_params_only_mesh(hyperlike):
    mesh = make_mesh(params=8, data=1)
    hl_sharded = shard_hyperlikelihood(hyperlike, mesh)
    h0s = jnp.linspace(60.0, 80.0, 8)
    got = np.asarray(log_like_batch_sharded(hl_sharded, {"H0": h0s}, mesh))
    expect = np.asarray(hyperlike.log_like_batch({"H0": h0s}))
    np.testing.assert_allclose(got, expect, rtol=1e-9)


def test_sharded_dark_siren_marginalized(dark_siren_setup):
    """The DISTRIBUTED dark-siren flagship: a pixelated 'marginalized'
    likelihood sharded over the 8-device mesh must equal the single-device
    value (f64, rtol 1e-9).  This is the reference's MPI 'data' design point
    (parallel.py:280-344) exercised for the science case it was built for —
    pad_events' gal_cat/compact handling (incl. the nested chunk-rows dict)
    executes here."""
    theta, z_grids, pop_pix, sel, _ = dark_siren_setup
    hl = HyperLikelihood.create(theta, z_grids, pop_pix, sel,
                                kind="marginalized", binning=False,
                                cut_grid=None)
    assert hl.compact is not None and "rows" in hl.compact
    mesh = make_mesh(params=1, data=8)
    hls = shard_hyperlikelihood(hl, mesh)
    h0s = jnp.linspace(55.0, 95.0, 8)
    got = np.asarray(log_like_batch_sharded(hls, {"H0": h0s}, mesh))
    expect = np.asarray(hl.log_like_batch({"H0": h0s}))
    np.testing.assert_allclose(got, expect, rtol=1e-9)


def test_sharded_dark_siren_rows_kernel(dark_siren_setup):
    """The flagship rows-contract fused path (compact dict + gidx gathers,
    likelihood._fused_batch_marginalized_rows) under shard_map on a 2-D
    (params x data) mesh — interpret-mode Pallas on the CPU devices —
    against the stage-by-stage XLA path on a single device."""
    theta, z_grids, pop_pix, sel, _ = dark_siren_setup
    hl = HyperLikelihood.create(theta, z_grids, pop_pix, sel,
                                kind="marginalized", binning=False,
                                cut_grid=None, kde_engine="fused")
    mesh = make_mesh(params=2, data=4)
    hls = shard_hyperlikelihood(hl, mesh)
    h0s = jnp.linspace(55.0, 95.0, 8)
    got = np.asarray(log_like_batch_sharded(hls, {"H0": h0s}, mesh))
    hl_ref = HyperLikelihood.create(theta, z_grids, pop_pix, sel,
                                    kind="marginalized", binning=False,
                                    cut_grid=None, kde_engine="xla")
    expect = np.asarray(hl_ref.log_like_batch({"H0": h0s}))
    np.testing.assert_allclose(got, expect, rtol=1e-8)


def test_sharded_fused_engine(fiducial_population, mock_catalog,
                              mock_injections, mock_z_grids):
    """Fused Pallas path under shard_map (interpret mode on the CPU mesh)
    equals the single-device vmap path."""
    theta_inj, n_inj = mock_injections
    sel = SelectionFunction.create(theta_inj, n_inj)
    hl = HyperLikelihood.create(mock_catalog, mock_z_grids,
                                fiducial_population, sel, binning=False,
                                cut_grid=None, kde_engine="fused")
    mesh = make_mesh(params=2, data=4)
    hls = shard_hyperlikelihood(hl, mesh)
    h0s = jnp.linspace(55.0, 95.0, 8)
    got = np.asarray(log_like_batch_sharded(hls, {"H0": h0s}, mesh))
    hl_ref = HyperLikelihood.create(mock_catalog, mock_z_grids,
                                    fiducial_population, sel, binning=False,
                                    cut_grid=None, kde_engine="xla")
    exp = np.asarray(hl_ref.log_like_batch({"H0": h0s}))
    np.testing.assert_allclose(got, exp, rtol=1e-8)
