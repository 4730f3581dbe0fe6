"""Fully-fused Pallas hot-loop kernel: parity with the stage-by-stage XLA
path (interpret mode on CPU; the same kernel compiles for real on TPU).

NOTE: tests must pin ``kde_engine='fused'`` explicitly — under 'auto' the
dispatcher resolves to the vmap path on CPU backends, and a comparison
would silently test vmap against itself (a round-2 coverage bug: the
interpret-mode kernel was not exercised end-to-end by the earlier
versions of these tests)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from chimera_tpu import HyperLikelihood, SelectionFunction, pytree
from chimera_tpu.likelihood import (
    _fused_eligible,
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
    h0s = jnp.linspace(55.0, 95.0, 3)
    expect = np.asarray(
        pytree.replace(hl, kde_engine="xla").log_like_batch({"H0": h0s}))
    got = np.asarray(
        pytree.replace(hl, kde_engine="fused").log_like_batch({"H0": h0s}))
    np.testing.assert_allclose(got, expect, rtol=1e-8)


def test_fused_multi_param(spectral_hl):
    batch = {"H0": jnp.array([65.0, 75.0]), "Om0": jnp.array([0.2, 0.35]),
             "mu_g": jnp.array([33.0, 35.0])}
    expect = np.asarray(
        pytree.replace(spectral_hl, kde_engine="xla").log_like_batch(batch))
    got = np.asarray(
        pytree.replace(spectral_hl, kde_engine="fused").log_like_batch(batch))
    assert np.isfinite(got).all()
    np.testing.assert_allclose(got, expect, rtol=1e-8)


@pytest.mark.slow
def test_adjoint_bwd_odd_grid_width(fiducial_population, mock_catalog,
                                    mock_injections):
    """Regression: grid widths whose 128-padding is not a multiple of 256
    (e.g. z_int_res=300 -> gp=384) must tile correctly in the adjoint."""
    from chimera_tpu.models import compute_z_grids

    theta_inj, n_inj = mock_injections
    z_grids = compute_z_grids(fiducial_population.cosmo, mock_catalog,
                              cosmo_prior={"H0": [30.0, 150.0]},
                              z_int_res=300)
    sel = SelectionFunction.create(theta_inj, n_inj)
    hl = HyperLikelihood.create(mock_catalog, z_grids, fiducial_population,
                                sel, binning=False, cut_grid=None,
                                kde_engine="fused", grad_engine="pallas")

    def loss(hl_, h0):
        return jnp.sum(log_hyperlikelihood_batch(
            hl_, {"H0": jnp.stack([h0, h0 + 2.0])}))

    gp = jax.grad(lambda v: loss(hl, v))(70.0)
    gx = jax.grad(lambda v: loss(
        pytree.replace(hl, grad_engine="xla"), v))(70.0)
    assert np.isfinite(float(gp))
    np.testing.assert_allclose(float(gp), float(gx), rtol=1e-10)


def _light_population(pop):
    """The same population with low-degree Chebyshev engines.

    The interpret-mode Pallas adjoint re-executes the in-kernel model math
    (unrolled Clenshaw chains) eagerly per grid step, so its wall time on
    the 1-core fast-loop box scales with engine degree.  The adjoint gates
    compare two backwards of the SAME model, so the identity is
    degree-independent — gate it on deg-16 engines (full-degree shapes
    stay in the slow-marked matrix)."""
    from chimera_tpu.models import FLRW, PowerLawPeak

    return pytree.replace(
        pop,
        cosmo=FLRW.create(H0=70.0, Om0=0.25, cheb_deg=16),
        mass=PowerLawPeak.create(window_deg=16))


@pytest.fixture(scope="module")
def tiny_spectral_hl(fiducial_population, mock_catalog, mock_injections):
    """8 events (one fused tile) x 256 samples x 64-pt grids, deg-16
    engines.

    The adjoint identity is shape-independent, and the interpret-mode
    Pallas backward walks the kernel grid tile-by-tile in Python — so the
    fast-loop gradient gate runs at the smallest shape that still covers
    multi-sample tiles (full shapes stay in the slow-marked matrix)."""
    import jax.tree_util as jtu

    from chimera_tpu.models import compute_z_grids

    pop = _light_population(fiducial_population)
    cat = jtu.tree_map(lambda a: a[:8] if a.ndim >= 1 else a, mock_catalog)
    z_grids = compute_z_grids(pop.cosmo, cat,
                              cosmo_prior={"H0": [30.0, 150.0]},
                              z_int_res=64)
    theta_inj, n_inj = mock_injections
    sel = SelectionFunction.create(theta_inj, n_inj)
    return HyperLikelihood.create(cat, z_grids, pop, sel,
                                  binning=False)


def test_adjoint_bwd_matches_xla_bwd(tiny_spectral_hl):
    """The adjoint Pallas backward (grad_engine='pallas', the HMC fast
    path) produces the same hyper-lambda gradients as the XLA backward."""
    hl = pytree.replace(tiny_spectral_hl, cut_grid=None, kde_engine="fused")

    def loss(hl_, h0):
        # one lambda (multi-lambda adjoint accumulation is slow-marked);
        # still multi-parameter so d(density)/d{mass, rate} adjoints fire
        batch = {"H0": jnp.stack([h0]),
                 "Om0": jnp.array([0.25]),
                 "mu_g": jnp.array([34.0])}
        return jnp.sum(log_hyperlikelihood_batch(hl_, batch))

    for wrt, val in (("H0-direction", 70.0),):
        # jit the XLA-recompute side (pure-XLA graph: compiles well and the
        # program persists in the compile cache); the pallas-adjoint side
        # stays eager (outer jit of interpret-mode pallas lowers a giant
        # unrolled-grid graph).
        gx = jax.jit(jax.grad(lambda v: loss(
            pytree.replace(hl, grad_engine="xla"), v)))(val)
        gp = jax.grad(lambda v: loss(
            pytree.replace(hl, grad_engine="pallas"), v))(val)
        assert np.isfinite(float(gp))
        np.testing.assert_allclose(float(gp), float(gx), rtol=1e-10)


def test_fused_respects_event_mask(spectral_hl):
    """Padding events (zero mask) must not change the result."""
    from chimera_tpu.parallel import pad_events

    hl_pad = pad_events(spectral_hl, 24)  # 16 -> 24 events
    h0s = jnp.linspace(60.0, 90.0, 3)
    a = np.asarray(
        pytree.replace(spectral_hl, kde_engine="fused")
        .log_like_batch({"H0": h0s}))
    b = np.asarray(
        pytree.replace(hl_pad, kde_engine="fused")
        .log_like_batch({"H0": h0s}))
    np.testing.assert_allclose(b, a, rtol=1e-10)


@pytest.fixture(scope="module")
def dark_hl(dark_siren_setup):
    # Shared session dark-siren mock (see conftest) — this module only
    # needs the (theta, z_grids, pop_pix, sel) tuple.
    theta, z_grids, pop_pix, sel, _truths = dark_siren_setup
    return theta, z_grids, pop_pix, sel


@pytest.mark.parametrize("kind,cut_grid", [("approximate", 2.0),
                                           ("approximate", None),
                                           ("marginalized", None),
                                           ("marginalized", 2.0)])
def test_fused_pixelated_matches_vmap(dark_hl, kind, cut_grid):
    theta, z_grids, pop_pix, sel = dark_hl
    hl = HyperLikelihood.create(theta, z_grids, pop_pix, sel, kind=kind,
                                binning=False, cut_grid=cut_grid)
    assert _fused_eligible(hl), "fixture should produce an eligible config"
    h0s = jnp.linspace(55.0, 95.0, 3)
    expect = np.asarray(
        pytree.replace(hl, kde_engine="xla").log_like_batch({"H0": h0s}))
    got = np.asarray(
        pytree.replace(hl, kde_engine="fused").log_like_batch({"H0": h0s}))
    assert np.isfinite(got).all()
    np.testing.assert_allclose(got, expect, rtol=1e-8)


@pytest.mark.slow
@pytest.mark.parametrize("kind,cut_grid", [("approximate", 2.0),
                                           ("marginalized", None),
                                           ("marginalized", 2.0)])
def test_fused_pixelated_grad_matches_vmap(dark_hl, kind, cut_grid):
    """Custom-VJP gradients through the dark-siren fused paths (incl. the
    two-pass marginalized+cut_grid chain) match the XLA path."""
    theta, z_grids, pop_pix, sel = dark_hl
    hl = HyperLikelihood.create(theta, z_grids, pop_pix, sel, kind=kind,
                                binning=False, cut_grid=cut_grid)

    def loss(hl_, h0):
        return jnp.sum(log_hyperlikelihood_batch(
            hl_, {"H0": jnp.stack([h0, h0 + 3.0])}))

    gx = float(jax.grad(lambda v: loss(
        pytree.replace(hl, kde_engine="xla"), v))(72.0))
    for grad_engine in ("xla", "pallas"):
        gf = float(jax.grad(lambda v: loss(pytree.replace(
            hl, kde_engine="fused", grad_engine=grad_engine), v))(72.0))
        assert np.isfinite(gf), grad_engine
        np.testing.assert_allclose(gf, gx, rtol=1e-6, err_msg=grad_engine)


def test_dark_grad_adjoint_vs_recompute(dark_hl, dark_siren_extras):
    """Fast-loop dark-siren gradient gate: the adjoint Pallas backward
    (grad_engine='pallas') equals the pure-XLA recompute backward of the
    SAME fused forward, on the two-pass marginalized+cut_grid chain.  The
    independent stage-by-stage XLA reference (an expensive eager backward)
    is covered by the slow-marked matrix above."""
    from chimera_tpu.catalog.build import build_pixelated_catalog
    from chimera_tpu.models import compute_z_grids

    theta, _z_grids, pop_pix, sel = dark_hl
    galaxies, compl = dark_siren_extras
    # 48-pt z-grids: the adjoint/recompute identity is grid-independent and
    # the interpret-mode backward cost scales with the grid-tile count, so
    # the fast-loop gate runs at the coarsest grid (the slow matrix keeps
    # the fixture resolution).  The pixelated catalog's p_cat lives on the
    # z-grids, so it must be rebuilt on the small grids too.  Low-degree
    # engines for the same reason (see _light_population).
    pop_light = _light_population(pop_pix)
    z_small = compute_z_grids(pop_light.cosmo, theta,
                              cosmo_prior={"H0": [40.0, 120.0]},
                              z_int_res=48)
    gal_small = build_pixelated_catalog(galaxies, theta, z_small,
                                        pop_light.cosmo, compl, z_err=0.01)
    pop_small = pytree.replace(pop_light, gal_cat=gal_small)
    hl = HyperLikelihood.create(theta, z_small, pop_small, sel,
                                kind="marginalized", binning=False,
                                cut_grid=2.0, kde_engine="fused")

    def loss(hl_, h0):
        # single-lambda batch: the eager interpret-mode adjoint walks the
        # kernel grid per lambda (~40 s/lambda on the 1-core box); the
        # multi-lambda adjoint accumulation is covered by the slow matrix
        return jnp.sum(log_hyperlikelihood_batch(
            hl_, {"H0": jnp.stack([h0])}))

    gr = float(jax.jit(jax.grad(lambda v: loss(
        pytree.replace(hl, grad_engine="xla"), v)))(72.0))
    gp = float(jax.grad(lambda v: loss(
        pytree.replace(hl, grad_engine="pallas"), v))(72.0))
    assert np.isfinite(gp)
    np.testing.assert_allclose(gp, gr, rtol=1e-6)


def test_compaction_partitions_samples(dark_hl):
    from chimera_tpu.data.pixelize import compact_samples_by_pixel

    theta = dark_hl[0]
    c = compact_samples_by_pixel(theta)
    counts = np.asarray(c["n_real"])
    # pixels partition the sample axis
    assert (counts.sum(axis=1) == theta.n_samples).all()
    # padded slots have zero weight and the filler distance
    inv_p = np.asarray(c["inv_pe_prior"])
    dl = np.asarray(c["dL"])
    for e in range(counts.shape[0]):
        for p in range(counts.shape[1]):
            k = counts[e, p]
            assert (inv_p[e, p, k:] == 0).all()
            np.testing.assert_allclose(dl[e, p, k:],
                                       float(np.asarray(c["dl_fill"])[e]))


def test_fused_mgflrw(mock_catalog, mock_injections, mock_z_grids):
    """Modified-gravity cosmology (MGFLRW) through the fused kernel."""
    from chimera_tpu.catalog import EmptyCatalog
    from chimera_tpu.models import (MGFLRW, MadauDickinsonRate, Population,
                                    PowerLawPeak)

    cosmo = MGFLRW.create(H0=70.0, Om0=0.25, Xi0=1.2, n=2.0)
    pop = Population.create(cosmo, PowerLawPeak.create(),
                            MadauDickinsonRate.create(),
                            gal_cat=EmptyCatalog())
    theta_inj, n_inj = mock_injections
    sel = SelectionFunction.create(theta_inj, n_inj)
    hl = HyperLikelihood.create(mock_catalog, mock_z_grids, pop, sel,
                                binning=False, cut_grid=None)
    assert _fused_eligible(hl)
    batch = {"H0": jnp.array([65.0, 75.0]), "Xi0": jnp.array([0.9, 1.4])}
    expect = np.asarray(
        pytree.replace(hl, kde_engine="xla").log_like_batch(batch))
    got = np.asarray(
        pytree.replace(hl, kde_engine="fused").log_like_batch(batch))
    assert np.isfinite(got).all()
    np.testing.assert_allclose(got, expect, rtol=1e-8)


def test_catalog_save_load_roundtrip(tmp_path, dark_hl):
    from chimera_tpu.catalog import DVdzCompleteness
    from chimera_tpu.catalog.build import (load_pixelated_catalog,
                                           save_pixelated_catalog)

    _, _, pop_pix, _ = dark_hl
    cat = pop_pix.gal_cat
    f = str(tmp_path / "cat.h5")
    save_pixelated_catalog(f, cat)
    compl = DVdzCompleteness.create(z_range=(0.0, 3.0), kind="step")
    cat2 = load_pixelated_catalog(f, compl)
    np.testing.assert_array_equal(np.asarray(cat2.p_cat),
                                  np.asarray(cat.p_cat))
    np.testing.assert_array_equal(np.asarray(cat2.pixel_mask),
                                  np.asarray(cat.pixel_mask))


def test_walker_init_modes():
    from chimera_tpu.inference import initialize_walkers

    bounds = {"a": (0.0, 1.0), "b": (-2.0, 2.0)}
    for dist in ("gaussian", "truncgauss", "uniform"):
        x = np.asarray(initialize_walkers(
            jax.random.PRNGKey(0), {"a": 0.5, "b": 0.0}, 64, ["a", "b"],
            scale={"a": 2.0, "b": 5.0}, bounds=bounds, distribution=dist))
        assert x.shape == (64, 2)
        assert (x[:, 0] >= 0).all() and (x[:, 0] <= 1).all()
        assert (x[:, 1] >= -2).all() and (x[:, 1] <= 2).all()
    import pytest as _pytest
    with _pytest.raises(ValueError):
        initialize_walkers(jax.random.PRNGKey(0), {"a": 0.5}, 4, ["a"],
                           distribution="uniform")
