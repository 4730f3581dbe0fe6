"""Unit tests for the numerics core against scipy/numpy oracles."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.integrate
import scipy.stats

from chimera_tpu.ops import (
    binning1d,
    cumtrapz,
    gaussian_kde_nd,
    interp_batch,
    kde1d,
    masked_trapz,
    neumaier_sum,
    trapz,
)


def test_trapz_matches_numpy():
    x = jnp.linspace(0.0, 3.0, 101)
    y = jnp.sin(x) ** 2 + x
    np.testing.assert_allclose(trapz(y, x), np.trapezoid(np.asarray(y), np.asarray(x)),
                               rtol=1e-14)


def test_trapz_per_row_grids():
    x = jnp.stack([jnp.linspace(0, 1, 50), jnp.linspace(0, 2, 50)])
    y = x**2
    expect = [np.trapezoid(np.asarray(y[i]), np.asarray(x[i])) for i in range(2)]
    np.testing.assert_allclose(trapz(y, x, axis=-1), expect, rtol=1e-14)


def test_cumtrapz_matches_scipy():
    x = jnp.sort(jax.random.uniform(jax.random.PRNGKey(0), (200,)))
    y = jnp.exp(-x)
    got = cumtrapz(y, x)
    expect = scipy.integrate.cumulative_trapezoid(np.asarray(y), np.asarray(x),
                                                  initial=0.0)
    np.testing.assert_allclose(got, expect, rtol=1e-13, atol=1e-16)


def test_masked_trapz_equals_zeroed_integrand():
    x = jnp.linspace(0, 1, 64)
    y = jnp.cos(x)
    mask = x < 0.5
    np.testing.assert_allclose(
        masked_trapz(y, x, mask),
        np.trapezoid(np.where(np.asarray(mask), np.asarray(y), 0.0), np.asarray(x)),
        rtol=1e-14)


def test_neumaier_sum_beats_naive_f32():
    # Sum many tiny values onto a large one: naive f32 loses them entirely.
    big = jnp.float32(1e8)
    tiny = jnp.full((10000,), 1e-1, dtype=jnp.float32)
    x = jnp.concatenate([jnp.array([big], dtype=jnp.float32), tiny])
    exact = float(big) + 0.1 * 10000
    comp = float(neumaier_sum(x))
    assert abs(comp - exact) / exact < 1e-7


@pytest.mark.parametrize("method", ["scatter", "onehot"])
def test_binning1d_matches_histogram(method):
    key = jax.random.PRNGKey(1)
    x = jax.random.normal(key, (5000,))
    w = jax.random.uniform(jax.random.PRNGKey(2), (5000,))
    centers, counts = binning1d(x, w, num_bins=100, method=method)
    edges = np.linspace(float(x.min()), float(x.max()), 101)
    expect, _ = np.histogram(np.asarray(x), bins=edges, weights=np.asarray(w))
    # Edge assignment differs only for samples exactly on an edge.
    np.testing.assert_allclose(np.asarray(counts), expect, rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(np.asarray(centers),
                               0.5 * (edges[:-1] + edges[1:]), rtol=1e-12)
    np.testing.assert_allclose(float(counts.sum()), float(w.sum()), rtol=1e-12)


def test_binning_methods_agree():
    x = jax.random.normal(jax.random.PRNGKey(3), (2000,))
    w = jnp.ones((2000,))
    _, c1 = binning1d(x, w, 64, method="scatter")
    _, c2 = binning1d(x, w, 64, method="onehot")
    np.testing.assert_allclose(np.asarray(c1), np.asarray(c2), atol=1e-10)


def test_kde1d_gaussian_matches_scipy():
    key = jax.random.PRNGKey(4)
    data = jax.random.normal(key, (4000,))
    grid = jnp.linspace(-3, 3, 101)
    got = kde1d(data, grid, kernel="gauss", bw_method="scott")
    ref = scipy.stats.gaussian_kde(np.asarray(data), bw_method="scott")(
        np.asarray(grid))
    # scipy uses (n, d+4) scaling with the sample std too; equal weights make
    # neff == n, so the bandwidths coincide up to the ddof convention.
    np.testing.assert_allclose(np.asarray(got), ref, rtol=2e-3, atol=1e-4)


def test_kde1d_epan_integrates_to_one():
    data = jax.random.normal(jax.random.PRNGKey(5), (2000,)) * 0.5
    grid = jnp.linspace(-4, 4, 2001)
    dens = kde1d(data, grid, kernel="epan")
    assert abs(float(trapz(dens, grid)) - 1.0) < 1e-3


def test_kde1d_weighted_matches_explicit_formula():
    """Weighted KDE against an explicit numpy transcription of the reference
    semantics (math.py:52-81): normalized weights, Kish n_eff, Scott factor
    times the *unweighted* std."""
    rng = np.random.default_rng(0)
    data = rng.normal(size=500)
    w = rng.uniform(0.1, 1.0, size=500)
    grid = np.linspace(-3, 3, 64)
    wn = w / w.sum()
    neff = 1.0 / np.sum(wn**2)
    h = neff ** (-0.2) * data.std()
    u = (grid[:, None] - data[None, :]) / h
    expect = ((wn[None, :] * np.where(np.abs(u) <= 1, 0.75 * (1 - u**2), 0.0))
              .sum(axis=-1) / h)
    got = kde1d(jnp.asarray(data), jnp.asarray(grid), weights=jnp.asarray(w),
                kernel="epan", bw_method="scott")
    np.testing.assert_allclose(np.asarray(got), expect, rtol=1e-12)


@pytest.mark.parametrize("d", [2, 3])
def test_gaussian_kde_nd_matches_scipy(d):
    key = jax.random.PRNGKey(6)
    data = jax.random.normal(key, (d, 500))
    data = data.at[1].mul(2.0)
    pts = jax.random.normal(jax.random.PRNGKey(7), (d, 40))
    got = gaussian_kde_nd(data, pts)
    ref = scipy.stats.gaussian_kde(np.asarray(data))(np.asarray(pts))
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-6)


def test_gaussian_kde_nd_weighted_matches_scipy():
    key = jax.random.PRNGKey(8)
    data = jax.random.normal(key, (3, 300))
    w = jax.random.uniform(jax.random.PRNGKey(9), (300,)) + 0.1
    pts = jax.random.normal(jax.random.PRNGKey(10), (3, 25))
    got = gaussian_kde_nd(data, pts, weights=w)
    ref = scipy.stats.gaussian_kde(np.asarray(data), weights=np.asarray(w))(
        np.asarray(pts))
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-6)


def test_gaussian_kde_nd_log_consistency():
    data = jax.random.normal(jax.random.PRNGKey(11), (2, 200))
    pts = jax.random.normal(jax.random.PRNGKey(12), (2, 30))
    lin = gaussian_kde_nd(data, pts)
    log = gaussian_kde_nd(data, pts, in_log=True)
    np.testing.assert_allclose(np.asarray(jnp.log(lin)), np.asarray(log),
                               rtol=1e-10)


def test_interp_batch():
    xp = jnp.stack([jnp.linspace(0, 1, 11), jnp.linspace(0, 2, 11)])
    fp = xp**2
    x = jnp.array([[0.55], [1.1]])
    got = interp_batch(x, xp, fp)
    expect = [[np.interp(0.55, np.asarray(xp[0]), np.asarray(fp[0]))],
              [np.interp(1.1, np.asarray(xp[1]), np.asarray(fp[1]))]]
    np.testing.assert_allclose(np.asarray(got), expect, rtol=1e-12)


def test_gaussian_kde_nd_stream_matches_dense():
    """Sample-streaming formulation (scalable 'full' 3-D path, round-2
    item 4): identical to the dense one up to reduction order."""
    from chimera_tpu.ops.kde import gaussian_kde_nd_stream

    data = jax.random.normal(jax.random.PRNGKey(13), (3, 700))
    w = jax.random.uniform(jax.random.PRNGKey(14), (700,)) + 0.05
    pts = jax.random.normal(jax.random.PRNGKey(15), (3, 450))
    dense = gaussian_kde_nd(data, pts, weights=w)
    stream = gaussian_kde_nd_stream(data, pts, weights=w, sample_chunk=128)
    np.testing.assert_allclose(np.asarray(stream), np.asarray(dense),
                               rtol=1e-12)
    dense_log = gaussian_kde_nd(data, pts, weights=w, in_log=True)
    stream_log = gaussian_kde_nd_stream(data, pts, weights=w, in_log=True,
                                        sample_chunk=128)
    np.testing.assert_allclose(np.asarray(stream_log), np.asarray(dense_log),
                               atol=1e-12)


def test_gaussian_kde_3d_lattice_matches_dense():
    """Factored product-lattice formulation of the 'full' 3-D KDE (round-4
    item 3): the z axis enters the whitened chi-square only through the
    first component, so the lattice form must equal the dense nd KDE on the
    same (pixel x z-grid) points up to one exp re-association."""
    from chimera_tpu.ops.kde import gaussian_kde_3d_lattice

    data = jax.random.normal(jax.random.PRNGKey(16), (3, 700))
    data = data.at[0].mul(0.3)  # z-like scale
    w = jax.random.uniform(jax.random.PRNGKey(17), (700,)) + 0.05
    ra = jax.random.normal(jax.random.PRNGKey(18), (13,))
    dec = jax.random.normal(jax.random.PRNGKey(19), (13,))
    zg = jnp.linspace(-1.0, 1.0, 37)
    pts = jnp.stack([jnp.tile(zg, 13), jnp.repeat(ra, 37), jnp.repeat(dec, 37)])
    dense = gaussian_kde_nd(data, pts, weights=w).reshape(13, 37)
    lat = gaussian_kde_3d_lattice(data, ra, dec, zg, weights=w,
                                  sample_chunk=256)
    np.testing.assert_allclose(np.asarray(lat), np.asarray(dense), rtol=1e-12)


def test_gaussian_kde_3d_lattice_uniform_recurrence():
    """The uniform-z block-refresh recurrence (round-5: the 'full' variant's
    z sweep without per-pair exps) equals the dense z sweep and the nd KDE
    on a uniform grid — including a K that does not divide G, a grid whose
    span puts most pairs far in the tail (the sticky-underflow window), and
    a single partial block."""
    from chimera_tpu.ops.kde import gaussian_kde_3d_lattice

    data = jax.random.normal(jax.random.PRNGKey(16), (3, 700))
    data = data.at[0].mul(0.3)
    w = jax.random.uniform(jax.random.PRNGKey(17), (700,)) + 0.05
    ra = jax.random.normal(jax.random.PRNGKey(18), (13,))
    dec = jax.random.normal(jax.random.PRNGKey(19), (13,))
    for n_grid, z_lo, z_hi, blk in [(37, -1.0, 1.0, 32),
                                    (500, -3.0, 3.0, 32),   # flagship G
                                    (100, -8.0, 8.0, 16),   # deep tails
                                    (20, -1.0, 1.0, 64)]:   # one partial blk
        zg = jnp.linspace(z_lo, z_hi, n_grid)
        lat = gaussian_kde_3d_lattice(data, ra, dec, zg, weights=w,
                                      sample_chunk=256)
        rec = gaussian_kde_3d_lattice(data, ra, dec, zg, weights=w,
                                      sample_chunk=256, uniform_z=True,
                                      z_block=blk)
        # atol: block starts below the f64 normal floor are flushed to
        # exact zero, so density values > ~150 orders of magnitude below
        # the peak may legitimately differ — physically they are zero
        atol = 1e-40 * float(np.max(np.asarray(lat)))
        np.testing.assert_allclose(np.asarray(rec), np.asarray(lat),
                                   rtol=1e-10, atol=atol,
                                   err_msg=f"G={n_grid} blk={blk}")


def test_gaussian_kde_3d_lattice_recurrence_f32_rising_blocks():
    """f32 regression (round 5): with a narrow bandwidth and a wide grid the
    whitened step h is large; a block that starts below the f32 underflow
    floor and peaks mid-block must not be zeroed.  With the K*h <= 5.5
    contract honored (likelihood._safe_z_block picks K this way) the f32
    recurrence matches the f64 dense sweep at f32 accuracy."""
    from chimera_tpu.ops.kde import gaussian_kde_3d_lattice

    rng = np.random.default_rng(21)
    # sigma_z 0.01 samples, grid spanning ~0.4 -> whitened h ~ 0.6 at G=100
    z = (0.30 + 0.01 * rng.standard_normal(900))
    ra = 1.0 + 0.02 * rng.standard_normal(900)
    dec = -0.5 + 0.02 * rng.standard_normal(900)
    w = rng.uniform(0.05, 1.0, 900)
    data64 = jnp.asarray(np.stack([z, ra, dec]), jnp.float64)
    rp = jnp.asarray(1.0 + 0.02 * rng.standard_normal(9), jnp.float64)
    dp = jnp.asarray(-0.5 + 0.02 * rng.standard_normal(9), jnp.float64)
    zg = jnp.linspace(0.12, 0.52, 100, dtype=jnp.float64)
    w64 = jnp.asarray(w, jnp.float64)
    dense = gaussian_kde_3d_lattice(data64, rp, dp, zg, weights=w64,
                                    sample_chunk=256)
    # derive K the way the likelihood does: K*h <= 5.5
    sig = np.cov(np.stack([z, ra, dec]), aweights=None)
    factor = float(900 ** (-1.0 / 7.0))
    h = float(np.sqrt(np.linalg.inv(sig)[0, 0]) / factor
              * (0.52 - 0.12) / 99)
    k = max(1, int(5.5 / h))
    assert h > 0.3, f"fixture drifted: h={h} no longer exercises large-h"
    rec32 = gaussian_kde_3d_lattice(
        data64.astype(jnp.float32), rp.astype(jnp.float32),
        dp.astype(jnp.float32), zg.astype(jnp.float32),
        weights=w64.astype(jnp.float32), sample_chunk=256,
        uniform_z=True, z_block=k)
    d = np.asarray(dense)
    np.testing.assert_allclose(np.asarray(rec32, np.float64), d,
                               rtol=2e-4, atol=5e-6 * d.max())


def test_z_recurrence_plan_contract():
    """_z_recurrence_plan honors K*h <= 5.5 per event on concrete data,
    buckets partition the event axis with %8 recurrence tiers, and the plan
    falls back to dense when the grid is too coarse for the recurrence."""
    from chimera_tpu.likelihood import _z_recurrence_plan
    from chimera_tpu.models.population import theta_det_to_src
    from chimera_tpu.ops.kde import bw_factor

    import jax
    from chimera_tpu.catalog import EmptyCatalog
    from chimera_tpu.data.mock import make_mock_catalog
    from chimera_tpu.data.pixelize import pixelize_gw_catalog
    from chimera_tpu.models import (FLRW, MadauDickinsonRate, Population,
                                    PowerLawPeak, compute_z_grids)

    cosmo = FLRW.create(H0=70.0, Om0=0.3)
    pop = Population.create(cosmo, PowerLawPeak.create(),
                            MadauDickinsonRate.create(),
                            gal_cat=EmptyCatalog())
    cat = make_mock_catalog(jax.random.PRNGKey(3), pop, n_events=6,
                            n_samples=128, snr_threshold=14.0,
                            sigma_sky_rad=0.03, oversample=300)
    cat = pixelize_gw_catalog(cat, nside_list=[8], mean_npixels_event=4,
                              sky_conf=0.9)

    def per_event_h(z_grids, z_res):
        th = theta_det_to_src(pop.cosmo, cat.with_derived())
        z = np.asarray(th.z, np.float64)
        factor = float(bw_factor(jnp.asarray(float(z.shape[1])), 3, None))
        hs = []
        for e in range(z.shape[0]):
            sig = np.cov(np.stack([z[e], np.asarray(cat.ra[e]),
                                   np.asarray(cat.dec[e])]))
            hs.append(np.sqrt(np.linalg.inv(sig)[0, 0]) / factor
                      * float(z_grids[e, -1] - z_grids[e, 0]) / (z_res - 1))
        return np.asarray(hs)

    for z_res, expect_k in [(600, True), (8, False)]:
        z_grids = compute_z_grids(cosmo, cat,
                                  cosmo_prior={"H0": [40.0, 120.0]},
                                  z_int_res=z_res)
        k_glob, buckets = _z_recurrence_plan(cat.with_derived(), z_grids,
                                             pop, None)
        h = per_event_h(z_grids, z_res)
        if not expect_k:
            assert k_glob is None, f"z_res={z_res}: expected dense fallback"
            continue
        assert k_glob is not None and 8 <= k_glob <= 32
        # global contract against every event's independently computed h
        assert (k_glob * h <= 5.5 + 1e-9).all()
        if buckets is not None:
            seen = sorted(i for _, idx in buckets for i in idx)
            assert seen == list(range(h.size)), "buckets must partition"
            for k, idx in buckets:
                if k > 0:
                    assert len(idx) % 8 == 0
                    assert (k * h[list(idx)] <= 5.5 + 1e-9).all()


def test_full_kind_buckets_match_dense():
    """End-to-end: the bucketed per-event recurrence plan gives the same
    'full'-kind likelihood as the forced-dense sweep, including an outlier
    event whose safe K differs from its neighbors'."""
    import jax
    from chimera_tpu import HyperLikelihood, SelectionFunction, pytree
    from chimera_tpu.catalog import EmptyCatalog
    from chimera_tpu.data.mock import make_mock_catalog, make_mock_injections
    from chimera_tpu.data.pixelize import pixelize_gw_catalog
    from chimera_tpu.models import (FLRW, MadauDickinsonRate, Population,
                                    PowerLawPeak, compute_z_grids)

    cosmo = FLRW.create(H0=70.0, Om0=0.3)
    pop = Population.create(cosmo, PowerLawPeak.create(),
                            MadauDickinsonRate.create(),
                            gal_cat=EmptyCatalog())
    cat = make_mock_catalog(jax.random.PRNGKey(9), pop, n_events=16,
                            n_samples=256, snr_threshold=12.0,
                            sigma_sky_rad=0.03, oversample=300)
    # manufacture one narrow-bandwidth outlier: shrink event 3's dL spread
    # 20x around its mean (tiny sigma_z -> large whitened grid step)
    dl = cat.dL
    dl = dl.at[3].set(jnp.mean(dl[3]) + 0.05 * (dl[3] - jnp.mean(dl[3])))
    cat = cat.update(dL=dl)
    cat = pixelize_gw_catalog(cat, nside_list=[8], mean_npixels_event=4,
                              sky_conf=0.9)
    # 512-pt grids: fine enough that most events clear the K>=8 recurrence
    # bar while the manufactured outlier stays dense (mixed-tier plan)
    z_grids = compute_z_grids(cosmo, cat, cosmo_prior={"H0": [40.0, 120.0]},
                              z_int_res=512)
    inj, n_gen = make_mock_injections(jax.random.PRNGKey(10), pop,
                                      n_generated=30_000, snr_threshold=12.0)
    sel = SelectionFunction.create(inj, n_gen)
    hl = HyperLikelihood.create(cat, z_grids, pop, sel, kind="full",
                                binning=False)
    assert hl.z_full_buckets is not None, \
        "fixture should produce a mixed-tier plan"
    assert any(k == 0 for k, _ in hl.z_full_buckets) or \
        len({k for k, _ in hl.z_full_buckets}) > 1
    # two lambdas (prior edges) — enough to gate the bucketed==dense
    # identity, and each extra lambda costs a full dense 'full'-KDE sweep
    # on the 1-core fast-loop box
    h0s = jnp.linspace(55.0, 95.0, 2)
    got = np.asarray(hl.log_like_batch({"H0": h0s}))
    dense = np.asarray(pytree.replace(hl, z_block_full=None,
                                      z_full_buckets=None)
                       .log_like_batch({"H0": h0s}))
    assert np.isfinite(got).all()
    np.testing.assert_allclose(got, dense, rtol=5e-9)
