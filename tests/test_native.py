"""Native C++ library tests: cross-check the pure-JAX HEALPix and KDE
against the independent host implementation (two independent
implementations agreeing everywhere is the strongest oracle available
without healpy)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from chimera_tpu import native
from chimera_tpu.ops import healpix as hpx

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library unavailable")


@pytest.mark.parametrize("nside", [1, 2, 16, 128, 1024])
@pytest.mark.parametrize("nest", [False, True])
def test_ang2pix_cross_implementation(nside, nest):
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    n = 50_000
    theta = jnp.arccos(jax.random.uniform(k1, (n,), minval=-1, maxval=1))
    phi = jax.random.uniform(k2, (n,), minval=0, maxval=2 * jnp.pi)
    jax_pix = np.asarray(hpx.ang2pix(nside, theta, phi, nest=nest))
    cpp_pix = native.ang2pix(nside, np.asarray(theta), np.asarray(phi),
                             nest=nest)
    np.testing.assert_array_equal(jax_pix, cpp_pix)


@pytest.mark.parametrize("nside", [1, 2, 16, 128])
@pytest.mark.parametrize("nest", [False, True])
def test_pix2ang_cross_implementation(nside, nest):
    pix = jnp.arange(hpx.nside2npix(nside))
    t_j, p_j = hpx.pix2ang(nside, pix, nest=nest)
    t_c, p_c = native.pix2ang(nside, np.asarray(pix), nest=nest)
    np.testing.assert_allclose(np.asarray(t_j), t_c, atol=1e-12)
    np.testing.assert_allclose(np.asarray(p_j), p_c, atol=1e-12)


def test_native_gkde_matches_scipy():
    import scipy.stats

    rng = np.random.default_rng(0)
    data = rng.normal(size=(3, 400))
    w = rng.uniform(0.5, 1.0, size=400)
    pts = rng.normal(size=(3, 30))
    ref = scipy.stats.gaussian_kde(data, weights=w)(pts)

    # whiten exactly as ops.kde.gaussian_kde_nd does
    wn = w / w.sum()
    neff = 1.0 / np.sum(wn**2)
    factor = neff ** (-1.0 / 7)
    mean = np.sum(wn * data, axis=1)
    resid = data - mean[:, None]
    cov = (resid * wn) @ resid.T / (1 - np.sum(wn**2))
    inv_cov = np.linalg.inv(cov) / factor**2
    L = np.linalg.cholesky(inv_cov)
    log_norm = np.sum(np.log(np.diag(L))) - 1.5 * np.log(2 * np.pi)
    got = native.gkde_whitened((pts.T @ L), (data.T @ L), wn, log_norm)
    np.testing.assert_allclose(got, ref, rtol=1e-10)
    got_log = native.gkde_whitened((pts.T @ L), (data.T @ L), wn, log_norm,
                                   in_log=True)
    np.testing.assert_allclose(np.exp(got_log), ref, rtol=1e-10)


def test_native_kde1d_matches_jax():
    from chimera_tpu.ops.kde import kde1d as jax_kde1d

    rng = np.random.default_rng(1)
    data = rng.normal(size=2000)
    w = rng.uniform(size=2000)
    grid = np.linspace(-3, 3, 101)
    wn = w / w.sum()
    neff = 1.0 / np.sum(wn**2)
    h = neff ** (-0.2) * data.std()
    for kernel in ("epan", "gauss"):
        got = native.kde1d(data, wn, h, grid, kernel=kernel)
        ref = np.asarray(jax_kde1d(jnp.asarray(data), jnp.asarray(grid),
                                   jnp.asarray(w), kernel=kernel))
        np.testing.assert_allclose(got, ref, rtol=1e-9)
