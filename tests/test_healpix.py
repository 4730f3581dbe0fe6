"""HEALPix correctness tests: self-consistency, scheme cross-consistency,
and the geometric invariants of the tessellation.

(healpy is unavailable in this environment; correctness is instead
established by (a) exact round-trips, (b) RING/NESTED cross-checks through
two independent code paths, (c) ring-structure / equal-area invariants, and
(d) a handful of hard-coded values verified against the published HEALPix
geometry.)
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from chimera_tpu.ops import healpix as hpx

NSIDES = [1, 2, 8, 64, 256]


@pytest.mark.parametrize("nside", NSIDES)
def test_pix2ang_ang2pix_roundtrip_ring(nside):
    pix = jnp.arange(hpx.nside2npix(nside))
    theta, phi = hpx.pix2ang_ring(nside, pix)
    back = hpx.ang2pix_ring(nside, theta, phi)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(pix))


@pytest.mark.parametrize("nside", NSIDES)
def test_pix2ang_ang2pix_roundtrip_nest(nside):
    pix = jnp.arange(hpx.nside2npix(nside))
    theta, phi = hpx.pix2ang_nest(nside, pix)
    back = hpx.ang2pix_nest(nside, theta, phi)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(pix))


@pytest.mark.parametrize("nside", NSIDES)
def test_nest_ring_conversion_roundtrip(nside):
    pix = jnp.arange(hpx.nside2npix(nside))
    np.testing.assert_array_equal(
        np.asarray(hpx.nest2ring(nside, hpx.ring2nest(nside, pix))),
        np.asarray(pix))
    np.testing.assert_array_equal(
        np.asarray(hpx.ring2nest(nside, hpx.nest2ring(nside, pix))),
        np.asarray(pix))


@pytest.mark.parametrize("nside", NSIDES)
def test_conversion_is_a_bijection(nside):
    pix = jnp.arange(hpx.nside2npix(nside))
    rn = np.asarray(hpx.ring2nest(nside, pix))
    assert len(np.unique(rn)) == hpx.nside2npix(nside)


@pytest.mark.parametrize("nside", [1, 2, 8, 64])
def test_schemes_agree_through_angles(nside):
    """ang2pix_nest == ring2nest(ang2pix_ring) on random points — two
    independent code paths must agree everywhere."""
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    theta = jnp.arccos(jax.random.uniform(k1, (20000,), minval=-1, maxval=1))
    phi = jax.random.uniform(k2, (20000,), minval=0, maxval=2 * jnp.pi)
    p_ring = hpx.ang2pix_ring(nside, theta, phi)
    p_nest = hpx.ang2pix_nest(nside, theta, phi)
    np.testing.assert_array_equal(
        np.asarray(hpx.ring2nest(nside, p_ring)), np.asarray(p_nest))
    # and pix2ang agrees across schemes on the same physical pixel
    t_r, f_r = hpx.pix2ang_ring(nside, p_ring)
    t_n, f_n = hpx.pix2ang_nest(nside, p_nest)
    np.testing.assert_allclose(np.asarray(t_r), np.asarray(t_n), atol=1e-12)
    np.testing.assert_allclose(np.asarray(f_r), np.asarray(f_n), atol=1e-12)


@pytest.mark.parametrize("nside", [1, 4, 16])
def test_ring_structure(nside):
    """Pixel counts per iso-latitude ring follow the HEALPix layout:
    4i in cap ring i, 4*nside in the equatorial belt, and z decreases
    monotonically with ring number."""
    pix = jnp.arange(hpx.nside2npix(nside))
    theta, _ = hpx.pix2ang_ring(nside, pix)
    z = np.cos(np.asarray(theta))
    rings, counts = np.unique(np.round(z, 12), return_counts=True)
    rings = rings[::-1]  # north to south
    counts = counts[::-1]
    assert len(rings) == 4 * nside - 1
    for i in range(1, nside):
        assert counts[i - 1] == 4 * i
        assert counts[-(i)] == 4 * i
    assert all(c == 4 * nside for c in counts[nside - 1: 3 * nside])
    # RING ordering: theta nondecreasing with pixel index
    assert np.all(np.diff(np.asarray(theta)) > -1e-12)


def test_known_values_nside1():
    """nside=1: 12 pixels; centers at z = +-2/3 (rings 1, 3) and z = 0."""
    theta, phi = hpx.pix2ang_ring(1, jnp.arange(12))
    z = np.cos(np.asarray(theta))
    np.testing.assert_allclose(z[:4], 2 / 3, rtol=1e-12)
    np.testing.assert_allclose(z[4:8], 0.0, atol=1e-12)
    np.testing.assert_allclose(z[8:], -2 / 3, rtol=1e-12)
    np.testing.assert_allclose(np.asarray(phi[:4]),
                               [np.pi / 4, 3 * np.pi / 4, 5 * np.pi / 4,
                                7 * np.pi / 4], rtol=1e-12)
    np.testing.assert_allclose(np.asarray(phi[4:8]),
                               [0.0, np.pi / 2, np.pi, 3 * np.pi / 2],
                               atol=1e-12)


def test_equal_area_by_sampling():
    """Uniform sphere points land uniformly in pixels (equal-area property)."""
    nside = 4
    n = 200_000
    key = jax.random.PRNGKey(3)
    k1, k2 = jax.random.split(key)
    z = jax.random.uniform(k1, (n,), minval=-1.0, maxval=1.0)
    theta = jnp.arccos(z)
    phi = jax.random.uniform(k2, (n,), minval=0.0, maxval=2 * jnp.pi)
    pix = np.asarray(hpx.ang2pix_ring(nside, theta, phi))
    counts = np.bincount(pix, minlength=hpx.nside2npix(nside))
    expect = n / hpx.nside2npix(nside)
    # 5-sigma Poisson band
    assert np.all(np.abs(counts - expect) < 5 * np.sqrt(expect))


def test_pixel_centers_are_interior():
    """ang2pix(pix2ang(p)) == p is necessary; also check the center is far
    from pixel boundaries by perturbing it slightly (at most the neighbor)."""
    nside = 16
    pix = jnp.arange(hpx.nside2npix(nside))
    theta, phi = hpx.pix2ang_ring(nside, pix)
    eps = 1e-9
    for dt, dp in [(eps, 0.0), (-eps, 0.0), (0.0, eps), (0.0, -eps)]:
        t = jnp.clip(theta + dt, 1e-12, jnp.pi - 1e-12)
        back = hpx.ang2pix_ring(nside, t, phi + dp)
        np.testing.assert_array_equal(np.asarray(back), np.asarray(pix))


def test_find_pix_ra_dec_and_back():
    nside = 32
    key = jax.random.PRNGKey(5)
    k1, k2 = jax.random.split(key)
    ra = jax.random.uniform(k1, (1000,), minval=0, maxval=2 * jnp.pi)
    dec = jnp.arcsin(jax.random.uniform(k2, (1000,), minval=-1, maxval=1))
    pix = hpx.find_pix_ra_dec(ra, dec, nside)
    ra_c, dec_c = hpx.find_ra_dec(pix, nside)
    sep = hpx.angular_separation(ra, dec, ra_c, dec_c)
    # Every point lies within ~2 pixel radii of its pixel center.
    max_radius = 2.5 * np.sqrt(4 * np.pi / hpx.nside2npix(nside))
    assert float(jnp.max(sep)) < max_radius


def test_angular_separation():
    assert abs(float(hpx.angular_separation(
        jnp.asarray(0.0), jnp.asarray(0.0), jnp.asarray(jnp.pi), jnp.asarray(0.0)
    )) - np.pi) < 1e-12
    assert abs(float(hpx.angular_separation(
        jnp.asarray(0.0), jnp.asarray(0.5), jnp.asarray(0.0), jnp.asarray(0.5)
    ))) < 1e-6
