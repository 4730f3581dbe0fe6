"""HEALPix spec-parity: closed-form RING geometry from the published
definition (Gorski et al. 2005, Section 4 / ApJ 622, 759).

healpy cannot be installed in this environment (no egress), so a recorded
healpy fixture is impossible; instead the RING-scheme pixel *centers* are
pinned to the closed-form formulas of the HEALPix definition, written out
independently here (plain NumPy, no shared code with ops/healpix.py).
healpy implements the same definition, so center agreement at these nsides
is equivalent to healpy parity on centers; bijectivity and boundary
behavior are covered by the invariant tests in test_healpix.py and the C++
cross-implementation.

RING definition (north hemisphere; south by mirror symmetry):
  polar cap rings i = 1..nside-1:  z = 1 - i^2/(3 nside^2), 4i pixels,
      phi_j = (pi / (2 i)) (j + 1/2),            j = 0..4i-1
  equatorial rings i = nside..2*nside:  z = 4/3 - 2 i / (3 nside), 4*nside
      pixels, phi_j = (pi / (2 nside)) (j + s/2), s = (i - nside + 1) mod 2
"""

import numpy as np
import pytest

from chimera_tpu.ops import healpix as hpx

NSIDES = [1, 2, 8, 16, 64, 256]


def _ring_centers_spec(nside):
    """(theta, phi) of every pixel in RING order, from the spec formulas."""
    z_list, phi_list = [], []
    # north polar cap
    for i in range(1, nside):
        z = 1.0 - i * i / (3.0 * nside * nside)
        j = np.arange(4 * i)
        z_list.append(np.full(4 * i, z))
        phi_list.append(np.pi / (2.0 * i) * (j + 0.5))
    # equatorial belt (includes both boundary rings and the equator)
    for i in range(nside, 3 * nside + 1):
        z = 4.0 / 3.0 - 2.0 * i / (3.0 * nside)
        s = (i - nside + 1) % 2
        j = np.arange(4 * nside)
        z_list.append(np.full(4 * nside, z))
        phi_list.append(np.pi / (2.0 * nside) * (j + 0.5 * s))
    # south polar cap (mirror of the north)
    for i in range(nside - 1, 0, -1):
        z = -(1.0 - i * i / (3.0 * nside * nside))
        j = np.arange(4 * i)
        z_list.append(np.full(4 * i, z))
        phi_list.append(np.pi / (2.0 * i) * (j + 0.5))
    z = np.concatenate(z_list)
    phi = np.concatenate(phi_list)
    assert z.size == 12 * nside * nside
    return np.arccos(z), phi


@pytest.mark.parametrize("nside", NSIDES)
def test_pix2ang_ring_matches_spec(nside):
    theta_s, phi_s = _ring_centers_spec(nside)
    pix = np.arange(12 * nside * nside)
    theta, phi = hpx.pix2ang(nside, pix)
    np.testing.assert_allclose(np.asarray(theta), theta_s, atol=1e-12)
    np.testing.assert_allclose(np.asarray(phi) % (2 * np.pi),
                               phi_s % (2 * np.pi), atol=1e-11)


@pytest.mark.parametrize("nside", NSIDES)
def test_ang2pix_ring_inverts_spec_centers(nside):
    theta_s, phi_s = _ring_centers_spec(nside)
    got = np.asarray(hpx.ang2pix(nside, theta_s, phi_s))
    np.testing.assert_array_equal(got, np.arange(12 * nside * nside))


@pytest.mark.parametrize("nside", [1, 2, 8, 64])
def test_nest_centers_match_ring_centers(nside):
    """pix2ang_nest must agree with pix2ang_ring through the nest2ring map
    (ties the NESTED scheme to the spec-pinned RING geometry)."""
    npix = 12 * nside * nside
    pix_nest = np.arange(npix)
    th_n, ph_n = hpx.pix2ang(nside, pix_nest, nest=True)
    pix_ring = np.asarray(hpx.nest2ring(nside, pix_nest))
    th_r, ph_r = hpx.pix2ang(nside, pix_ring)
    np.testing.assert_allclose(np.asarray(th_n), np.asarray(th_r),
                               atol=1e-13)
    np.testing.assert_allclose(np.asarray(ph_n), np.asarray(ph_r),
                               atol=1e-13)
    # and nest2ring is a bijection
    assert np.unique(pix_ring).size == npix


def test_known_nside1_pixels():
    """nside=1: 12 pixels — 4 polar at z = +-2/3, 4 equatorial at z = 0,
    phi quadrants per the face layout."""
    theta, phi = hpx.pix2ang(1, np.arange(12))
    z = np.cos(np.asarray(theta))
    np.testing.assert_allclose(z[:4], 2.0 / 3.0, atol=1e-14)
    np.testing.assert_allclose(z[4:8], 0.0, atol=1e-14)
    np.testing.assert_allclose(z[8:], -2.0 / 3.0, atol=1e-14)
    np.testing.assert_allclose(np.asarray(phi[:4]),
                               np.pi / 4 * np.array([1, 3, 5, 7]), atol=1e-14)
