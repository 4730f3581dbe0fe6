"""Smoke tests for the presentation layer: plots render, mags invert,
pixel boundaries enclose their pixel."""

import matplotlib

matplotlib.use("Agg")

import jax.numpy as jnp
import numpy as np
import pytest

from chimera_tpu.ops import healpix as hpx
from chimera_tpu.utils import (
    absolute_magnitude,
    apparent_magnitude,
    lum2mag,
    mag2lum,
    schechter_luminosity_fraction,
)


def test_mag_lum_roundtrip():
    M = jnp.array([-20.0, -18.5, 3.27])
    for band in ("bol", "B", "W1", "K"):
        np.testing.assert_allclose(np.asarray(lum2mag(mag2lum(M, band), band)),
                                   np.asarray(M), rtol=1e-12)
    with pytest.raises(ValueError):
        mag2lum(M, band="Q")


def test_distance_modulus_roundtrip():
    m = jnp.array([17.0, 21.3])
    dl = jnp.array([0.04, 0.4])  # Gpc
    M = absolute_magnitude(m, dl)
    np.testing.assert_allclose(np.asarray(apparent_magnitude(M, dl)),
                               np.asarray(m), rtol=1e-12)
    # 10 pc -> m == M
    np.testing.assert_allclose(float(absolute_magnitude(5.0, 1e-8)), 5.0)


def test_schechter_fraction_limits():
    assert float(schechter_luminosity_fraction(0.0)) == pytest.approx(1.0)
    assert float(schechter_luminosity_fraction(50.0)) == pytest.approx(0.0, abs=1e-12)
    lo = float(schechter_luminosity_fraction(1.0))
    assert 0.0 < lo < 1.0


@pytest.mark.parametrize("nside", [2, 16])
def test_boundaries_enclose_pixel(nside):
    pix = jnp.arange(hpx.nside2npix(nside))
    th, ph = hpx.boundaries(nside, pix, step=4)
    thc, phc = hpx.pix2ang_ring(nside, pix)
    # pull each boundary point slightly toward the pixel center: must land
    # in the owning pixel
    th_in = thc[:, None] + (th - thc[:, None]) * (1 - 1e-3)
    dphi = jnp.mod(ph - phc[:, None] + jnp.pi, 2 * jnp.pi) - jnp.pi
    ph_in = jnp.mod(phc[:, None] + dphi * (1 - 1e-3), 2 * jnp.pi)
    back = hpx.ang2pix_ring(nside, th_in, ph_in)
    np.testing.assert_array_equal(np.asarray(back),
                                  np.broadcast_to(np.asarray(pix)[:, None],
                                                  back.shape))


@pytest.fixture(scope="module")
def small_dark_siren(dark_siren_setup):
    # Shared session dark-siren mock (see conftest); plotting only needs
    # the 4-tuple.
    theta, z_grids, pop_pix, sel, _truths = dark_siren_setup
    return theta, z_grids, pop_pix, sel


def test_plot_smoke(small_dark_siren):
    from chimera_tpu import HyperLikelihood
    from chimera_tpu.utils.plotting import (
        plot_p_cat_pixelated,
        plot_p_gal_pixelated,
        plot_p_gw3d_pixelated,
        plot_pixelization,
    )

    theta, z_grids, pop_pix, sel = small_dark_siren
    hl = HyperLikelihood.create(theta, z_grids, pop_pix, sel,
                                kind="marginalized")
    fig = plot_pixelization(theta, 0)
    assert fig is not None
    fig = plot_p_gw3d_pixelated(hl, 0, H0=70.0)
    assert fig is not None
    fig = plot_p_gal_pixelated(hl, 0, H0=70.0)
    assert fig is not None
    fig = plot_p_cat_pixelated(pop_pix.gal_cat, z_grids, 0)
    assert fig is not None
    matplotlib.pyplot.close("all")
