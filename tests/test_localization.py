"""Localization areas/volumes (corrected reference data.py:426-484)."""

import jax
import jax.numpy as jnp
import numpy as np

from chimera_tpu.data import localization_areas, localization_volumes
from chimera_tpu.models import FLRW


def test_areas_match_gaussian_formula():
    # Narrow Gaussian blob at mid-declination: area ≈ -ln(0.1)·2π·sinθ·σθσφ
    key = jax.random.PRNGKey(0)
    st, sp, theta0 = 0.01, 0.02, 1.2
    theta = theta0 + st * jax.random.normal(key, (4, 20_000))
    phi = 2.0 + sp * jax.random.normal(jax.random.PRNGKey(1), (4, 20_000))
    areas = localization_areas(theta, phi, percentile=90.0, unit="rad2")
    expect = -np.log(0.1) * 2 * np.pi * np.sin(theta0) * st * sp
    np.testing.assert_allclose(np.asarray(areas), expect, rtol=0.05)


def test_areas_unit_conversion():
    theta = 1.0 + 0.01 * jax.random.normal(jax.random.PRNGKey(0), (2, 500))
    phi = 0.5 + 0.01 * jax.random.normal(jax.random.PRNGKey(1), (2, 500))
    rad2 = localization_areas(theta, phi, unit="rad2")
    deg2 = localization_areas(theta, phi)
    np.testing.assert_allclose(np.asarray(deg2),
                               np.asarray(rad2) * (180 / np.pi) ** 2)


def test_volumes_positive_and_monotonic_in_dl_spread():
    key = jax.random.PRNGKey(3)
    theta = 1.1 + 0.02 * jax.random.normal(key, (3, 4000))
    phi = 2.5 + 0.02 * jax.random.normal(jax.random.PRNGKey(4), (3, 4000))
    # distances in Gpc (framework convention, models/cosmology.py:15)
    dl = 1.0 + jnp.array([0.05, 0.15, 0.4])[:, None] * jax.random.normal(
        jax.random.PRNGKey(5), (3, 4000))
    dl = jnp.abs(dl) + 0.01
    # High H0 minimizes comoving distance at fixed dL -> inner bound;
    # low H0 maximizes it -> outer bound (covering shell).
    c_lo = FLRW.create(H0=20.0)
    c_hi = FLRW.create(H0=200.0)
    vols = np.asarray(localization_volumes(theta, phi, dl, c_hi, c_lo))
    assert (vols > 0).all()
    # wider dL band -> larger volume
    assert vols[0] < vols[1] < vols[2]
