"""End-to-end parity against the naive pure-NumPy oracle.

The oracle (tests/oracles/naive_numpy.py) re-derives the reference's hyper-
likelihood formulas in plain NumPy loops with no shared code — a second,
independent transcription.  The package is configured to its 'table'
engines (the reference's discretization semantics) so agreement is tight;
a mismatch here means one of the two transcriptions mis-read the math.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from chimera_tpu import HyperLikelihood, SelectionFunction
from chimera_tpu.catalog import EmptyCatalog
from chimera_tpu.data.mock import make_mock_catalog, make_mock_injections
from chimera_tpu.models import (
    FLRW,
    MadauDickinsonRate,
    Population,
    PowerLawPeak,
    compute_z_grids,
)

from oracles.naive_numpy import (
    OracleCosmo,
    OraclePLP,
    marginalized_log_hyperlike,
    oracle_md_rate,
    spectral_log_hyperlike,
)


def _table_population(gal_cat=None):
    cosmo = FLRW.create(H0=70.0, Om0=0.25, interp_method="table",
                        z_grid_res=1500)
    mass = PowerLawPeak.create(cdf_engine="table", grid_res=1000)
    rate = MadauDickinsonRate.create()
    return Population.create(cosmo, mass, rate,
                             gal_cat=gal_cat or EmptyCatalog())


def test_cosmology_matches_oracle():
    pop = _table_population()
    oc = OracleCosmo(H0=70.0, Om0=0.25, z_grid_res=1500)
    from chimera_tpu.models import cosmology as cf

    z = np.linspace(0.01, 5.0, 200)
    np.testing.assert_allclose(np.asarray(cf.dl_at_z(pop.cosmo, z)),
                               oc.dL(z), rtol=1e-12)
    np.testing.assert_allclose(
        np.asarray(cf.differential_comoving_volume(pop.cosmo, z)),
        oc.dVdz(z), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(cf.ddl_dz_at_z(pop.cosmo, z)),
                               oc.ddLdz(z), rtol=1e-12)
    d = np.linspace(0.05, 40.0, 300)
    np.testing.assert_allclose(np.asarray(cf.z_from_dgw(pop.cosmo, d)),
                               oc.z_from_dl(d), rtol=1e-10)


def test_mass_model_matches_oracle():
    pop = _table_population()
    om = OraclePLP()
    from chimera_tpu.models.mass import p_m1m2

    rng = np.random.default_rng(5)
    m1 = rng.uniform(4.0, 95.0, 500)
    m2 = rng.uniform(4.0, 95.0, 500) * 0.9
    got = np.asarray(p_m1m2(pop.mass, m1, m2))
    expect = om.p_m1m2(m1, m2)
    np.testing.assert_allclose(got, expect, rtol=1e-9, atol=1e-300)


def test_rate_matches_oracle():
    pop = _table_population()
    z = np.linspace(0.0, 8.0, 100)
    np.testing.assert_allclose(np.asarray(pop.rate.rate(z)),
                               oracle_md_rate(z), rtol=1e-12)


@pytest.fixture(scope="module")
def spectral_data():
    pop = _table_population()
    cat = make_mock_catalog(jax.random.PRNGKey(3), pop, n_events=8,
                            n_samples=256, snr_threshold=12.0)
    inj, n_gen = make_mock_injections(jax.random.PRNGKey(4), pop,
                                      n_generated=30_000, snr_threshold=12.0)
    z_grids = compute_z_grids(pop.cosmo, cat,
                              cosmo_prior={"H0": [40.0, 120.0]},
                              z_int_res=100)
    return pop, cat, inj, n_gen, z_grids


@pytest.mark.parametrize("h0", [60.0, 70.0, 85.0])
def test_spectral_end_to_end_matches_oracle(spectral_data, h0):
    pop, cat, inj, n_gen, z_grids = spectral_data
    sel = SelectionFunction.create(inj, n_gen)
    hl = HyperLikelihood.create(cat, z_grids, pop, sel, binning=False,
                                kde_engine="xla")
    got = float(hl.log_like(H0=h0))
    expect = spectral_log_hyperlike(
        {"H0": h0},
        np.asarray(cat.m1det), np.asarray(cat.m2det), np.asarray(cat.dL),
        np.asarray(cat.pe_prior) if cat.pe_prior is not None
        else np.ones_like(np.asarray(cat.dL)),
        np.asarray(z_grids),
        np.asarray(inj.m1det), np.asarray(inj.m2det), np.asarray(inj.dL),
        np.asarray(inj.p_draw), float(n_gen))
    np.testing.assert_allclose(got, expect, rtol=1e-9)


def test_marginalized_end_to_end_matches_oracle():
    from chimera_tpu import pytree
    from chimera_tpu.catalog import DVdzCompleteness
    from chimera_tpu.catalog.build import build_pixelated_catalog
    from chimera_tpu.data.mock import make_mock_galaxies
    from chimera_tpu.data.pixelize import pixelize_gw_catalog

    pop = _table_population()
    theta, truths = make_mock_catalog(
        jax.random.PRNGKey(21), pop, n_events=6, n_samples=256,
        sigma_sky_rad=0.03, oversample=400, return_truths=True)
    theta = pixelize_gw_catalog(theta, nside_list=[8, 16],
                                mean_npixels_event=5, sky_conf=0.9)
    z_grids = compute_z_grids(pop.cosmo, theta,
                              cosmo_prior={"H0": [40.0, 120.0]},
                              z_int_res=100)
    gal = make_mock_galaxies(jax.random.PRNGKey(22), pop, truths,
                             n_background=6_000)
    compl = DVdzCompleteness.create(z_range=(0.0, 3.0), kind="step")
    gc = build_pixelated_catalog(gal, theta, z_grids, pop.cosmo, compl,
                                 z_err=0.01)
    pop_pix = pytree.replace(pop, gal_cat=gc)
    inj, n_gen = make_mock_injections(jax.random.PRNGKey(23), pop,
                                      n_generated=30_000, snr_threshold=12.0)
    sel = SelectionFunction.create(inj, n_gen)
    hl = HyperLikelihood.create(theta, z_grids, pop_pix, sel,
                                kind="marginalized", binning=False,
                                kde_engine="xla")
    got = float(hl.log_like(H0=72.0))
    expect = marginalized_log_hyperlike(
        {"H0": 72.0},
        np.asarray(theta.m1det), np.asarray(theta.m2det),
        np.asarray(theta.dL), np.asarray(theta.pe_prior),
        np.asarray(z_grids),
        np.asarray(theta.pixels_pe_opt_nside),
        np.asarray(theta.pixels_opt_nsides),
        np.asarray(theta.pixel_mask), np.asarray(theta.gw_loc2d_pdf),
        np.asarray(gc.p_cat), np.asarray(gc.P_compl),
        (0.0, 3.0),
        np.asarray(inj.m1det), np.asarray(inj.m2det), np.asarray(inj.dL),
        np.asarray(inj.p_draw), float(n_gen))
    np.testing.assert_allclose(got, expect, rtol=1e-9)
