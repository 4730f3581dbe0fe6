"""Test harness configuration.

Tests run on a *virtual 8-device CPU mesh* (the TPU-native replacement for
the reference's test-by-running-on-the-cluster non-strategy — SURVEY.md 4)
with x64 enabled so CPU f64 results can serve as the golden oracle for f32
TPU-path comparisons within the same process.
"""

import os

# NOTE: this environment may pre-register a TPU PJRT plugin and force
# JAX_PLATFORMS before pytest starts; override *in process* (env vars alone
# are not honored once jax has been imported by sitecustomize).
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import gc

# The suite keeps hundreds of compiled programs and large fixture arrays
# alive; with default thresholds CPython's generational GC walks that
# ever-growing object graph on every ~700 allocations, inflating late-suite
# test times ~2x over the same test run in isolation (measured: the dark
# adjoint test 80 s alone vs 190 s at the end of the full run).  Raise the
# gen-0 threshold; real garbage is still reclaimed by refcounting.
gc.set_threshold(100_000, 50, 50)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
# Persistent compile cache: the fast suite is compile-heavy on a 1-core
# box; caching compiled programs across pytest runs cuts warm reruns
# substantially and costs nothing on a cold run.  Per-user location (not a
# fixed world-writable /tmp path): deserialized executables are trusted
# code, so another local user must not be able to pre-create or poison the
# directory.  CHIMERA_JAX_CACHE overrides.
jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("CHIMERA_JAX_CACHE")
    or os.path.join(os.path.expanduser("~"), ".cache", "chimera_jax"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp  # noqa: E402
import pytest  # noqa: E402

from chimera_tpu.catalog import EmptyCatalog  # noqa: E402
from chimera_tpu.data.mock import make_mock_catalog, make_mock_injections  # noqa: E402
from chimera_tpu.models import (  # noqa: E402
    FLRW,
    MadauDickinsonRate,
    Population,
    PowerLawPeak,
    compute_z_grids,
)


@pytest.fixture(scope="session")
def fiducial_population():
    cosmo = FLRW.create(H0=70.0, Om0=0.25)
    mass = PowerLawPeak.create()
    rate = MadauDickinsonRate.create()
    return Population.create(cosmo, mass, rate, gal_cat=EmptyCatalog())


@pytest.fixture(scope="session")
def mock_catalog(fiducial_population):
    # 16 events = 2 fused event-tiles (multi-tile coverage at half the
    # interpret-mode trace/lowering cost of the old 24).
    key = jax.random.PRNGKey(42)
    return make_mock_catalog(
        key, fiducial_population, n_events=16, n_samples=256,
        snr_threshold=12.0)


@pytest.fixture(scope="session")
def mock_injections(fiducial_population):
    key = jax.random.PRNGKey(7)
    return make_mock_injections(
        key, fiducial_population, n_generated=20_000, snr_threshold=12.0)


@pytest.fixture(scope="session")
def mock_z_grids(fiducial_population, mock_catalog):
    return compute_z_grids(
        fiducial_population.cosmo, mock_catalog,
        cosmo_prior={"H0": [30.0, 150.0]}, z_int_res=200)


@pytest.fixture(scope="session")
def _dark_siren_raw(fiducial_population):
    """ONE shared dark-siren (pixelated galaxy catalog) setup.

    Session-scoped because three modules (fused-kernel parity, pixelated
    likelihood, plotting) used to each build a near-identical fixture —
    three mock catalogs, three pixelizations, three galaxy-catalog builds —
    which dominated their setup time on the 1-core test box.

    Returns a dict with the full build chain, including the intermediate
    ``galaxies``/``compl`` so tests that need a catalog rebuilt on
    *different* z-grids (e.g. the fast-loop adjoint gate) can do so without
    regenerating the mock sky.
    """
    from chimera_tpu import SelectionFunction, pytree
    from chimera_tpu.catalog import DVdzCompleteness
    from chimera_tpu.catalog.build import build_pixelated_catalog
    from chimera_tpu.data.mock import make_mock_galaxies
    from chimera_tpu.data.pixelize import pixelize_gw_catalog

    pop = fiducial_population
    k_cat, k_gal, k_inj = jax.random.split(jax.random.PRNGKey(123), 3)
    theta, truths = make_mock_catalog(
        k_cat, pop, n_events=8, n_samples=256, snr_threshold=14.0,
        sigma_sky_rad=0.03, oversample=400, return_truths=True)
    theta = pixelize_gw_catalog(theta, nside_list=[8, 16],
                                mean_npixels_event=6, sky_conf=0.9)
    z_grids = compute_z_grids(pop.cosmo, theta,
                              cosmo_prior={"H0": [40.0, 120.0]},
                              z_int_res=100)
    galaxies = make_mock_galaxies(k_gal, pop, truths, n_background=12_000)
    compl = DVdzCompleteness.create(z_range=(0.0, 3.0), kind="step")
    gal_cat = build_pixelated_catalog(galaxies, theta, z_grids, pop.cosmo,
                                      compl, z_err=0.01)
    pop_pix = pytree.replace(pop, gal_cat=gal_cat)
    # 40k generated -> ~750 detected: enough to clear the selection
    # N_eff gate (20k leaves n_exp gated to zero -> -inf likelihoods)
    theta_inj, n_inj = make_mock_injections(k_inj, pop, n_generated=40_000,
                                            snr_threshold=14.0)
    sel = SelectionFunction.create(theta_inj, n_inj)
    return dict(theta=theta, z_grids=z_grids, pop_pix=pop_pix, sel=sel,
                truths=truths, galaxies=galaxies, compl=compl)


@pytest.fixture(scope="session")
def dark_siren_setup(_dark_siren_raw):
    """(theta, z_grids, pop_pix, sel, truths): 8 events (one fused
    event-tile) x 256 PE samples, nside in {8, 16}, ~6 pixels/event,
    100-pt z-grids, 12k background + clustered host galaxies."""
    r = _dark_siren_raw
    return r["theta"], r["z_grids"], r["pop_pix"], r["sel"], r["truths"]


@pytest.fixture(scope="session")
def dark_siren_extras(_dark_siren_raw):
    """(galaxies, compl) from the shared dark-siren build — for tests that
    rebuild the pixelated catalog on alternative z-grids."""
    return _dark_siren_raw["galaxies"], _dark_siren_raw["compl"]
