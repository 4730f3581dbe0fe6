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

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
# Persistent compile cache: the fast suite is compile-heavy on a 1-core
# box; caching compiled programs across pytest runs cuts warm reruns
# substantially and costs nothing on a cold run.
jax.config.update("jax_compilation_cache_dir", "/tmp/chimera_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

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
    key = jax.random.PRNGKey(42)
    return make_mock_catalog(
        key, fiducial_population, n_events=24, n_samples=256,
        snr_threshold=12.0)


@pytest.fixture(scope="session")
def mock_injections(fiducial_population):
    key = jax.random.PRNGKey(7)
    return make_mock_injections(
        key, fiducial_population, n_generated=50_000, snr_threshold=12.0)


@pytest.fixture(scope="session")
def mock_z_grids(fiducial_population, mock_catalog):
    return compute_z_grids(
        fiducial_population.cosmo, mock_catalog,
        cosmo_prior={"H0": [30.0, 150.0]}, z_int_res=200)
