"""Run-level TOML configuration (chimera_tpu.runconfig)."""

import jax
import numpy as np
import pytest

from chimera_tpu.runconfig import (
    RunConfig,
    build_likelihood,
    build_population,
    cosmo_prior,
    prior_bounds,
)

TOML = """
[cosmology]
model = "flrw"
H0 = 67.0
Om0 = 0.31

[mass]
model = "plp"
mu_g = 33.0

[rate]
model = "power_law"
gamma = 2.0

[population]
scale_free = true

[likelihood]
binning = false

[prior.H0]
range = [40.0, 120.0]

[prior.Om0]
range = [0.05, 0.95]

[sampler]
kind = "ensemble"
n_walkers = 8
"""


@pytest.fixture()
def cfg(tmp_path):
    p = tmp_path / "run.toml"
    p.write_text(TOML)
    return RunConfig.load(str(p))


def test_load_and_build_population(cfg):
    pop = build_population(cfg)
    assert float(pop.cosmo.H0) == 67.0
    assert float(pop.mass.mu_g) == 33.0
    assert float(pop.rate.gamma) == 2.0
    assert pop.scale_free


def test_priors(cfg):
    b = prior_bounds(cfg)
    assert b["H0"] == (40.0, 120.0)
    cp = cosmo_prior(cfg)
    assert cp == {"H0": [40.0, 120.0], "Om0": [0.05, 0.95]}


def test_build_likelihood_end_to_end(cfg, mock_catalog, mock_injections,
                                     mock_z_grids):
    from chimera_tpu import SelectionFunction

    pop = build_population(cfg)
    inj, n_gen = mock_injections
    hl = build_likelihood(cfg, mock_catalog, mock_z_grids, pop,
                          SelectionFunction.create(inj, n_gen))
    assert not hl.binning
    val = float(hl.log_like(H0=70.0))
    assert np.isfinite(val)


def test_unknown_section_rejected(tmp_path):
    p = tmp_path / "bad.toml"
    p.write_text("[nonsense]\nx = 1\n")
    with pytest.raises(ValueError, match="unknown config sections"):
        RunConfig.load(str(p))


def test_unknown_model_rejected(tmp_path):
    p = tmp_path / "bad2.toml"
    p.write_text('[mass]\nmodel = "nope"\n')
    with pytest.raises(ValueError, match="mass.model"):
        build_population(RunConfig.load(str(p)))


def test_catalog_and_pixelization_sections(tmp_path):
    from chimera_tpu.catalog import DVdzCompleteness
    from chimera_tpu.runconfig import build_completeness, pixelization_kwargs

    p = tmp_path / "dark.toml"
    p.write_text("""
[catalog]
completeness = "dvdz"
z_range = [0.0, 2.5]
kind = "step"
z_err = 0.02

[pixelization]
nside_list = [8, 16]
mean_npixels_event = 6
sky_conf = 0.9
""")
    cfg = RunConfig.load(str(p))
    compl = build_completeness(cfg)
    assert isinstance(compl, DVdzCompleteness)
    assert float(compl.z_range[1]) == 2.5
    kw = pixelization_kwargs(cfg)
    assert kw["nside_list"] == [8, 16] and kw["sky_conf"] == 0.9


def test_unknown_completeness_rejected(tmp_path):
    from chimera_tpu.runconfig import build_completeness

    p = tmp_path / "bad3.toml"
    p.write_text('[catalog]\ncompleteness = "nope"\n')
    with pytest.raises(ValueError, match="catalog.completeness"):
        build_completeness(RunConfig.load(str(p)))
