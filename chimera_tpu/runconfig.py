"""Run-level TOML configuration.

The reference has no config system at all — its example notebooks are the
de-facto configuration (SURVEY.md 5.6); this module gives analyses a small
declarative surface instead: one TOML file selects the population models,
likelihood settings, priors, and sampler parameters, and the builders below
turn it into framework objects.  Model *hyper-parameters* stay pytree
fields (the idiomatic JAX design the reference shares); the TOML layer only
covers run-level choices.

Example (examples/spectral_siren.toml)::

    [cosmology]
    model = "flrw"          # flrw | mg_flrw
    H0 = 70.0
    Om0 = 0.25

    [mass]
    model = "plp"           # tpl | bpl | plp | pl2p | pls

    [rate]
    model = "madau_dickinson"

    [likelihood]
    kind = "1d"
    binning = false
    # (keys here are HyperLikelihood.create kwargs; grid resolution etc.
    # belong in [data] — see examples/spectral_siren.toml)

    [prior.H0]
    range = [40.0, 120.0]

    [sampler]
    kind = "ensemble"       # ensemble | hmc
    n_walkers = 32
    n_steps = 300
"""

from __future__ import annotations

import tomllib
from dataclasses import dataclass, field
from typing import Any

from chimera_tpu.models import (
    FLRW,
    MGFLRW,
    BrokenPowerLaw,
    MadauDickinsonRate,
    Population,
    PowerLawPeak,
    PowerLawRate,
    PowerLawSpline,
    PowerLawTwoPeaks,
    TruncatedMadauDickinsonRate,
    TruncatedPowerLaw,
    TruncatedPowerLawRate,
)

COSMO_MODELS = {"flrw": FLRW, "mg_flrw": MGFLRW}
MASS_MODELS = {
    "tpl": TruncatedPowerLaw,
    "bpl": BrokenPowerLaw,
    "plp": PowerLawPeak,
    "pl2p": PowerLawTwoPeaks,
    "pls": PowerLawSpline,
}
RATE_MODELS = {
    "power_law": PowerLawRate,
    "trunc_power_law": TruncatedPowerLawRate,
    "madau_dickinson": MadauDickinsonRate,
    "trunc_madau_dickinson": TruncatedMadauDickinsonRate,
}


@dataclass
class RunConfig:
    """Parsed run configuration (all sections optional with defaults)."""

    cosmology: dict = field(default_factory=lambda: {"model": "flrw"})
    mass: dict = field(default_factory=lambda: {"model": "plp"})
    rate: dict = field(default_factory=lambda: {"model": "madau_dickinson"})
    population: dict = field(default_factory=dict)   # R0, Tobs, scale_free
    likelihood: dict = field(default_factory=dict)   # kind, binning, ...
    prior: dict = field(default_factory=dict)        # {name: {range=[lo,hi]}}
    sampler: dict = field(default_factory=dict)      # kind, n_walkers, ...
    data: dict = field(default_factory=dict)         # paths / mock settings
    # dark sirens: completeness model + z_err etc. for the catalog prior
    catalog: dict = field(default_factory=dict)
    # nside_list, mean_npixels_event, sky_conf for pixelize_gw_catalog
    pixelization: dict = field(default_factory=dict)

    @classmethod
    def from_dict(cls, raw: dict) -> "RunConfig":
        known = {f for f in cls.__dataclass_fields__}
        unknown = set(raw) - known
        if unknown:
            raise ValueError(f"unknown config sections: {sorted(unknown)}")
        return cls(**{k: dict(v) for k, v in raw.items()})

    @classmethod
    def load(cls, path: str) -> "RunConfig":
        with open(path, "rb") as f:
            return cls.from_dict(tomllib.load(f))


def _build_model(section: dict, registry: dict, what: str):
    params = dict(section)
    name = params.pop("model", None)
    if name not in registry:
        raise ValueError(
            f"{what}.model must be one of {sorted(registry)}, got {name!r}")
    return registry[name].create(**params)


def build_population(cfg: RunConfig, gal_cat: Any = None) -> Population:
    """Population (cosmology x mass x rate) from the config sections."""
    cosmo = _build_model(cfg.cosmology, COSMO_MODELS, "cosmology")
    mass = _build_model(cfg.mass, MASS_MODELS, "mass")
    rate = _build_model(cfg.rate, RATE_MODELS, "rate")
    return Population.create(cosmo, mass, rate, gal_cat=gal_cat,
                             **cfg.population)


def build_likelihood(cfg: RunConfig, theta_gw, z_grids, population,
                     selection=None):
    """HyperLikelihood from the [likelihood] section."""
    from chimera_tpu.likelihood import HyperLikelihood

    return HyperLikelihood.create(theta_gw, z_grids, population, selection,
                                  **cfg.likelihood)


def prior_bounds(cfg: RunConfig) -> dict[str, tuple[float, float]]:
    """{param: (lo, hi)} from the [prior.*] tables."""
    out = {}
    for name, spec in cfg.prior.items():
        rng = spec["range"] if isinstance(spec, dict) else spec
        if len(rng) != 2 or rng[0] >= rng[1]:
            raise ValueError(f"prior.{name}.range must be [lo, hi]")
        out[name] = (float(rng[0]), float(rng[1]))
    return out


COMPLETENESS_MODELS = {"dvdz": "DVdzCompleteness",
                       "homogeneous": "HomogeneousCompleteness"}


def build_completeness(cfg: RunConfig):
    """Completeness model from the [catalog] section (dark sirens).

    Keys: ``completeness`` ('dvdz' default), plus the model's create()
    kwargs (e.g. z_range, kind, z_sig for dvdz)."""
    from chimera_tpu import catalog as cat_mod

    params = dict(cfg.catalog)
    params.pop("z_err", None)                    # consumed by the builder
    name = params.pop("completeness", "dvdz")
    if name not in COMPLETENESS_MODELS:
        raise ValueError(
            f"catalog.completeness must be one of "
            f"{sorted(COMPLETENESS_MODELS)}, got {name!r}")
    cls = getattr(cat_mod, COMPLETENESS_MODELS[name])
    if "z_range" in params:
        params["z_range"] = tuple(params["z_range"])
    return cls.create(**params)


def pixelization_kwargs(cfg: RunConfig) -> dict:
    """Keyword arguments for data.pixelize.pixelize_gw_catalog from the
    [pixelization] section."""
    out = dict(cfg.pixelization)
    if "nside_list" in out:
        out["nside_list"] = [int(n) for n in out["nside_list"]]
    return out


def cosmo_prior(cfg: RunConfig) -> dict[str, list[float]]:
    """The cosmology-parameter subset of the priors, in the list form
    ``compute_z_grids`` expects."""
    keys = set(FLRW.hyper_keys) | set(MGFLRW.hyper_keys)
    return {k: [lo, hi] for k, (lo, hi) in prior_bounds(cfg).items()
            if k in keys}
