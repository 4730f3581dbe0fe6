"""Merger-rate evolution models psi(z) as functional pytrees.

Capability parity with CHIMERA/population/rate.py (models :32-88, functions
:96-129).  All rates are smooth elementwise maps — pure VPU work on TPU.
"""

from __future__ import annotations

from typing import ClassVar

import jax.numpy as jnp
from jax import Array

from chimera_tpu import pytree


@pytree.dataclass
class BaseRateModel:
    name: ClassVar[str] = "base_rate"
    hyper_keys: ClassVar[tuple[str, ...]] = ()

    @classmethod
    def create(cls, **kwargs):
        defaults = {k: getattr(cls, k) for k in cls.hyper_keys}
        unknown = set(kwargs) - set(defaults)
        if unknown:
            raise TypeError(f"unknown rate parameters: {sorted(unknown)}")
        params = dict(defaults)
        params.update(kwargs)
        return cls(**params)

    @property
    def as_dict(self) -> dict:
        return {k: getattr(self, k) for k in self.hyper_keys}

    def update(self, **hyper):
        relevant = {k: v for k, v in hyper.items() if k in self.hyper_keys}
        if not relevant:
            return self
        merged = self.as_dict
        merged.update(relevant)
        return type(self).create(**merged)

    def rate(self, z: Array) -> Array:  # pragma: no cover
        raise NotImplementedError


@pytree.dataclass
class PowerLawRate(BaseRateModel):
    """psi(z) = (1+z)^gamma (rate.py:32-49, 96-99)."""

    gamma: Array = 1.7
    name: ClassVar[str] = "power_law"
    hyper_keys: ClassVar[tuple[str, ...]] = ("gamma",)

    def rate(self, z: Array) -> Array:
        return jnp.power(1.0 + z, self.gamma)


@pytree.dataclass
class TruncatedPowerLawRate(BaseRateModel):
    """Normalized power law truncated at zmax (rate.py:83-88, 101-106)."""

    gamma: Array = 1.9
    zmax: Array = 1.3
    name: ClassVar[str] = "trunc_power_law"
    hyper_keys: ClassVar[tuple[str, ...]] = ("gamma", "zmax")

    def rate(self, z: Array) -> Array:
        pdf = jnp.power(1.0 + z, self.gamma)
        norm = (jnp.power(1.0 + self.zmax, self.gamma + 1.0) - 1.0) / (self.gamma + 1.0)
        return jnp.where(z < self.zmax, pdf / norm, 0.0)


@pytree.dataclass
class MadauDickinsonRate(BaseRateModel):
    """Madau-Dickinson SFR-like rate, normalized to psi(0)=1
    (rate.py:51-72, 110-115)."""

    gamma: Array = 2.7
    kappa: Array = 3.0
    zp: Array = 2.0
    name: ClassVar[str] = "madau_dickinson"
    hyper_keys: ClassVar[tuple[str, ...]] = ("gamma", "kappa", "zp")

    def rate(self, z: Array) -> Array:
        raw = jnp.power(1.0 + z, self.gamma) / (
            1.0 + jnp.power((1.0 + z) / (1.0 + self.zp), self.gamma + self.kappa))
        inv_norm = 1.0 + jnp.power(1.0 + self.zp, -self.gamma - self.kappa)
        return inv_norm * raw


@pytree.dataclass
class TruncatedMadauDickinsonRate(BaseRateModel):
    """Madau-Dickinson truncated at zmax (rate.py:74-81, 117-122)."""

    gamma: Array = 2.7
    kappa: Array = 3.0
    zp: Array = 2.0
    zmax: Array = 1.3
    name: ClassVar[str] = "trunc_madau_dickinson"
    hyper_keys: ClassVar[tuple[str, ...]] = ("gamma", "kappa", "zp", "zmax")

    def rate(self, z: Array) -> Array:
        raw = jnp.power(1.0 + z, self.gamma) / (
            1.0 + jnp.power((1.0 + z) / (1.0 + self.zp), self.gamma + self.kappa))
        inv_norm = 1.0 + jnp.power(1.0 + self.zp, -self.gamma - self.kappa)
        return jnp.where(z < self.zmax, inv_norm * raw, 0.0)


def merger_rate(rate_model: BaseRateModel, z: Array) -> Array:
    """psi(z | lambda_z) — free-function alias (rate.py:96-129)."""
    return rate_model.rate(z)
