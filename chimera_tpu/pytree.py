"""Frozen-dataclass pytrees: the structural backbone of every model in the framework.

The reference framework (CHIMERA) uses ``equinox.Module`` with in-``__init__``
mutation tricks (reference: CHIMERA/population/cosmo.py:22-27).  Here we use
plain frozen dataclasses registered with :func:`jax.tree_util.register_dataclass`,
which maps directly onto JAX's native pytree machinery: *data* fields are traced
leaves, *static* fields become part of the treedef (and therefore of the jit
cache key).  This keeps jit-cache behaviour explicit and avoids third-party
dispatch layers.
"""

from __future__ import annotations

import dataclasses
from typing import Any, TypeVar

import jax

_T = TypeVar("_T")


def static_field(**kwargs: Any) -> Any:
    """A dataclass field stored in the pytree *treedef* (auxiliary data).

    Static fields must be hashable; they participate in jit-cache keys.
    Use for configuration (resolutions, flags, kernel names), never for
    numerical parameters that an MCMC sampler will vary.
    """
    metadata = dict(kwargs.pop("metadata", {}))
    metadata["static"] = True
    return dataclasses.field(metadata=metadata, **kwargs)


def dataclass(cls: type[_T] | None = None, **kwargs: Any):
    """Decorator: frozen dataclass registered as a JAX pytree.

    Fields created with :func:`static_field` go into the treedef; all other
    fields are pytree leaves (traceable, differentiable, vmappable).
    """

    def wrap(c: type[_T]) -> type[_T]:
        c = dataclasses.dataclass(frozen=True, **kwargs)(c)
        flds = dataclasses.fields(c)
        data_fields = [f.name for f in flds if not f.metadata.get("static", False)]
        meta_fields = [f.name for f in flds if f.metadata.get("static", False)]
        return jax.tree_util.register_dataclass(
            c, data_fields=data_fields, meta_fields=meta_fields
        )

    return wrap if cls is None else wrap(cls)


def replace(obj: _T, **changes: Any) -> _T:
    """Functional field update (alias of :func:`dataclasses.replace`)."""
    return dataclasses.replace(obj, **changes)


def fields(obj: Any):
    return dataclasses.fields(obj)
