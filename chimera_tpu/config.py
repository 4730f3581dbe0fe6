"""Runtime configuration: logging, precision policy, platform helpers.

Replaces the reference's import-time side effects (CHIMERA/utils/config.py:5
sets ``jax_enable_x64=True`` globally at import).  A TPU-native framework must
not force x64 — TPUs have no fast f64 path.  Instead the precision policy is:

* **Hot path** (per-MCMC-sample likelihood): f32 arrays with compensated /
  pairwise reductions where dynamic range demands it.
* **Precompute / golden tests** (host, run once): callers opt into x64 via
  :func:`enable_x64` (or the usual JAX env vars) — typically on CPU.

Nothing here mutates global JAX state at import time.
"""

from __future__ import annotations

import logging
import os

import jax
import jax.numpy as jnp

logger = logging.getLogger("chimera_tpu")
if not logger.handlers:
    _h = logging.StreamHandler()
    _h.setFormatter(
        logging.Formatter("%(asctime)s %(name)s [%(levelname)s] %(message)s")
    )
    logger.addHandler(_h)
    logger.setLevel(os.environ.get("CHIMERA_TPU_LOGLEVEL", "INFO"))


def enable_x64(enable: bool = True) -> None:
    """Enable/disable 64-bit mode globally (use for CPU golden references)."""
    jax.config.update("jax_enable_x64", enable)


def x64_enabled() -> bool:
    return bool(jax.config.read("jax_enable_x64"))


def default_float() -> jnp.dtype:
    """The current default floating dtype (f64 iff x64 mode is on)."""
    return jnp.asarray(0.0).dtype


def default_int() -> jnp.dtype:
    return jnp.asarray(0).dtype


def on_tpu() -> bool:
    return jax.default_backend() in ("tpu", "axon")
