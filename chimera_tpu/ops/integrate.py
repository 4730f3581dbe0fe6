"""Integration primitives: trapezoid rules and compensated reductions.

Reference semantics: CHIMERA/utils/math.py:10-26 (``trapz``, ``cumtrapz``).
TPU-native notes: the trapezoid reduction over the z axis is the innermost
reduction of the hyper-likelihood; on TPU we keep it a dense vectorized
contraction (VPU-friendly), with an optional compensated (Neumaier) summation
for f32 runs that must hit 1e-6 parity with an f64 CPU reference.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import Array


def trapz(y: Array, x: Array, axis: int = -1) -> Array:
    """Trapezoidal integral of ``y`` over nodes ``x`` along ``axis``.

    ``x`` broadcasts against ``y`` (per-row grids supported, as used for the
    per-event z-grids of shape (Nev, Nz)).
    """
    return jnp.trapezoid(y, x=x, axis=axis)


def trapz_weights(x: Array) -> Array:
    """Per-node trapezoid quadrature weights over the LAST axis:
    ``trapz(y, x) == sum(trapz_weights(x) * y, axis=-1)`` exactly (same
    pairing, modulo float reduction order).

    Used to fold the z-integral into fused kernels (ops.pallas.fused contract
    mode) as a static per-(event, z) factor.
    """
    dx = jnp.diff(x, axis=-1)
    zeros = jnp.zeros_like(x[..., :1])
    left = jnp.concatenate([zeros, dx], axis=-1)
    right = jnp.concatenate([dx, zeros], axis=-1)
    return 0.5 * (left + right)


def masked_trapz(y: Array, x: Array, mask: Array, axis: int = -1) -> Array:
    """Trapezoid over only the entries where ``mask`` is True.

    Padded/ragged integrands (events x pixels x z) keep static shapes; invalid
    slots contribute exactly zero.  Equivalent to zeroing the integrand — the
    node spacing is untouched, matching the reference's ``jnp.where(p != -100,
    integrand, 0)`` pattern (CHIMERA/likelihood.py:274-278).
    """
    y = jnp.where(mask, y, 0.0)
    return jnp.trapezoid(y, x=x, axis=axis)


def cumtrapz(y: Array, x: Array) -> Array:
    """Cumulative trapezoid with a leading zero (shape preserved).

    Matches CHIMERA/utils/math.py:22-26: ``out[0] = 0``,
    ``out[i] = sum_{j<i} 0.5*(y[j]+y[j+1])*(x[j+1]-x[j])``.
    """
    dx = jnp.diff(x)
    seg = 0.5 * (y[..., :-1] + y[..., 1:]) * dx
    # associative_scan, not cumsum: on TPU cumsum lowers to a SERIAL while
    # loop — each of the per-hyper-sample table builds (1000-1500 nodes)
    # cost ~7 ms of pure loop latency, making population.update a fixed
    # ~30 ms per batch.  The log-depth scan is ~11 vectorized steps.
    res = jax.lax.associative_scan(jnp.add, seg, axis=-1)
    zero = jnp.zeros(res.shape[:-1] + (1,), dtype=res.dtype)
    return jnp.concatenate([zero, res], axis=-1)


def neumaier_sum(x: Array, axis: int = -1) -> Array:
    """Compensated (Neumaier) sum along ``axis``.

    Sequential ``lax.scan`` over the reduction axis — use only where f32
    round-off genuinely threatens the 1e-6 parity gate (e.g. very long
    injection reductions); elsewhere prefer plain ``jnp.sum`` (XLA's pairwise
    tree reduction is already well-conditioned and much faster).
    """
    x = jnp.moveaxis(x, axis, 0)

    def step(carry, xi):
        s, c = carry
        t = s + xi
        # Neumaier's correction: pick the larger-magnitude operand.
        c = c + jnp.where(jnp.abs(s) >= jnp.abs(xi), (s - t) + xi, (xi - t) + s)
        return (t, c), None

    zeros = jnp.zeros(x.shape[1:], dtype=x.dtype)
    (s, c), _ = jax.lax.scan(step, (zeros, zeros), x)
    return s + c


def sum_and_sumsq(x: Array, axis: int = -1) -> tuple[Array, Array]:
    """One-pass ``(sum(x), sum(x**2))`` — the pair needed for Kish/variance
    effective-sample-size guards (reference: selection_function.py:43-47)."""
    return jnp.sum(x, axis=axis), jnp.sum(jnp.square(x), axis=axis)
