"""Chebyshev interpolants: gather-free function evaluation for the hot path.

TPU rationale: the VPU has no per-lane gather — every ``jnp.interp`` /
table-lookup over the (events x samples) axes serializes (~30 ms per 4M
lookups measured on v5e, vs ~4 ms for a degree-64 Clenshaw evaluation of the
same smooth function as pure arithmetic).  The reference's cosmology tables
(CHIMERA/population/cosmo.py:43-46, 132, 260-264) and mass-CDF lookups
(mass.py:334-345) therefore become Chebyshev series here: the fit is rebuilt
per hyper-sample inside the jitted graph (a ~64-point matmul — negligible),
and per-sample evaluation is a fixed-depth recurrence with zero memory
traffic.

Accuracy: the target functions (comoving-distance integral, distance-redshift
inversion, windowed mass-CDF segment) are analytic on their domains, so the
series converge geometrically; degree 64 reaches ~1e-10 relative for the
cosmology functions (validated in tests against the dense-table oracle).
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array


def cheb_nodes(n: int, a, b) -> Array:
    """Chebyshev-Gauss nodes mapped to [a, b] (ascending)."""
    # Static node positions in f64 (the f32 cos of these small arguments is
    # fine, but exactness here is free — n is a Python int).
    x = np.cos(np.pi * (np.arange(n) + 0.5) / n)  # descending in (-1, 1)
    x = jnp.asarray(x[::-1])
    return 0.5 * (a + b) + 0.5 * (b - a) * x


@lru_cache(maxsize=32)
def _dct_basis(n: int) -> np.ndarray:
    """Static DCT-II projection matrix, computed in f64 on the host.

    Computing ``cos(pi * j * (k + 0.5) / n)`` in on-device f32 was the
    round-3 dark-siren parity bottleneck: at n = 64 the arguments reach
    ~200 rad, so f32 argument rounding alone puts ~1e-5 absolute noise in
    the basis entries and ~3e-6 in every fitted coefficient — which the
    KDE's 1/h sensitivity then amplifies ~40x into the per-event
    integrals.  The matrix depends only on n (a Python int), so it is an
    exact compile-time constant, not traced work."""
    k = np.arange(n)
    j = np.arange(n)
    return np.cos(np.pi * j[:, None] * (k[None, :] + 0.5) / n)


def chebfit_from_values(vals: Array) -> Array:
    """Chebyshev coefficients from function values at ``cheb_nodes(n, a, b)``.

    DCT-II-style projection expressed as a small (n x n) matmul so it traces
    cleanly into the jitted update graph.
    """
    n = vals.shape[-1]
    basis = jnp.asarray(_dct_basis(n), dtype=vals.dtype)
    # full-precision matmul: TPU default (single-pass bf16) would put
    # ~1e-3 relative noise on the fitted coefficients and destroy the
    # engine's 1e-10 accuracy claim on real hardware
    coeffs = (2.0 / n) * jnp.matmul(basis, vals[..., ::-1],
                                    precision=jax.lax.Precision.HIGHEST)
    return coeffs.at[..., 0].mul(0.5)


def chebfit_from_table(x_table: Array, y_table: Array, a, b, n: int) -> Array:
    """Fit a series by sampling a (dense, monotone-x) table at the nodes.

    The table is only touched at n points (a trivially small gather), after
    which evaluation is gather-free everywhere.
    """
    nodes = cheb_nodes(n, a, b)
    vals = jnp.interp(nodes, x_table, y_table)
    return chebfit_from_values(vals)


def chebfit_from_fn(fn, a, b, n: int) -> Array:
    return chebfit_from_values(fn(cheb_nodes(n, a, b)))


def _clenshaw(coeffs: Array, t: Array) -> Array:
    """Unrolled Clenshaw recurrence on normalized t in [-1, 1].

    Unrolled because a lax.fori_loop would carry two x-shaped arrays
    through ~64 iterations — on TPU each iteration round-trips the carries
    through HBM (x is the (events x samples) hot axis, so that is GBs of
    traffic).  Unrolled, the whole recurrence is one fused elementwise
    chain that XLA keeps in registers."""
    t2 = 2.0 * t
    n = coeffs.shape[0]
    b1 = jnp.zeros_like(t)
    b2 = jnp.zeros_like(t)
    for i in range(n - 1):
        b1, b2 = t2 * b1 - b2 + coeffs[n - 1 - i], b1
    return t * b1 - b2 + coeffs[0]


def _chebeval_bwd_core(coeffs, x, a, b, clip, ct):
    """Analytic VJP of the series evaluation.

    JAX's own transpose of the unrolled Clenshaw produces one scatter-add
    per coefficient read — unsupported inside Pallas TPU kernels (Mosaic
    has no 1-D scatter layout) and slow in XLA.  Analytically:
      d/dc_k   = sum(ct * T_k(t))                (forward T recurrence)
      d/dx     = ct * S'(t) * 2/(b-a)            (derivative series via U)
      d/da,d/db through t = (2x-(a+b))/(b-a):
                 dt/da = (t-1)/(b-a), dt/db = -(t+1)/(b-a)
    Clipped points have t pinned at +-1, so every partial vanishes there
    (one-sided boundary, measure zero)."""
    n = coeffs.shape[0]
    xc = jnp.clip(x, a, b) if clip else x
    span = b - a
    t = (2.0 * xc - (a + b)) / span
    if clip:
        active = (x > a) & (x < b)
        ct_t = jnp.where(active, ct, 0.0)
    else:
        ct_t = ct

    # T_k and U_k forward recurrences; accumulate coefficient projections
    # and the derivative series S'(t) = sum_k k c_k U_{k-1}(t).
    # Projections are kept (1, 1)-shaped and concatenated on the last axis:
    # Mosaic (Pallas TPU) cannot lay out a stack of rank-0 scalars into a
    # 1-D vector, and this bwd runs inside the fused adjoint kernel.
    g = [jnp.sum(ct).reshape(1, 1)]        # d/dc_0 (T_0 = 1; clip-independent)
    t_km1 = jnp.ones_like(t)
    t_k = t
    u_km1 = jnp.ones_like(t)               # U_0
    dS = coeffs[1] * u_km1 if n > 1 else jnp.zeros_like(t)
    if n > 1:
        g.append(jnp.sum(ct * t_k).reshape(1, 1))
    u_k = 2.0 * t                          # U_1
    for k in range(2, n):
        t_kp = 2.0 * t * t_k - t_km1
        g.append(jnp.sum(ct * t_kp).reshape(1, 1))
        dS = dS + coeffs[k] * k * u_k          # U_{k-1} == u_k at this point
        t_km1, t_k = t_k, t_kp
        u_km1, u_k = u_k, 2.0 * t * u_k - u_km1
    dcoeffs = jnp.concatenate(g, axis=1).astype(coeffs.dtype).reshape(
        coeffs.shape)

    dt = ct_t * dS
    dx = dt * (2.0 / span)
    da = jnp.sum(dt * (t - 1.0) / span)
    db = jnp.sum(dt * (-(t + 1.0)) / span)
    return dcoeffs, dx, da, db


@jax.custom_vjp
def _chebeval_clip(coeffs: Array, x: Array, a, b) -> Array:
    xc = jnp.clip(x, a, b)
    t = (2.0 * xc - (a + b)) / (b - a)
    return _clenshaw(coeffs, t)


def _chebeval_clip_fwd(coeffs, x, a, b):
    return _chebeval_clip(coeffs, x, a, b), (coeffs, x, a, b)


def _chebeval_clip_bwd(res, ct):
    return _chebeval_bwd_core(*res, True, ct)


_chebeval_clip.defvjp(_chebeval_clip_fwd, _chebeval_clip_bwd)


@jax.custom_vjp
def _chebeval_noclip(coeffs: Array, x: Array, a, b) -> Array:
    t = (2.0 * x - (a + b)) / (b - a)
    return _clenshaw(coeffs, t)


def _chebeval_noclip_fwd(coeffs, x, a, b):
    return _chebeval_noclip(coeffs, x, a, b), (coeffs, x, a, b)


def _chebeval_noclip_bwd(res, ct):
    return _chebeval_bwd_core(*res, False, ct)


_chebeval_noclip.defvjp(_chebeval_noclip_fwd, _chebeval_noclip_bwd)


def chebeval(coeffs: Array, x: Array, a, b, clip: bool = True) -> Array:
    """Evaluate the series at ``x`` via Clenshaw recurrence (pure VPU math).

    ``clip=True`` clamps x into [a, b] — matching ``jnp.interp``'s edge
    behavior (the reference relies on this clamping for out-of-range
    distances, cosmo.py:260-264).  Carries an analytic custom VJP
    (scatter-free — required inside Pallas kernels, faster in XLA)."""
    a = jnp.asarray(a, dtype=jnp.result_type(x))
    b = jnp.asarray(b, dtype=jnp.result_type(x))
    if clip:
        return _chebeval_clip(coeffs, x, a, b)
    return _chebeval_noclip(coeffs, x, a, b)
