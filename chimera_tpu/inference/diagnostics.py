"""Sampler diagnostics: effective sample size and split-R̂.

The reference ships no convergence diagnostics (its notebooks eyeball emcee
chains; SURVEY.md 3.1) — these are standard definitions (Geyer 1992 initial
positive sequence for ESS; Gelman et al. BDA3 split-R̂), implemented with
FFT autocorrelations so a (S, C, D) chain block is one XLA program.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import Array


def _autocovariance(x: Array) -> Array:
    """Biased autocovariance per chain via FFT.  x: (S, C) -> (S, C)."""
    s = x.shape[0]
    xc = x - jnp.mean(x, axis=0, keepdims=True)
    n_fft = 2 * s  # zero-pad to avoid circular wrap
    f = jnp.fft.rfft(xc, n=n_fft, axis=0)
    acov = jnp.fft.irfft(f * jnp.conj(f), n=n_fft, axis=0)[:s]
    return acov / s


def effective_sample_size(chains: Array) -> Array:
    """ESS of (S, C) or (S, C, D) post-warmup chains (pooled over chains).

    Uses the rank-normalization-free classic estimator: mean-of-chains
    autocovariance combined with between-chain variance (Vehtari et al.
    2021 eq. 10 without rank normalization), truncated by Geyer's initial
    positive-pair rule, evaluated in one shot with a masked cumulative sum
    (no data-dependent loop — TPU/jit friendly).
    """
    if chains.ndim == 2:
        chains = chains[:, :, None]
    s, c, d = chains.shape

    def per_dim(x):                                     # (S, C)
        acov = _autocovariance(x)                       # (S, C)
        mean_acov = jnp.mean(acov, axis=1)              # (S,)
        within = mean_acov[0] * s / (s - 1.0)
        between = jnp.var(jnp.mean(x, axis=0), ddof=1) if c > 1 else 0.0
        var_plus = within * (s - 1.0) / s + between
        rho = 1.0 - (within - mean_acov) / var_plus     # (S,)
        # Geyer pairs rho[2k] + rho[2k+1]; keep while positive (monotone
        # mask via cumulative product of the positivity indicator)
        n_pairs = s // 2
        pair = rho[: 2 * n_pairs].reshape(n_pairs, 2).sum(axis=1)
        keep = jnp.cumprod(pair > 0.0)
        tau = -1.0 + 2.0 * jnp.sum(pair * keep)
        tau = jnp.maximum(tau, 1.0 / jnp.log10(s + 1.0))
        return s * c / tau

    return jnp.stack([per_dim(chains[:, :, i]) for i in range(d)])


def rhat(chains: Array) -> Array:
    """Split-R̂ of (S, C) or (S, C, D) chains (BDA3 eq. 11.4)."""
    if chains.ndim == 2:
        chains = chains[:, :, None]
    s2 = (chains.shape[0] // 2) * 2
    # split each chain in half -> 2C chains of length S/2
    halves = jnp.concatenate(
        [chains[: s2 // 2], chains[s2 // 2: s2]], axis=1)
    m, n = halves.shape[1], halves.shape[0]
    chain_means = jnp.mean(halves, axis=0)              # (2C, D)
    chain_vars = jnp.var(halves, axis=0, ddof=1)        # (2C, D)
    b = n * jnp.var(chain_means, axis=0, ddof=1)        # (D,)
    w = jnp.mean(chain_vars, axis=0)                    # (D,)
    var_hat = (n - 1.0) / n * w + b / n
    return jnp.sqrt(var_hat / w)
