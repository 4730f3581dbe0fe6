"""JAX-native affine-invariant ensemble MCMC (Goodman & Weare stretch move).

Replaces the reference's emcee + MPI lock-step machinery
(CHIMERA/utils/emcee_utils.py:162-334: ``NotMove`` dummy proposals and a
customized sampler so non-root ranks stay synchronized) with a sampler that
*is* a jitted JAX program: the whole chain advances under ``lax.scan`` with
walkers vectorized through ``vmap``, so walker-parallel likelihood evaluation
— the reference's 'params' MPI scheme — is just an axis, shardable over the
mesh.  All randomness flows through explicit PRNG keys; the state is a pytree
that checkpoints trivially (chimera_tpu.inference.checkpoint).

The algorithm matches emcee's default ``StretchMove`` (Goodman & Weare 2010,
red-blue split variant of Foreman-Mackey et al. 2013): z ~ g(z) ∝ 1/sqrt(z)
on [1/a, a]; accept with probability z^(D-1) * p(new)/p(old).
"""

from __future__ import annotations

import functools
from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
from jax import Array

from chimera_tpu import pytree


@pytree.dataclass
class EnsembleState:
    """Sampler state: walker positions, cached log-probs, PRNG key, counters."""

    coords: Array = None      # (n_walkers, ndim)
    log_prob: Array = None    # (n_walkers,)
    key: Array = None
    n_accepted: Array = 0     # (n_walkers,) cumulative
    iteration: Array = 0


def _stretch_half(key, active, other, logp_active, log_prob_fn, a: float):
    """One red-blue half update: move ``active`` walkers using partners drawn
    from the frozen ``other`` half."""
    n_act, ndim = active.shape
    k_z, k_pick, k_acc = jax.random.split(key, 3)
    u = jax.random.uniform(k_z, (n_act,))
    z = ((a - 1.0) * u + 1.0) ** 2 / a
    partners = other[jax.random.randint(k_pick, (n_act,), 0, other.shape[0])]
    proposal = partners + z[:, None] * (active - partners)
    logp_new = log_prob_fn(proposal)
    log_accept = (ndim - 1.0) * jnp.log(z) + logp_new - logp_active
    accept = jnp.log(jax.random.uniform(k_acc, (n_act,))) < log_accept
    coords = jnp.where(accept[:, None], proposal, active)
    logp = jnp.where(accept, logp_new, logp_active)
    return coords, logp, accept


def init_state(key, coords: Array, log_prob_fn) -> EnsembleState:
    logp = log_prob_fn(coords)
    return EnsembleState(coords=jnp.asarray(coords), log_prob=logp, key=key,
                         n_accepted=jnp.zeros(coords.shape[0], jnp.int32),
                         iteration=jnp.asarray(0, jnp.int32))


def step(state: EnsembleState, log_prob_fn: Callable[[Array], Array],
         a: float = 2.0) -> EnsembleState:
    """One full ensemble update (both halves). ``log_prob_fn`` maps
    (n, ndim) -> (n,) and is typically a vmapped hyper-likelihood."""
    n = state.coords.shape[0]
    half = n // 2
    key, k1, k2 = jax.random.split(state.key, 3)

    first, second = state.coords[:half], state.coords[half:]
    lp1, lp2 = state.log_prob[:half], state.log_prob[half:]

    first, lp1, acc1 = _stretch_half(k1, first, second, lp1, log_prob_fn, a)
    second, lp2, acc2 = _stretch_half(k2, second, first, lp2, log_prob_fn, a)

    return pytree.replace(
        state,
        coords=jnp.concatenate([first, second]),
        log_prob=jnp.concatenate([lp1, lp2]),
        key=key,
        n_accepted=state.n_accepted + jnp.concatenate([acc1, acc2]).astype(jnp.int32),
        iteration=state.iteration + 1,
    )


def run(state: EnsembleState, log_prob_fn, n_steps: int, a: float = 2.0,
        thin: int = 1, jit: bool = True) -> tuple[EnsembleState, dict]:
    """Advance ``n_steps`` iterations under one ``lax.scan`` (one compiled
    program for the whole chain segment).  Returns the final state and the
    thinned chain history {'coords': (n_kept, n_walkers, ndim),
    'log_prob': (n_kept, n_walkers)}.

    ``jit=True`` compiles the whole segment as one program — without it,
    every scan dispatch is a host round-trip (measured 2.9x slower on a
    remote TPU backend).  Re-tracing happens per call; XLA's compile cache
    absorbs repeated segments."""
    if n_steps % thin:
        raise ValueError("n_steps must be a multiple of thin")
    if jit:
        return _jitted_runner(log_prob_fn, n_steps, a, thin)(state)
    return _scan_runner(log_prob_fn, n_steps, a, thin)(state)


def _scan_runner(log_prob_fn, n_steps: int, a: float, thin: int):
    def _run(state):
        def one(carry, _):
            def inner(c, _):
                return step(c, log_prob_fn, a), None
            carry, _ = jax.lax.scan(inner, carry, None, length=thin)
            return carry, {"coords": carry.coords, "log_prob": carry.log_prob}

        return jax.lax.scan(one, state, None, length=n_steps // thin)

    return _run


@functools.lru_cache(maxsize=64)
def _jitted_runner(log_prob_fn, n_steps: int, a: float, thin: int):
    # Cached by (log_prob_fn identity, segment config) so repeated segments
    # of the same chain reuse one compiled program — a fresh jax.jit wrapper
    # per call would re-trace and (on remote backends) re-compile each time.
    return jax.jit(_scan_runner(log_prob_fn, n_steps, a, thin))


@functools.partial(jax.jit, static_argnames=("param_names",))
def _vector_log_prob(hl, param_names, lo, hi, vecs):
    from chimera_tpu.likelihood import log_hyperlikelihood_batch

    lo_safe = jnp.where(jnp.isfinite(lo), lo, -1e30)
    hi_safe = jnp.where(jnp.isfinite(hi), hi, 1e30)
    safe = jnp.clip(vecs, lo_safe, hi_safe)
    lam = {p: safe[:, i] for i, p in enumerate(param_names)}
    logp = log_hyperlikelihood_batch(hl, lam)
    in_bounds = jnp.all((vecs >= lo) & (vecs <= hi), axis=-1)
    logp = jnp.where(in_bounds, logp, -jnp.inf)
    return jnp.where(jnp.isnan(logp), -jnp.inf, logp), safe, in_bounds


def make_vector_log_prob(hl, param_names: list[str],
                         bounds: dict[str, tuple[float, float]] | None = None,
                         extra_log_prior=None):
    """Adapt the hyper-likelihood to a (n, ndim) -> (n,) vector function.

    Columns of the walker matrix map onto ``param_names``; flat priors are
    enforced through ``bounds``.  Batches evaluate through
    ``log_hyperlikelihood_batch`` so walker proposals ride the fused Pallas
    kernel on TPU.  Out-of-bounds proposals are clamped into bounds for the
    (dense-batch) evaluation and masked to -inf afterwards — same results
    as the per-walker gate, without breaking the batch.

    The returned function is jitted in ARGUMENT form (the HyperLikelihood
    pytree is an operand, not a closure constant): direct calls compile
    once and reuse the program across hl instances of the same shape, and
    the PE/injection arrays never bloat the compile payload on tunneled
    backends (see bench.py's note).  Inside the sampler's own jitted step
    the nested jit is simply inlined."""
    lo = jnp.array([bounds[p][0] if bounds and p in bounds else -jnp.inf
                    for p in param_names])
    hi = jnp.array([bounds[p][1] if bounds and p in bounds else jnp.inf
                    for p in param_names])
    names = tuple(param_names)

    def batch(vecs):
        # The likelihood core is jitted with ONLY hashable statics; the user
        # prior is applied outside it, so any callable works (unhashable
        # included) and a lambda re-created per call cannot grow the jit
        # cache.  Under a sampler's outer jit this whole function is traced
        # and the nested jit inlined — the split costs nothing.
        logp, safe, in_bounds = _vector_log_prob(hl, names, lo, hi, vecs)
        if extra_log_prior is not None:
            extra = jax.vmap(
                lambda v: extra_log_prior(
                    {p: v[i] for i, p in enumerate(names)}))(safe)
            logp = jnp.where(in_bounds, logp + extra, -jnp.inf)
            logp = jnp.where(jnp.isnan(logp), -jnp.inf, logp)
        return logp

    return batch


def initialize_walkers(key, center: dict, n_walkers: int,
                       param_names: list[str],
                       scale: dict | None = None,
                       bounds: dict | None = None,
                       distribution: str = "gaussian") -> Array:
    """Initial walker positions (reference emcee_utils.py:68-129).

    distribution:
      'gaussian'   — Gaussian ball around ``center``, clipped into bounds;
      'truncgauss' — Gaussian ball; out-of-bounds coordinates redrawn
                     uniformly within the bounds (the reference's scheme);
      'uniform'    — uniform within bounds (requires finite bounds).
    Chain restart is separate: ``inference.load_state`` on the latest chain
    file (emcee_utils.py:130-152).
    """
    ndim = len(param_names)
    mu = jnp.array([center[p] for p in param_names])
    sig = jnp.array([(scale or {}).get(p, 0.05 * abs(center[p]) + 1e-3)
                     for p in param_names])
    lo = jnp.array([(bounds or {}).get(p, (-jnp.inf, jnp.inf))[0]
                    for p in param_names])
    hi = jnp.array([(bounds or {}).get(p, (-jnp.inf, jnp.inf))[1]
                    for p in param_names])
    span = jnp.where(jnp.isfinite(hi - lo), hi - lo, 1.0)
    k_norm, k_unif = jax.random.split(key)

    if distribution == "uniform":
        if bounds is None or not bool(jnp.all(jnp.isfinite(hi - lo))):
            raise ValueError("'uniform' initialization requires finite bounds")
        return lo + span * jax.random.uniform(k_unif, (n_walkers, ndim))

    x = mu + sig * jax.random.normal(k_norm, (n_walkers, ndim))
    if distribution == "truncgauss":
        redraw = lo + span * jax.random.uniform(k_unif, (n_walkers, ndim))
        return jnp.where((x < lo) | (x > hi), redraw, x)
    if distribution != "gaussian":
        raise ValueError(
            "distribution must be 'gaussian', 'truncgauss', or 'uniform'")
    if bounds:
        x = jnp.clip(x, lo + 1e-6 * span, hi - 1e-6 * span)
    return x
