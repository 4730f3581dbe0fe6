"""Gradient-based MCMC: Hamiltonian Monte Carlo with window adaptation.

The hyper-likelihood is differentiable end-to-end (pure XLA: Chebyshev
cosmology tables, masked KDE, importance-sampled selection) — a capability
the reference's architecture enables but never exploits (its only sampler is
emcee, SURVEY.md 3.1/7.2-11).  This module provides:

- a logit/affine reparameterization of bounded hyper-parameters so HMC runs
  in unconstrained space with exact log-Jacobian corrections;
- leapfrog HMC with jittered trajectory length (Neal 2011), dual-averaging
  step-size adaptation to a target acceptance (Hoffman & Gelman 2014), and
  diagonal mass-matrix (Welford) adaptation during warmup;
- chains evaluated in ONE batched call per leapfrog step
  (:func:`make_transformed_log_prob_batch`): the chain axis is the fused
  Pallas kernel's lambda axis, and per-chain gradients come from a single
  VJP of the summed density — gradient steps run at kernel speed through
  the kernel's custom VJP instead of per-chain unfused evaluations.  On a
  mesh, chains shard over the 'params' axis exactly like ensemble walkers.

Everything is one ``lax.scan`` per phase: a full run is three XLA programs
(warmup, mass-refresh warmup, sampling), regardless of chain count.
"""

from __future__ import annotations

import functools
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
from jax import Array


# ---------------------------------------------------------------------------
# Bounded <-> unconstrained reparameterization
# ---------------------------------------------------------------------------

class Transform(NamedTuple):
    lo: Array          # (D,) lower bounds (-inf for unbounded)
    hi: Array          # (D,) upper bounds (+inf for unbounded)

    # NOTE on the where-sanitization below: every branch is evaluated for
    # every dimension, so branch *inputs* must be finite even where the
    # branch is unselected — otherwise inf*0 NaNs leak through autodiff.

    def _safe(self) -> tuple[Array, Array, Array]:
        lo = jnp.where(jnp.isfinite(self.lo), self.lo, 0.0)
        hi = jnp.where(jnp.isfinite(self.hi), self.hi, 1.0)
        span = jnp.where(jnp.isfinite(self.hi - self.lo), hi - lo, 1.0)
        return lo, hi, span

    def constrain(self, y: Array) -> Array:
        """Unconstrained y -> bounded x (sigmoid for two-sided bounds)."""
        lo, hi, span = self._safe()
        two = lo + span * jax.nn.sigmoid(y)
        lo_only = lo + jnp.exp(y)
        hi_only = hi - jnp.exp(y)
        x = jnp.where(jnp.isfinite(self.lo) & jnp.isfinite(self.hi), two,
                      jnp.where(jnp.isfinite(self.lo), lo_only,
                                jnp.where(jnp.isfinite(self.hi), hi_only, y)))
        return x

    def unconstrain(self, x: Array) -> Array:
        lo, hi, span = self._safe()
        t = jnp.clip((x - lo) / span, 1e-12, 1 - 1e-12)
        two = jnp.log(t) - jnp.log1p(-t)
        lo_only = jnp.log(jnp.maximum(x - lo, 1e-300))
        hi_only = jnp.log(jnp.maximum(hi - x, 1e-300))
        return jnp.where(jnp.isfinite(self.lo) & jnp.isfinite(self.hi), two,
                         jnp.where(jnp.isfinite(self.lo), lo_only,
                                   jnp.where(jnp.isfinite(self.hi), hi_only,
                                             x)))

    def log_jacobian(self, y: Array) -> Array:
        """log |dx/dy| summed over dimensions."""
        _, _, span = self._safe()
        s = jax.nn.log_sigmoid(y) + jax.nn.log_sigmoid(-y) + jnp.log(span)
        one_sided = y  # d(exp(y))/dy = exp(y)
        lj = jnp.where(jnp.isfinite(self.lo) & jnp.isfinite(self.hi), s,
                       jnp.where(jnp.isfinite(self.lo) | jnp.isfinite(self.hi),
                                 one_sided, 0.0))
        return jnp.sum(lj)


def make_transformed_log_prob(hl, param_names: list[str],
                              bounds: dict[str, tuple[float, float]],
                              extra_log_prior=None):
    """(log_density(y), transform): unconstrained target for HMC.

    ``log_density`` maps a (D,) unconstrained vector to the hyper-likelihood
    at the constrained point plus the transform's log-Jacobian (flat priors
    inside the bounds, as in the reference's emcee setup)."""
    from chimera_tpu.likelihood import log_hyperlikelihood

    lo = jnp.array([bounds.get(p, (-jnp.inf, jnp.inf))[0] for p in param_names])
    hi = jnp.array([bounds.get(p, (-jnp.inf, jnp.inf))[1] for p in param_names])
    tr = Transform(lo, hi)

    def log_density(y: Array) -> Array:
        x = tr.constrain(y)
        lam = {p: x[i] for i, p in enumerate(param_names)}
        lp = log_hyperlikelihood(hl, lam)
        if extra_log_prior is not None:
            lp = lp + extra_log_prior(lam)
        lp = jnp.where(jnp.isnan(lp), -jnp.inf, lp)
        return lp + tr.log_jacobian(y)

    return log_density, tr


def make_transformed_log_prob_batch(hl, param_names: list[str],
                                    bounds: dict[str, tuple[float, float]],
                                    extra_log_prior=None):
    """Batched unconstrained target: (C, D) positions -> (C,) log densities.

    All chains evaluate in ONE ``log_hyperlikelihood_batch`` call, so
    eligible configurations route through the fused Pallas kernel (its
    lambda axis IS the chain axis) — gradient steps then pay the fused
    forward plus one stage-by-stage backward (the kernel's custom VJP)
    instead of per-chain unfused evaluations."""
    from chimera_tpu import pytree
    from chimera_tpu.likelihood import log_hyperlikelihood_batch

    # HMC differentiates hyper-parameters only, so the fused path may use
    # the adjoint Pallas kernel for its backward (PE-data cotangents are
    # not needed and come back as zeros under this engine).
    hl = pytree.replace(hl, grad_engine="pallas")

    lo = jnp.array([bounds.get(p, (-jnp.inf, jnp.inf))[0] for p in param_names])
    hi = jnp.array([bounds.get(p, (-jnp.inf, jnp.inf))[1] for p in param_names])
    tr = Transform(lo, hi)

    def log_density_batch(ys: Array) -> Array:
        xs = jax.vmap(tr.constrain)(ys)                    # (C, D)
        lam = {p: xs[:, i] for i, p in enumerate(param_names)}
        lp = log_hyperlikelihood_batch(hl, lam)
        if extra_log_prior is not None:
            lp = lp + jax.vmap(
                lambda x: extra_log_prior(
                    {p: x[i] for i, p in enumerate(param_names)}))(xs)
        lp = jnp.where(jnp.isnan(lp), -jnp.inf, lp)
        return lp + jax.vmap(tr.log_jacobian)(ys)

    return log_density_batch, tr


# ---------------------------------------------------------------------------
# HMC core
# ---------------------------------------------------------------------------

class HMCState(NamedTuple):
    y: Array           # (C, D) unconstrained positions
    logp: Array        # (C,)
    grad: Array        # (C, D)


class AdaptState(NamedTuple):
    log_eps: Array     # dual-averaging iterates
    log_eps_bar: Array
    h_bar: Array
    mean: Array        # Welford running mean (C-averaged)  (D,)
    m2: Array          # Welford running M2 (D,)
    count: Array


def _batch_value_and_grad(log_density_batch):
    """(C, D) -> ((C,) values, (C, D) per-chain grads) in ONE batched
    evaluation: chains are independent, so the VJP of the summed density
    gives exactly the per-chain gradients — no per-chain vmap of grad, and
    the fused kernel's lambda axis stays the chain axis."""
    def vgrad(ys):
        logp, vjp = jax.vjp(log_density_batch, ys)
        (grads,) = vjp(jnp.ones_like(logp))
        return logp, grads

    return vgrad


def _hmc_step(key, state: HMCState, eps, inv_mass, n_steps,
              log_density_batch, max_steps: int):
    """One jittered-length HMC update for all chains (batched leapfrog)."""
    vgrad = _batch_value_and_grad(log_density_batch)
    k_mom, k_len, k_acc = jax.random.split(key, 3)
    c, d = state.y.shape
    sqrt_mass = 1.0 / jnp.sqrt(inv_mass)
    p0 = jax.random.normal(k_mom, (c, d)) * sqrt_mass
    # jitter trajectory length uniformly in [1, n_steps] (shared across
    # chains so all chains advance in lock-step batched evaluations)
    L = jax.random.randint(k_len, (), 1, n_steps + 1)

    def body(i, carry):
        y, p, grad, _ = carry
        p = p + 0.5 * eps * grad
        y = y + eps * inv_mass[None, :] * p
        logp_new, grad_new = vgrad(y)
        p = p + 0.5 * eps * grad_new
        return (y, p, grad_new, logp_new)

    y1, p1, grad1, logp1 = jax.lax.fori_loop(
        0, L, body, (state.y, p0, state.grad, state.logp))
    ke0 = 0.5 * jnp.sum(inv_mass * p0 * p0, axis=-1)
    ke1 = 0.5 * jnp.sum(inv_mass * p1 * p1, axis=-1)
    log_accept = (logp1 - ke1) - (state.logp - ke0)
    log_accept = jnp.where(jnp.isnan(log_accept), -jnp.inf, log_accept)
    accept_prob = jnp.minimum(1.0, jnp.exp(log_accept))
    u = jax.random.uniform(k_acc, (c,))
    acc = u < accept_prob

    # the per-branch (y, logp, grad) triples are each self-consistent, so a
    # select keeps the carry exact with no recomputation
    y = jnp.where(acc[:, None], y1, state.y)
    logp = jnp.where(acc, logp1, state.logp)
    grads = jnp.where(acc[:, None], grad1, state.grad)
    return HMCState(y, logp, grads), accept_prob


def _da_update(adapt: AdaptState, accept_mean, step, target, mu,
               gamma=0.05, t0=10.0, kappa=0.75):
    """Dual averaging (Hoffman & Gelman 2014, algorithm 5)."""
    t = step + 1.0
    eta_h = 1.0 / (t + t0)
    h_bar = (1.0 - eta_h) * adapt.h_bar + eta_h * (target - accept_mean)
    log_eps = mu - jnp.sqrt(t) / gamma * h_bar
    eta = t ** (-kappa)
    log_eps_bar = eta * log_eps + (1.0 - eta) * adapt.log_eps_bar
    return adapt._replace(log_eps=log_eps, log_eps_bar=log_eps_bar,
                          h_bar=h_bar)


def run_hmc(key, log_density: Callable, y0: Array,
            n_warmup: int = 500, n_samples: int = 500,
            n_leapfrog: int = 16, target_accept: float = 0.8,
            init_step_size: float = 0.1, thin: int = 1,
            batched: bool = False):
    """Adaptive HMC over (C, D) initial positions (unconstrained space).

    Returns (samples (n_samples//thin, C, D), stats dict).  Warmup adapts
    step size (dual averaging) and a diagonal mass matrix (Welford over all
    chains); both freeze for sampling.

    ``batched=True`` declares that ``log_density`` maps (C, D) -> (C,)
    directly (e.g. from :func:`make_transformed_log_prob_batch`) — the
    fused-kernel fast path; otherwise it is vmapped per chain.
    """
    y0 = jnp.atleast_2d(y0)
    c, d = y0.shape
    log_density = log_density if batched else jax.vmap(log_density)
    vgrad = _batch_value_and_grad(log_density)
    logp0, grad0 = vgrad(y0)
    state = HMCState(y0, logp0, grad0)
    mu = jnp.log(10.0 * init_step_size)
    adapt = AdaptState(jnp.log(init_step_size), jnp.log(init_step_size),
                       jnp.array(0.0), jnp.zeros(d), jnp.zeros(d),
                       jnp.array(0.0))
    inv_mass0 = jnp.ones(d)

    def warm_body(carry, key_i):
        state, adapt, step_i = carry
        eps = jnp.exp(adapt.log_eps)
        new_state, acc = _hmc_step(key_i, state, eps, inv_mass0,
                                   n_leapfrog, log_density, n_leapfrog)
        adapt = _da_update(adapt, jnp.mean(acc), step_i, target_accept, mu)
        # Welford over chain-averaged positions (all chains pooled)
        cnt = adapt.count + c
        delta = new_state.y - adapt.mean[None, :]
        mean = adapt.mean + jnp.sum(delta, axis=0) / cnt
        m2 = adapt.m2 + jnp.sum(delta * (new_state.y - mean[None, :]), axis=0)
        adapt = adapt._replace(mean=mean, m2=m2, count=cnt)
        return (new_state, adapt, step_i + 1.0), jnp.mean(acc)

    keys = jax.random.split(key, n_warmup + 2)
    (state, adapt, _), warm_acc = jax.lax.scan(
        warm_body, (state, adapt, jnp.array(0.0)), keys[:n_warmup])

    # freeze adapted quantities
    eps = jnp.exp(adapt.log_eps_bar)
    var = adapt.m2 / jnp.maximum(adapt.count - 1.0, 1.0)
    inv_mass = jnp.where(var > 0, var, 1.0)  # inv mass = posterior variance

    def sample_body(state, key_i):
        new_state, acc = _hmc_step(key_i, state, eps, inv_mass,
                                   n_leapfrog, log_density, n_leapfrog)
        return new_state, (new_state.y, new_state.logp, acc)

    sample_keys = jax.random.split(keys[-1], n_samples)
    state, (ys, logps, accs) = jax.lax.scan(sample_body, state, sample_keys)
    sel = slice(thin - 1, None, thin)
    stats = {
        "step_size": eps,
        "inv_mass": inv_mass,
        "warmup_accept": warm_acc,
        "accept": accs,
        "log_prob": logps[sel],
        "final_state": state,
    }
    return ys[sel], stats


def continue_hmc(key, log_density: Callable, state: HMCState,
                 step_size, inv_mass, n_samples: int = 500,
                 n_leapfrog: int = 16, thin: int = 1,
                 batched: bool = False):
    """Continue sampling from a saved post-warmup state (no re-adaptation).

    Use with :func:`chimera_tpu.inference.checkpoint.save_hmc` /
    ``load_hmc`` — the TPU-native analog of the reference's emcee chain
    restart (emcee_utils.py:130-152) for the gradient-based sampler."""
    log_density = log_density if batched else jax.vmap(log_density)
    eps = jnp.asarray(step_size)
    inv_mass = jnp.asarray(inv_mass)

    def sample_body(state, key_i):
        new_state, acc = _hmc_step(key_i, state, eps, inv_mass,
                                   n_leapfrog, log_density, n_leapfrog)
        return new_state, (new_state.y, new_state.logp, acc)

    keys = jax.random.split(key, n_samples)
    state, (ys, logps, accs) = jax.lax.scan(sample_body, state, keys)
    sel = slice(thin - 1, None, thin)
    stats = {"step_size": eps, "inv_mass": inv_mass, "accept": accs,
             "log_prob": logps[sel], "final_state": state}
    return ys[sel], stats


def sample_hyperposterior(key, hl, param_names: list[str],
                          bounds: dict[str, tuple[float, float]],
                          init: dict[str, float],
                          n_chains: int = 16, n_warmup: int = 500,
                          n_samples: int = 500, init_scale: float = 0.05,
                          extra_log_prior=None, **hmc_kwargs):
    """End-to-end: HMC posterior samples of the hyper-parameters.

    Returns (samples dict {name: (n_samples, n_chains)}, stats).

    Chains are cheap on TPU (the chain axis is the fused kernel's lambda
    axis) and the per-batch population-table rebuild is a FIXED ~30 ms
    launch-latency cost — use >=16-32 chains so it amortizes
    (docs/performance.md, "Fixed per-batch cost")."""
    log_density_batch, tr = make_transformed_log_prob_batch(
        hl, param_names, bounds, extra_log_prior)
    x0 = jnp.array([init[p] for p in param_names])
    y_center = tr.unconstrain(x0)
    k_init, k_run = jax.random.split(key)
    y0 = y_center[None, :] + init_scale * jax.random.normal(
        k_init, (n_chains, len(param_names)))
    ys, stats = run_hmc(k_run, log_density_batch, y0, n_warmup=n_warmup,
                        n_samples=n_samples, batched=True, **hmc_kwargs)
    xs = jax.vmap(jax.vmap(tr.constrain))(ys)      # (S, C, D)
    samples = {p: xs[:, :, i] for i, p in enumerate(param_names)}
    return samples, stats
