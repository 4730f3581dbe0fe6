"""ChEES-HMC: dynamic trajectory lengths without per-chain control flow.

NUTS converts cheap gradients into effective samples by adapting how far
each trajectory travels, but its per-chain tree recursion is hostile to the
TPU execution model used here — the chain axis IS the fused Pallas kernel's
lambda axis (hmc.py), so every chain must take the same number of leapfrog
steps per iteration or the batched kernel call degenerates to ragged
per-chain evaluations.  ChEES-HMC (Hoffman, Radul & Sountsov, AISTATS 2021)
is the SIMD-native answer: ONE shared trajectory length, jittered by a
low-discrepancy sequence and adapted by stochastic gradient ascent on the
Change-in-the-Estimator-of-the-Expected-Square criterion

    ChEES = 1/4 E[ (||y' - E y'||^2 - ||y - E y||^2)^2 ],

whose per-iteration gradient w.r.t. trajectory time is available from the
quantities the leapfrog already computed (end positions and momenta).  All
chains still advance in lock-step batched fused-kernel calls; only the
*number* of calls per iteration varies (a dynamic `fori_loop` bound, which
XLA lowers to a while loop — no recompilation).

Replaces nothing in the reference (its only sampler is emcee,
utils/emcee_utils.py); this exists to exploit the differentiability edge of
the rebuild (SURVEY.md 7.2-11).
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array

from chimera_tpu.inference.hmc import (
    HMCState,
    _batch_value_and_grad,
    _da_update,
    AdaptState,
    make_transformed_log_prob_batch,
)


def _halton(n: int, base: int = 2) -> np.ndarray:
    """First n points of the van der Corput / Halton sequence in (0, 1) —
    the low-discrepancy trajectory jitter of the ChEES paper (§4)."""
    out = np.zeros(n)
    for i in range(n):
        f, r, x = 1.0, 0.0, i + 1
        while x > 0:
            f /= base
            r += f * (x % base)
            x //= base
        out[i] = r
    return out


class ChEESAdapt(NamedTuple):
    da: AdaptState      # dual-averaging step size (+ Welford mass, reused)
    log_t: Array        # log trajectory TIME (not step count)
    adam_m: Array       # Adam first moment on d/d(log_t)
    adam_v: Array       # Adam second moment
    adam_i: Array       # Adam iteration counter


def _trajectory(state: HMCState, key, eps, inv_mass, t_jit, max_steps,
                vgrad):
    """One shared-length trajectory for all chains.

    Returns the proposal (y1, p1, logp1, grad1), the sampled momenta p0 and
    the step count actually taken."""
    c, d = state.y.shape
    sqrt_mass = 1.0 / jnp.sqrt(inv_mass)
    p0 = jax.random.normal(key, (c, d)) * sqrt_mass
    n_steps = jnp.clip(jnp.ceil(t_jit / eps).astype(jnp.int32), 1, max_steps)

    def body(_, carry):
        y, p, grad, _ = carry
        p = p + 0.5 * eps * grad
        y = y + eps * inv_mass[None, :] * p
        logp_new, grad_new = vgrad(y)
        p = p + 0.5 * eps * grad_new
        return (y, p, grad_new, logp_new)

    y1, p1, grad1, logp1 = jax.lax.fori_loop(
        0, n_steps, body, (state.y, p0, state.grad, state.logp))
    return y1, p1, grad1, logp1, p0, n_steps


def _chees_grad(state, y1, p1, inv_mass, accept_prob, u):
    """Per-iteration stochastic gradient of ChEES w.r.t. log trajectory
    time (paper eq. 14, chain-rule factor u for the halton jitter and t for
    the log parameterization folded in by the caller)."""
    yc0 = state.y - jnp.mean(state.y, axis=0, keepdims=True)
    yc1 = y1 - jnp.mean(y1, axis=0, keepdims=True)
    delta = jnp.sum(yc1 * yc1, axis=-1) - jnp.sum(yc0 * yc0, axis=-1)  # (C,)
    v1 = p1 * inv_mass[None, :]          # dy/dt at the endpoint
    dot = jnp.sum(yc1 * v1, axis=-1)     # (C,)
    w = accept_prob / jnp.maximum(jnp.sum(accept_prob), 1e-12)
    return jnp.sum(w * delta * dot) * u


def run_chees(key, log_density: Callable, y0: Array,
              n_warmup: int = 500, n_samples: int = 500,
              target_accept: float = 0.651,
              init_step_size: float = 0.1, init_traj: float | None = None,
              max_steps: int = 128, thin: int = 1, batched: bool = False,
              adam_lr: float = 0.025):
    """Adaptive ChEES-HMC over (C, D) initial positions.

    Same contract as :func:`chimera_tpu.inference.hmc.run_hmc` (returns
    (samples, stats)), but the trajectory length is LEARNED during warmup
    instead of fixed: step size adapts by dual averaging toward
    ``target_accept`` (0.651 is the ChEES-optimal rate, paper §4.2), the
    trajectory time adapts by Adam ascent on the ChEES criterion, and the
    diagonal mass matrix by Welford — then all three freeze for sampling,
    with the halton jitter kept (it suppresses the resonances a single
    fixed length suffers on near-Gaussian targets).
    """
    y0 = jnp.atleast_2d(y0)
    c, d = y0.shape
    log_density = log_density if batched else jax.vmap(log_density)
    vgrad = _batch_value_and_grad(log_density)
    logp0, grad0 = vgrad(y0)
    state = HMCState(y0, logp0, grad0)

    mu = jnp.log(10.0 * init_step_size)
    da0 = AdaptState(jnp.log(init_step_size), jnp.log(init_step_size),
                     jnp.array(0.0), jnp.zeros(d), jnp.zeros(d),
                     jnp.array(0.0))
    t0 = init_traj if init_traj is not None else 16.0 * init_step_size
    adapt = ChEESAdapt(da0, jnp.log(t0), jnp.array(0.0), jnp.array(0.0),
                       jnp.array(0.0))
    inv_mass0 = jnp.ones(d)
    halton_w = jnp.asarray(_halton(n_warmup))
    halton_s = jnp.asarray(_halton(n_samples))

    def step_once(state, key_i, eps, inv_mass, t_total, u):
        k_mom, k_acc = jax.random.split(key_i)
        y1, p1, grad1, logp1, p0, n_steps = _trajectory(
            state, k_mom, eps, inv_mass, u * t_total, max_steps, vgrad)
        ke0 = 0.5 * jnp.sum(inv_mass * p0 * p0, axis=-1)
        ke1 = 0.5 * jnp.sum(inv_mass * p1 * p1, axis=-1)
        log_acc = (logp1 - ke1) - (state.logp - ke0)
        log_acc = jnp.where(jnp.isnan(log_acc), -jnp.inf, log_acc)
        accept_prob = jnp.minimum(1.0, jnp.exp(log_acc))
        acc = jax.random.uniform(k_acc, (c,)) < accept_prob
        new = HMCState(jnp.where(acc[:, None], y1, state.y),
                       jnp.where(acc, logp1, state.logp),
                       jnp.where(acc[:, None], grad1, state.grad))
        return new, (y1, p1, accept_prob, n_steps)

    def warm_body(carry, xs):
        state, adapt, step_i = carry
        key_i, u = xs
        eps = jnp.exp(adapt.da.log_eps)
        t_total = jnp.exp(adapt.log_t)
        new_state, (y1, p1, accept_prob, n_steps) = step_once(
            state, key_i, eps, inv_mass0, t_total, u)

        # --- trajectory-time Adam ascent on the ChEES gradient ---
        g = _chees_grad(state, y1, p1, inv_mass0, accept_prob, u) * t_total
        i1 = adapt.adam_i + 1.0
        m = 0.9 * adapt.adam_m + 0.1 * g
        v = 0.999 * adapt.adam_v + 0.001 * g * g
        m_hat = m / (1.0 - 0.9 ** i1)
        v_hat = v / (1.0 - 0.999 ** i1)
        log_t = adapt.log_t + adam_lr * m_hat / (jnp.sqrt(v_hat) + 1e-8)
        # keep trajectories sane: at least one step, at most max_steps
        log_t = jnp.clip(log_t, jnp.log(eps), jnp.log(max_steps * eps))

        da = _da_update(adapt.da, jnp.mean(accept_prob), step_i,
                        target_accept, mu)
        cnt = da.count + c
        delta = new_state.y - da.mean[None, :]
        mean = da.mean + jnp.sum(delta, axis=0) / cnt
        m2 = da.m2 + jnp.sum(delta * (new_state.y - mean[None, :]), axis=0)
        da = da._replace(mean=mean, m2=m2, count=cnt)
        adapt = ChEESAdapt(da, log_t, m, v, i1)
        return (new_state, adapt, step_i + 1.0), (jnp.mean(accept_prob),
                                                  n_steps)

    keys = jax.random.split(key, n_warmup + 2)
    (state, adapt, _), (warm_acc, warm_steps) = jax.lax.scan(
        warm_body, (state, adapt, jnp.array(0.0)),
        (keys[:n_warmup], halton_w))

    eps = jnp.exp(adapt.da.log_eps_bar)
    var = adapt.da.m2 / jnp.maximum(adapt.da.count - 1.0, 1.0)
    inv_mass = jnp.where(var > 0, var, 1.0)
    t_total = jnp.exp(adapt.log_t)

    def sample_body(state, xs):
        key_i, u = xs
        new_state, (_, _, accept_prob, n_steps) = step_once(
            state, key_i, eps, inv_mass, t_total, u)
        return new_state, (new_state.y, new_state.logp, accept_prob, n_steps)

    sample_keys = jax.random.split(keys[-1], n_samples)
    state, (ys, logps, accs, steps) = jax.lax.scan(
        sample_body, state, (sample_keys, halton_s))
    sel = slice(thin - 1, None, thin)
    stats = {
        "step_size": eps,
        "trajectory_time": t_total,
        "mean_leapfrog_steps": jnp.mean(steps.astype(jnp.float32)),
        "steps_total": jnp.sum(steps),
        "inv_mass": inv_mass,
        "warmup_accept": warm_acc,
        "warmup_steps": warm_steps,
        "accept": accs,
        "log_prob": logps[sel],
        "final_state": state,
    }
    return ys[sel], stats


def sample_hyperposterior_chees(key, hl, param_names: list[str],
                                bounds: dict[str, tuple[float, float]],
                                init: dict[str, float],
                                n_chains: int = 16, n_warmup: int = 300,
                                n_samples: int = 500,
                                init_scale: float = 0.05,
                                extra_log_prior=None, **kwargs):
    """End-to-end ChEES-HMC posterior over hyper-parameters (the dynamic-
    trajectory counterpart of hmc.sample_hyperposterior — same batched
    fused-kernel evaluation, learned trajectory lengths)."""
    log_density_batch, tr = make_transformed_log_prob_batch(
        hl, param_names, bounds, extra_log_prior)
    x0 = jnp.array([init[p] for p in param_names])
    y_center = tr.unconstrain(x0)
    k_init, k_run = jax.random.split(key)
    y0 = y_center[None, :] + init_scale * jax.random.normal(
        k_init, (n_chains, len(param_names)))
    ys, stats = run_chees(k_run, log_density_batch, y0, n_warmup=n_warmup,
                          n_samples=n_samples, batched=True, **kwargs)
    xs = jax.vmap(jax.vmap(tr.constrain))(ys)
    samples = {p: xs[:, :, i] for i, p in enumerate(param_names)}
    return samples, stats
