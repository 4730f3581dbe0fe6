"""Fused Pallas TPU kernel: detector->source map + population weights + KDE.

The spectral-siren hot loop (SURVEY.md 3.1) is, per hyper-lambda and event:

    z_s   = z_from_dgw(cosmo, dL_s)                 (Chebyshev inversion)
    w_s   = p_m1m2(mass, m1det_s/(1+z_s), m2det_s/(1+z_s)) / pe_prior_s
    dens  = KDE_{z_s, w_s}(eff_grid)                (eff_grid from z stats)

Expressed stage-by-stage in XLA this materializes a dozen
(lambda x events x samples) intermediates in HBM — measured ~14 ms per
lambda at the 1000-event x 4096-sample flagship scale, entirely
bandwidth-bound.  This kernel streams the PE samples through VMEM once per
(event-block, lambda) program and performs *all* of it on-chip; HBM sees
only the PE data (reused across lambda) and the (lambda, events, grid)
densities.

Exact-parity design: the cosmology and mass-model pytrees are flattened
outside, their leaves passed as kernel operands, and the pytrees
*reassembled inside the kernel* with `tree_unflatten` — the weights math is
then literally `models.population.theta_src_and_weights`'s code path
(z_from_dgw + p_m1m2), not a reimplementation.  Requires the gather-free
engines (cosmo.interp_method='chebyshev', mass.cdf_engine='analytic'),
which are the defaults.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import Array
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.tree_util import tree_flatten, tree_unflatten

from chimera_tpu.models import cosmology as cosmo_fns
from chimera_tpu.models.mass import p_m1m2
from chimera_tpu.ops.kde import bw_factor

_BLOCK_E = 8       # events per program
_BLOCK_S = 512     # sample chunk for the KDE contraction
_SQRT_2PI = 2.5066282746310002


def _round_up(n: int, m: int) -> int:
    return -(-n // m) * m


def _pack_leaves(tree):
    """Flatten a pytree with (L, ...) leaves to [(L, 1, size) f32 arrays],
    returning (packed, treedef, shapes) for in-kernel reassembly."""
    leaves, treedef = tree_flatten(tree)
    packed, shapes = [], []
    for leaf in leaves:
        arr = jnp.asarray(leaf)
        shapes.append(arr.shape[1:])           # per-lambda shape
        packed.append(arr.reshape(arr.shape[0], 1, -1))
    return packed, treedef, shapes


def _unpack_leaves(refs, treedef, shapes):
    leaves = []
    for ref, shape in zip(refs, shapes):
        val = ref[0, 0, :]
        leaves.append(val.reshape(shape) if shape else val[0])
    return tree_unflatten(treedef, leaves)


def _fused_kernel(*refs, cos_def, cos_shapes, mass_def, mass_shapes,
                  n_cos, n_mass, kernel, bw_method, cut_grid, n_grid,
                  n_samples, block_s, den_scale, logical_s, has_ext_bounds,
                  stats_only, npix):
    (m1_ref, m2_ref, dl_ref, invprior_ref) = refs[:4]
    n_pe = 4
    zg_ref = None
    if cut_grid is None and not has_ext_bounds:
        # analysis-grid mode: grids are an input
        zg_ref = refs[n_pe]
        n_pe += 1
    ext_ref = None
    if has_ext_bounds:              # externally-supplied [lo, ub] per (l, e)
        ext_ref = refs[n_pe]
        n_pe += 1
    nreal_ref = dlfill_ref = None
    if logical_s is not None:       # compacted-pixel mode (see below)
        nreal_ref, dlfill_ref = refs[n_pe:n_pe + 2]
        n_pe += 2
    s1_ref = s2_ref = f1_ref = f2_ref = None
    if npix:                        # contract mode (see fused_weights_kde)
        s1_ref, s2_ref, f1_ref, f2_ref = refs[n_pe:n_pe + 4]
        n_pe += 4
    cos_refs = refs[n_pe:n_pe + n_cos]
    mass_refs = refs[n_pe + n_cos:n_pe + n_cos + n_mass]
    den_ref, stats_ref = refs[n_pe + n_cos + n_mass:n_pe + n_cos + n_mass + 2]
    z_scr, w_scr = refs[n_pe + n_cos + n_mass + 2:]

    cosmo = _unpack_leaves(cos_refs, cos_def, cos_shapes)
    mass = _unpack_leaves(mass_refs, mass_def, mass_shapes)

    # ---- phase A: source-frame map + weights (the population code path) --
    dl = dl_ref[...]                                   # (E, S)
    z = cosmo_fns.z_from_dgw(cosmo, dl)
    inv1pz = 1.0 / (1.0 + z)
    w = p_m1m2(mass, m1_ref[...] * inv1pz, m2_ref[...] * inv1pz) \
        * invprior_ref[...]
    z_scr[...] = z
    w_scr[...] = w

    # ---- per-event statistics (two-pass std like jnp.std) ---------------
    # In compacted-pixel mode ('marginalized' likelihood) each row holds one
    # pixel's samples padded to S_pp with filler slots at dL = dl_fill; the
    # *logical* row is the event's full S samples with out-of-pixel entries
    # masked to z_fill / weight 0 (reference likelihood.py:180-181).  The
    # weight sums need no correction (fillers carry zero weight); the z
    # moments are corrected analytically from the filler counts.
    sum_w = jnp.sum(w, axis=-1, keepdims=True)         # (E, 1)
    sum_w2 = jnp.sum(w * w, axis=-1, keepdims=True)
    if logical_s is None:
        s = float(n_samples)
        z_mean = jnp.mean(z, axis=-1, keepdims=True)
        z_var = jnp.mean((z - z_mean) ** 2, axis=-1, keepdims=True)
        z_min = jnp.min(z, axis=-1, keepdims=True)
        z_max = jnp.max(z, axis=-1, keepdims=True)
    else:
        s = float(logical_s)
        n = nreal_ref[...].astype(z.dtype)             # (E, 1) real samples
        f_pp = float(n_samples) - n                    # fillers present
        f_log = s - n                                  # fillers logical
        zf = cosmo_fns.z_from_dgw(cosmo, dlfill_ref[...])
        sum_z_real = jnp.sum(z, axis=-1, keepdims=True) - f_pp * zf
        z_mean = (sum_z_real + f_log * zf) / s
        ss_pp = jnp.sum((z - z_mean) ** 2, axis=-1, keepdims=True)
        z_var = (ss_pp + (f_log - f_pp) * (zf - z_mean) ** 2) / s
        z_min = jnp.minimum(jnp.min(z, axis=-1, keepdims=True), zf)
        z_max = jnp.maximum(jnp.max(z, axis=-1, keepdims=True), zf)
    z_sig = jnp.sqrt(z_var)

    neff = sum_w * sum_w / sum_w2                      # Kish N_eff
    h = bw_factor(neff, 1, bw_method) * z_sig          # bandwidth (E, 1)

    # ---- phase B: KDE contraction over sample chunks --------------------
    # (in contract mode the den output holds the 2 contracted sums, so the
    # grid width comes from the grids input instead)
    gp = zg_ref.shape[1] if npix else den_ref.shape[2]
    if has_ext_bounds:
        # effective-grid bounds supplied per (lambda, row) — the second pass
        # of the two-pass 'marginalized'+cut_grid scheme (per-pixel KDE on
        # the EVENT's effective grid)
        lo = ext_ref[0, :, 0:1]
        ub = ext_ref[0, :, 1:2]
        delta = (ub - lo) / (n_grid - 1)
        g_idx = jax.lax.broadcasted_iota(jnp.int32, (_BLOCK_E, gp), 1)
        g = lo + delta * g_idx.astype(z.dtype)
    elif cut_grid is None:
        # evaluate directly on the analysis grids (== XLA path with
        # cut_grid=None): no effective grid, no resampling outside
        lo = jnp.zeros_like(z_min)
        ub = jnp.zeros_like(z_min)
        g = zg_ref[...]                                # (E, Gp)
    else:
        lo = jnp.where(z_min - cut_grid * z_sig > 0.0,
                       z_min - cut_grid * z_sig, 1e-8)
        ub = z_max + cut_grid * z_sig
        delta = (ub - lo) / (n_grid - 1)
        g_idx = jax.lax.broadcasted_iota(jnp.int32, (_BLOCK_E, gp), 1)
        g = lo + delta * g_idx.astype(z.dtype)
    inv_h = 1.0 / h                                    # (E, 1)

    # NOTE: a chunk-pruned variant (skip (grid-tile x sample-chunk) pairs
    # outside the Epanechnikov support, exploiting the dL-sorted sample
    # axis) was measured SLOWER at the flagship scale (8.3 vs 6.5 ms/lambda)
    # — the scalar lax.cond per pair stalls Mosaic's pipelining and the
    # per-event grids are only ~3x wider than the sample support.  The dense
    # loop below is VPU-bound at ~speed of light for the contraction.
    def chunk(i, acc):
        zc = z_scr[:, pl.ds(i * block_s, block_s)]     # (E, Sc)
        wc = w_scr[:, pl.ds(i * block_s, block_s)]
        u = (g[:, :, None] - zc[:, None, :]) * inv_h[:, :, None]
        if kernel == "epan":
            k = 0.75 * jnp.maximum(0.0, 1.0 - u * u)
        else:
            k = jnp.exp(-0.5 * u * u) * (1.0 / _SQRT_2PI)
        return acc + jnp.sum(wc[:, None, :] * k, axis=-1)

    if stats_only:
        den_ref[0, :, :] = jnp.zeros_like(den_ref[0, :, :])
    else:
        den = jax.lax.fori_loop(0, n_samples // block_s, chunk,
                                jnp.zeros((_BLOCK_E, gp), z.dtype))
        if npix:
            # contract mode: the z-integral (trapz weights folded into
            # s1/s2), the pixelated-catalog mixture, and the pixel-partial
            # sums happen HERE — HBM never sees a (L, B, Nz) density.
            # Guarded unit-mass scale: dead rows (empty pixels) come out
            # exactly 0 with no downstream scrub needed.
            tiny = jnp.asarray(jnp.finfo(z.dtype).tiny, z.dtype)
            ok = sum_w > jnp.sqrt(tiny)
            den = jnp.where(ok, den * (inv_h / jnp.where(ok, sum_w, 1.0)),
                            0.0)
            if npix == 1:
                f1 = f1_ref[0]                         # (E, Gp)
                f2 = f2_ref[0]
            else:
                f1 = f1_ref[0, 0]                      # (1, Gp) — broadcast
                f2 = f2_ref[0, 0]
            r1 = jnp.sum(den * s1_ref[...] * f1, axis=-1, keepdims=True)
            r2 = jnp.sum(den * s2_ref[...] * f2, axis=-1, keepdims=True)
            pad = jnp.zeros((_BLOCK_E, 6), z.dtype)
            den_ref[0, :, :] = jnp.concatenate([r1, r2, pad], axis=-1)
        elif den_scale == "norms":
            den_ref[0, :, :] = den * (inv_h / s)
        else:
            den_ref[0, :, :] = den * (inv_h / sum_w)

    stats = jnp.concatenate(
        [lo, ub, sum_w / s, neff, h, sum_w, sum_w2, z_sig], axis=-1)
    stats_ref[0, :, :] = stats.astype(z.dtype)


class _FusedCfg(NamedTuple):
    """Static configuration of one fused call (hashable, nondiff)."""

    kernel: str
    bw_method: object
    cut_grid: float | None
    n_grid: int
    den_scale: str
    interpret: bool
    logical_s: int | None
    stats_only: bool = False
    # contract mode: >0 = rows-per-event of the (B = E*npix, S) row layout;
    # the kernel consumes per-row static factors s1/s2 and per-(lambda,
    # event) factors f1/f2 and returns the contracted pixel-partial sums
    # r1/r2 instead of densities (the dark-siren epilogue fused on-chip).
    npix: int = 0
    # 'xla': backward differentiates the reference implementation (correct
    # for EVERY input).  'pallas': adjoint Pallas kernel — fast hyper-lambda
    # gradients (cosmology/mass leaves); cotangents for the PE data / grids
    # are returned as ZEROS (documented contract: used by samplers that
    # differentiate hyper-parameters only).  Falls back to 'xla' for modes
    # the adjoint kernel does not cover.
    bwd: str = "xla"


@functools.partial(jax.jit, static_argnames=(
    "kernel", "bw_method", "cut_grid", "n_grid", "den_scale", "interpret",
    "logical_s", "stats_only", "bwd"))
def fused_weights_kde(
    m1det: Array, m2det: Array, dl: Array, inv_pe_prior: Array,
    cosmo_batch, mass_batch, grids: Array | None = None,
    n_real: Array | None = None, dl_fill: Array | None = None,
    logical_s: int | None = None, ext_bounds: Array | None = None,
    contract: tuple | None = None,
    kernel: str = "epan", bw_method=None, cut_grid: float | None = 2.0,
    n_grid: int = 250, den_scale: str = "norms", interpret: bool = False,
    stats_only: bool = False, bwd: str = "xla",
):
    """Fused hot loop for a hyper-lambda batch.

    Args:
      m1det, m2det, dl, inv_pe_prior: (E, S) detector-frame PE samples
        (lambda-independent; S must be a multiple of 512, E of 8 — pad
        upstream with zero inv_pe_prior).
      cosmo_batch / mass_batch: model pytrees whose array leaves carry a
        leading lambda axis (from ``jax.vmap(pop.update)``).
      grids: (E, n_grid) analysis grids, required iff cut_grid is None —
        densities are then evaluated directly on them (no effective grid,
        no resampling; compact-support kernels are exactly zero outside the
        sample range, so nothing is lost).
      n_real, dl_fill, logical_s: compacted-pixel mode (see
        data.pixelize.compact_samples_by_pixel): each row is one pixel's
        samples padded to S with fillers at dl_fill; stats are corrected to
        the logical row of ``logical_s`` samples with out-of-pixel entries
        at the z_fill / zero-weight sentinel values.
      den_scale: 'norms' folds the reference's ``norms = mean(w)`` factor
        into the density (likelihood.py:111,142); 'unit' returns the
        unit-mass KDE.
      contract: optional (s1, s2, f1, f2) — fuse the dark-siren epilogue
        into the kernel.  Rows are laid out (event-major) as B = E_ev * P;
        s1/s2 are (B, n_grid) lambda-independent factors (catalog p_cat /
        (1 - P_compl), localization pdf, trapz weights), f1/f2 are
        (L, E_ev, n_grid) per-lambda factors (rate / jacobian / p_bkg).
        Returns r = (L, B, 2) with r[..., 0] = sum_z den*s1*f1 and
        r[..., 1] = sum_z den*s2*f2 instead of densities — no (L, B, Nz)
        array ever reaches HBM.  Requires grids (analysis mode),
        den_scale='unit' (applied with a dead-row guard in-kernel), and
        P % 8 == 0 or P == 1.

    Returns:
      den:   (L, E, n_grid) densities on per-(lambda,event) effective grids
        (cut_grid mode) or on ``grids`` (analysis mode); in contract mode
        instead the (L, B, 2) partial sums r1/r2.
      stats: dict with lo, ub, norms, neff, bandwidth  — each (L, E)
    """
    e, s = dl.shape
    if s % 128 or e % _BLOCK_E:
        raise ValueError(
            f"shapes must tile: E ({e}) % {_BLOCK_E}, S ({s}) % 128")
    if ext_bounds is None and (cut_grid is None) != (grids is not None):
        raise ValueError("pass grids exactly when cut_grid is None")
    if logical_s is not None and (n_real is None or dl_fill is None):
        raise ValueError("logical_s requires n_real and dl_fill")
    if grids is not None and ext_bounds is None:
        n_grid = grids.shape[1]
    s1 = s2 = f1 = f2 = None
    npix = 0
    if contract is not None:
        s1, s2, f1, f2 = contract
        if grids is None or ext_bounds is not None or stats_only:
            raise ValueError("contract mode requires analysis grids")
        if den_scale != "unit":
            raise ValueError("contract mode implies den_scale='unit'")
        e_ev = f1.shape[1]
        npix = e // e_ev
        if npix * e_ev != e or not (npix == 1 or npix % _BLOCK_E == 0):
            raise ValueError(
                f"contract rows ({e}) must be E_ev ({e_ev}) x P with "
                f"P == 1 or P % {_BLOCK_E} == 0 (pad the pixel axis)")
    cfg = _FusedCfg(kernel=kernel, bw_method=bw_method, cut_grid=cut_grid,
                    n_grid=n_grid, den_scale=den_scale, interpret=interpret,
                    logical_s=logical_s, stats_only=stats_only, bwd=bwd,
                    npix=npix)
    return _fused_call(cfg, m1det, m2det, dl, inv_pe_prior,
                       cosmo_batch, mass_batch, grids, n_real, dl_fill,
                       ext_bounds, s1, s2, f1, f2)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _fused_call(cfg, m1det, m2det, dl, inv_pe_prior, cosmo_batch, mass_batch,
                grids, n_real, dl_fill, ext_bounds, s1, s2, f1, f2):
    return _pallas_impl(cfg, m1det, m2det, dl, inv_pe_prior, cosmo_batch,
                        mass_batch, grids, n_real, dl_fill, ext_bounds,
                        s1, s2, f1, f2)


def _fused_fwd(cfg, *args):
    return _pallas_impl(cfg, *args), args


def _fused_bwd(cfg, residuals, cotangents):
    """Backward pass.

    Default ('xla'): VJP through the pure-XLA reference implementation —
    the Pallas forward stays fused; the backward recomputes stage-by-stage
    in XLA (a checkpointed recompute — forward residuals are just the
    primal inputs, nothing fused is saved).  Gradients agree with the XLA
    path by construction since :func:`_reference_impl` is the kernel's
    semantics in plain jnp (engine-agreement tested).

    Opt-in ('pallas', analysis-grid eventwise mode only): an adjoint Pallas
    kernel computes the hyper-lambda gradients (cosmology/mass pytree
    leaves) fused on-chip; PE-data/grids cotangents come back as zeros
    (samplers differentiate hyper-parameters only)."""
    if cfg.bwd == "pallas" and _adjoint_supported(cfg):
        return _adjoint_impl(cfg, residuals, cotangents)
    _, vjp = jax.vjp(functools.partial(_reference_impl, cfg), *residuals)
    return vjp(cotangents)


def _adjoint_supported(cfg: _FusedCfg) -> bool:
    # v2 covers every forward mode (analysis grids, effective grids,
    # external bounds, compacted rows, stats-only passes) EXCEPT the
    # contract epilogue (npix > 0), which falls back to the XLA backward.
    return cfg.kernel in ("epan", "gauss") and cfg.npix == 0


_fused_call.defvjp(_fused_fwd, _fused_bwd)


def _reference_impl(cfg: _FusedCfg, m1det, m2det, dl, inv_pe_prior,
                    cosmo_batch, mass_batch, grids, n_real, dl_fill,
                    ext_bounds=None, s1=None, s2=None, f1=None, f2=None):
    """Pure-XLA implementation of the fused kernel's exact semantics.

    Used as (a) the differentiation path of :func:`fused_weights_kde` and
    (b) an engine-agreement oracle in the tests.  Mirrors `_fused_kernel`
    phase by phase."""
    e, s = dl.shape
    dt = dl.dtype

    def per_lambda(cosmo, mass, ext, f1_l, f2_l):
        z = cosmo_fns.z_from_dgw(cosmo, dl)                    # (E, S)
        inv1pz = 1.0 / (1.0 + z)
        w = p_m1m2(mass, m1det * inv1pz, m2det * inv1pz) * inv_pe_prior
        sum_w = jnp.sum(w, axis=-1)
        sum_w2 = jnp.sum(w * w, axis=-1)
        if cfg.logical_s is None:
            sl = float(s)
            z_mean = jnp.mean(z, axis=-1)
            z_var = jnp.mean((z - z_mean[:, None]) ** 2, axis=-1)
            z_min = jnp.min(z, axis=-1)
            z_max = jnp.max(z, axis=-1)
        else:
            sl = float(cfg.logical_s)
            n = n_real.astype(dt)
            f_pp = float(s) - n                                # fillers present
            f_log = sl - n                                     # fillers logical
            zf = cosmo_fns.z_from_dgw(cosmo, dl_fill)
            sum_z_real = jnp.sum(z, axis=-1) - f_pp * zf
            z_mean = (sum_z_real + f_log * zf) / sl
            ss_pp = jnp.sum((z - z_mean[:, None]) ** 2, axis=-1)
            z_var = (ss_pp + (f_log - f_pp) * (zf - z_mean) ** 2) / sl
            z_min = jnp.minimum(jnp.min(z, axis=-1), zf)
            z_max = jnp.maximum(jnp.max(z, axis=-1), zf)
        # Safe-math variants of the kernel's raw formulas: dead rows (empty
        # pixels / padded events, sum_w = 0 or z_var = 0) must produce
        # FINITE primals here, or the VJP poisons live gradients with
        # 0 * inf = NaN.  On live rows the clamps are exact no-ops; dead-row
        # forward values land on 0 where the kernel lands on NaN -> both are
        # scrubbed identically downstream (nan_to_num + masks).
        tiny = jnp.asarray(jnp.finfo(dt).tiny, dt)
        # variance floored at sqrt(tiny), NOT tiny: with h ~ sqrt(var) the
        # divide's transpose partial is (g-z)/h^2 ~ 1/var — flooring at
        # tiny leaves h^2 ~ tiny and the partial overflows to inf, which
        # NaNs gradients through zero cotangents (0 * inf).  sqrt(tiny)
        # keeps every partial finite in f32 and f64; real rows are
        # unaffected (physical z-variances are >> 1e-77).
        z_sig = jnp.sqrt(jnp.maximum(z_var, jnp.sqrt(tiny)))
        # Kish n_eff is mathematically in [1, S]; values outside come only
        # from underflowing weight sums, whose backward chains overflow to
        # inf and poison gradients through 0 * inf — clamp to the exact
        # range (dead rows land on 1, still below the default gate).
        neff = jnp.clip(sum_w * sum_w / jnp.where(sum_w2 > 0, sum_w2, 1.0),
                        1.0, sl)
        h = bw_factor(neff, 1, cfg.bw_method) * z_sig

        if ext is not None:
            lo = ext[:, 0]
            ub = ext[:, 1]
            delta = (ub - lo) / (cfg.n_grid - 1)
            idx = jnp.arange(cfg.n_grid, dtype=dt)
            g = lo[:, None] + delta[:, None] * idx[None, :]
        elif cfg.cut_grid is None:
            lo = jnp.zeros((e,), dt)
            ub = jnp.zeros((e,), dt)
            g = grids
        else:
            lo = jnp.where(z_min - cfg.cut_grid * z_sig > 0.0,
                           z_min - cfg.cut_grid * z_sig, 1e-8)
            ub = z_max + cfg.cut_grid * z_sig
            delta = (ub - lo) / (cfg.n_grid - 1)
            idx = jnp.arange(cfg.n_grid, dtype=dt)
            g = lo[:, None] + delta[:, None] * idx[None, :]

        if cfg.stats_only:
            den = jnp.zeros((e, cfg.n_grid), dt)
        else:
            u = (g[:, :, None] - z[:, None, :]) / h[:, None, None]
            if cfg.kernel == "epan":
                k = 0.75 * jnp.maximum(0.0, 1.0 - u * u)
            else:
                k = jnp.exp(-0.5 * u * u) * (1.0 / _SQRT_2PI)
            den = jnp.sum(w[:, None, :] * k, axis=-1)
            if cfg.den_scale == "norms":
                den = den / h[:, None] / sl
            else:
                # select (not clamp-to-tiny): 1/tiny times 1/h_floor
                # overflows backward partials to inf, which NaNs live
                # gradients through 0 * inf.  Rows below sqrt(tiny) total
                # weight are astronomically gated — their unit-mass KDE is
                # defined as 0 (the scrub value) with clean zero gradients.
                ok = sum_w > jnp.sqrt(tiny)
                den = jnp.where(ok[:, None],
                                den / h[:, None]
                                / jnp.where(ok, sum_w, 1.0)[:, None],
                                0.0)
            if cfg.npix:
                # contract epilogue (see fused_weights_kde): per-row z-sums
                # against the static (s1, s2) and per-lambda (f1, f2) factors
                f1r = jnp.repeat(f1_l, cfg.npix, axis=0)       # (B, G)
                f2r = jnp.repeat(f2_l, cfg.npix, axis=0)
                r1 = jnp.sum(den * s1 * f1r, axis=-1)
                r2 = jnp.sum(den * s2 * f2r, axis=-1)
                den = jnp.stack([r1, r2], axis=-1)             # (B, 2)
        return den, lo, ub, sum_w / sl, neff, h, sum_w, sum_w2

    den, lo, ub, norms, neff, h, sum_w, sum_w2 = jax.vmap(per_lambda)(
        cosmo_batch, mass_batch, ext_bounds, f1, f2)
    return den, {"lo": lo, "ub": ub, "norms": norms, "neff": neff,
                 "bandwidth": h, "sum_w": sum_w, "sum_w2": sum_w2}


# ---------------------------------------------------------------------------
# Chunk-row contract kernel (dark-siren flagship path)
# ---------------------------------------------------------------------------

class _RowsCfg(NamedTuple):
    kernel: str
    c_per_event: int     # chunk rows per event (R = E_ev * C, C % 8 == 0)
    interpret: bool


def _rows_kernel(*refs, cos_def, cos_shapes, mass_def, mass_shapes,
                 n_cos, n_mass, kernel, c_per_event, sub):
    """One program = EB rows (G whole events, EB = G * C).  A 128-sample
    chunk row carries ~1.6 us of VPU work — at 8 rows/program the fixed
    program overhead (launch + block DMAs) dominated ~6x (measured 20.4
    vs 3.1 ms/lambda roofline at the 1000-event flagship), so the kernel
    batches ~128 rows per program and sweeps them in 8-row sub-blocks."""
    (m1_ref, m2_ref, dl_ref, invp_ref, zg_ref, hs_ref,
     s1_ref, s2_ref, f1_ref, f2_ref) = refs[:10]
    cos_refs = refs[10:10 + n_cos]
    mass_refs = refs[10 + n_cos:10 + n_cos + n_mass]
    out_ref = refs[10 + n_cos + n_mass]

    cosmo = _unpack_leaves(cos_refs, cos_def, cos_shapes)
    mass = _unpack_leaves(mass_refs, mass_def, mass_shapes)

    # phase A for ALL rows of the program at once (the population code
    # path, as in _fused_kernel; row statistics precomputed via hs_ref)
    dl = dl_ref[...]                                   # (EB, chunk)
    z = cosmo_fns.z_from_dgw(cosmo, dl)
    inv1pz = 1.0 / (1.0 + z)
    w = p_m1m2(mass, m1_ref[...] * inv1pz, m2_ref[...] * inv1pz) \
        * invp_ref[...]

    f1 = f1_ref[0, 0]                                  # (G, gp)
    f2 = f2_ref[0, 0]
    zg = zg_ref[0]                                     # (G, gp)
    eb = dl.shape[0]
    outs = []
    row_slice = functools.partial(jax.lax.slice_in_dim, axis=0)
    for sb in range(eb // sub):
        sl = slice(sb * sub, (sb + 1) * sub)
        e_loc = (sb * sub) // c_per_event              # static: C % sub == 0
        # static lax slices, NOT z[sl, None, :]-style mixed indexing — the
        # latter lowers to a gather Mosaic rejects
        g = row_slice(zg, e_loc, e_loc + 1)            # (1, gp)
        zc = row_slice(z, sb * sub, (sb + 1) * sub)    # (sub, chunk)
        wc = row_slice(w, sb * sub, (sb + 1) * sub)
        inv_h = hs_ref[0, sl, 0:1]                     # (sub, 1)
        scale = hs_ref[0, sl, 1:2]                     # inv_h / sum_w_pixel
        # (sub, chunk, gp) orientation — samples on SUBLANES, grid on
        # LANES — so the sample contraction is a cheap cross-sublane
        # reduction (~1 op/vreg) instead of a cross-lane shuffle tree
        # (~7 ops/vreg at chunk=128); measured 18.9 -> 4.8 ms/lambda at
        # the 1000-event flagship.  (1/h as a multiply, not an in-loop
        # divide.)
        u = (g[:, None, :] - zc[:, :, None]) * inv_h[:, :, None]
        if kernel == "epan":
            k = 0.75 * jnp.maximum(0.0, 1.0 - u * u)
        else:
            k = jnp.exp(-0.5 * u * u) * (1.0 / _SQRT_2PI)
        den = jnp.sum(wc[:, :, None] * k, axis=1)      # (sub, gp)
        f1r = row_slice(f1, e_loc, e_loc + 1)
        f2r = row_slice(f2, e_loc, e_loc + 1)
        r1 = jnp.sum(den * s1_ref[sl, :] * f1r, axis=-1, keepdims=True)
        r2 = jnp.sum(den * s2_ref[sl, :] * f2r, axis=-1, keepdims=True)
        pad = jnp.zeros((den.shape[0], 6), den.dtype)
        outs.append(jnp.concatenate([r1 * scale, r2 * scale, pad], axis=-1))
    out_ref[0, :, :] = jnp.concatenate(outs, axis=0)


@functools.partial(jax.jit, static_argnames=("kernel", "c_per_event",
                                             "interpret"))
def fused_rows_contract(m1det, m2det, dl, inv_pe_prior, cosmo_batch,
                        mass_batch, grids, hs, s1, s2, f1, f2,
                        kernel: str = "epan", c_per_event: int = 8,
                        interpret: bool = False):
    """KDE + dark-siren contract over dense 128-sample chunk rows.

    The flagship 'marginalized' path: each row is one chunk of one pixel's
    samples (data.pixelize.chunk_rows_from_compact), so KDE work scales with
    the REAL sample count instead of pixels x global-max occupancy (~2-3x
    less than the rectangular compact layout at 1000 events).  Row
    statistics (bandwidth h and the guarded 1/(h*sum_w_pixel) scale) are
    computed by a cheap stats-only pass of :func:`fused_weights_kde` on the
    rectangular layout and gathered per row by the caller.

    Args:
      m1det..inv_pe_prior: (R, chunk) rows, R = E_ev * C, C % 8 == 0, rows
        event-major so every 8-row block belongs to one event.
      grids: (E_ev, n_grid) analysis grids.
      hs: (L, R, 2) per-(lambda, row) [1/bandwidth, scale]; scale = 0 kills
        dead rows exactly.
      s1, s2: (R, n_grid) static factors (p_cat/loc/trapz-weight products).
      f1, f2: (L, E_ev, n_grid) per-lambda factors.

    Returns:
      r: (L, R, 2) per-row partial sums; sum rows of an event for the
      per-event numerator pieces.
    """
    r_rows, chunk = dl.shape
    if r_rows % 8 or c_per_event % 8 or chunk % 128:
        raise ValueError("rows must tile: R % 8, C % 8, chunk % 128")
    cfg = _RowsCfg(kernel=kernel, c_per_event=c_per_event,
                   interpret=interpret)
    return _rows_call(cfg, m1det, m2det, dl, inv_pe_prior, cosmo_batch,
                      mass_batch, grids, hs, s1, s2, f1, f2)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _rows_call(cfg, m1det, m2det, dl, inv_pe_prior, cosmo_batch, mass_batch,
               grids, hs, s1, s2, f1, f2):
    return _rows_pallas(cfg, m1det, m2det, dl, inv_pe_prior, cosmo_batch,
                        mass_batch, grids, hs, s1, s2, f1, f2)


def _rows_fwd(cfg, *args):
    return _rows_pallas(cfg, *args), args


def _rows_bwd(cfg, residuals, ct):
    _, vjp = jax.vjp(functools.partial(_rows_reference, cfg), *residuals)
    return vjp(ct)


_rows_call.defvjp(_rows_fwd, _rows_bwd)


def _rows_reference(cfg, m1det, m2det, dl, inv_pe_prior, cosmo_batch,
                    mass_batch, grids, hs, s1, s2, f1, f2):
    """Pure-XLA semantics of _rows_kernel (differentiation path + engine
    oracle)."""
    r_rows = dl.shape[0]
    c = cfg.c_per_event
    e_ev = r_rows // c
    g = jnp.repeat(grids, c, axis=0)                   # (R, gp)

    def per_lambda(cosmo, mass, hs_l, f1_l, f2_l):
        z = cosmo_fns.z_from_dgw(cosmo, dl)
        inv1pz = 1.0 / (1.0 + z)
        w = p_m1m2(mass, m1det * inv1pz, m2det * inv1pz) * inv_pe_prior
        inv_h = hs_l[:, 0:1]
        scale = hs_l[:, 1:2]
        u = (g[:, :, None] - z[:, None, :]) * inv_h[:, :, None]
        if cfg.kernel == "epan":
            k = 0.75 * jnp.maximum(0.0, 1.0 - u * u)
        else:
            k = jnp.exp(-0.5 * u * u) * (1.0 / _SQRT_2PI)
        den = jnp.sum(w[:, None, :] * k, axis=-1)
        f1r = jnp.repeat(f1_l, c, axis=0)
        f2r = jnp.repeat(f2_l, c, axis=0)
        r1 = jnp.sum(den * s1 * f1r, axis=-1, keepdims=True) * scale
        r2 = jnp.sum(den * s2 * f2r, axis=-1, keepdims=True) * scale
        return jnp.concatenate([r1, r2], axis=-1)      # (R, 2)

    return jax.vmap(per_lambda)(cosmo_batch, mass_batch, hs, f1, f2)


def _rows_pallas(cfg, m1det, m2det, dl, inv_pe_prior, cosmo_batch,
                 mass_batch, grids, hs, s1, s2, f1, f2):
    r_rows, chunk = dl.shape
    c = cfg.c_per_event
    e_ev = grids.shape[0]
    n_grid = grids.shape[1]
    gp = _round_up(n_grid, 128)
    dt = dl.dtype

    # Group G whole events (EB = G * C rows ~ 128) per program so the fixed
    # program overhead amortizes over ~25 us of VPU work (see _rows_kernel).
    g_target = max(1, 128 // c)
    g_ev = next(g for g in range(g_target, 0, -1) if e_ev % g == 0)
    eb = g_ev * c

    cos_packed, cos_def, cos_shapes = _pack_leaves(cosmo_batch)
    mass_packed, mass_def, mass_shapes = _pack_leaves(mass_batch)
    L = hs.shape[0]

    zpad = [(0, 0), (0, gp - n_grid)]
    gpad = jnp.pad(grids.astype(dt), zpad,
                   mode="edge").reshape(e_ev // g_ev, g_ev, gp)
    s1p = jnp.pad(s1.astype(dt), zpad)                 # zeros: no tail term
    s2p = jnp.pad(s2.astype(dt), zpad)
    fpad = [(0, 0)] + zpad
    # grouped singleton-free axes keep the last-two block dims equal to the
    # array's (Mosaic rejects sub-8 blocks of a >1 second-to-last dim)
    f1p = jnp.pad(f1.astype(dt), fpad).reshape(L, e_ev // g_ev, g_ev, gp)
    f2p = jnp.pad(f2.astype(dt), fpad).reshape(L, e_ev // g_ev, g_ev, gp)

    row_spec = pl.BlockSpec((eb, chunk), lambda rb, l: (rb, 0),
                            memory_space=pltpu.VMEM)
    zg_spec = pl.BlockSpec((1, g_ev, gp), lambda rb, l: (rb, 0, 0),
                           memory_space=pltpu.VMEM)
    hs_spec = pl.BlockSpec((1, eb, 2), lambda rb, l: (l, rb, 0),
                           memory_space=pltpu.VMEM)
    s_spec = pl.BlockSpec((eb, gp), lambda rb, l: (rb, 0),
                          memory_space=pltpu.VMEM)
    f_spec = pl.BlockSpec((1, 1, g_ev, gp), lambda rb, l: (l, rb, 0, 0),
                          memory_space=pltpu.VMEM)
    leaf_specs = [
        pl.BlockSpec((1, 1, p.shape[-1]), lambda rb, l: (l, 0, 0),
                     memory_space=pltpu.VMEM)
        for p in cos_packed + mass_packed
    ]

    kern = functools.partial(
        _rows_kernel, cos_def=cos_def, cos_shapes=cos_shapes,
        mass_def=mass_def, mass_shapes=mass_shapes,
        n_cos=len(cos_packed), n_mass=len(mass_packed), kernel=cfg.kernel,
        c_per_event=c, sub=8)

    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((L, r_rows, 8), dt),
        grid=(r_rows // eb, L),         # lambda innermost: rows reused
        in_specs=[row_spec] * 4 + [zg_spec, hs_spec, s_spec, s_spec,
                                   f_spec, f_spec] + leaf_specs,
        out_specs=pl.BlockSpec((1, eb, 8), lambda rb, l: (l, rb, 0),
                               memory_space=pltpu.VMEM),
        interpret=cfg.interpret,
    )(m1det, m2det, dl, inv_pe_prior, gpad, hs.astype(dt), s1p, s2p,
      f1p, f2p, *cos_packed, *mass_packed)
    return out[:, :, :2]


# ---------------------------------------------------------------------------
# Adjoint kernel (fast hyper-lambda gradients)
# ---------------------------------------------------------------------------

def _adjoint_kernel(*refs, cos_def, cos_shapes, mass_def, mass_shapes,
                    n_cos, n_mass, kernel, bw_method, cut_grid, den_scale,
                    n_samples, block_s, n_grid, logical_s, grid_mode,
                    stats_only):
    """Adjoint of the fused forward: given cotangents for (den, stats),
    accumulate gradients w.r.t. the cosmology/mass leaves (and the
    effective-grid bounds in ext mode).

    Covers every forward mode: 'input' (analysis grids), 'auto'
    (cut_grid effective grids), 'ext' (external bounds), compacted rows
    (logical_s corrections) and stats_only passes.  The KDE-contraction
    adjoint is hand-derived and streamed (it is the part that must never
    materialize (G, S)); the row-statistics and source-frame chains are
    jax.vjp's of the same in-kernel code paths as the forward — one
    transcription, no drift.

    Grid layout is (lambda OUTER, event-block INNER) — the per-lambda
    leaf-gradient blocks stay resident while the event blocks sweep, so
    accumulation across blocks is a read-modify-write on VMEM."""
    (m1_ref, m2_ref, dl_ref, invp_ref) = refs[:4]
    p = 4
    g_ref = ext_ref = None
    if grid_mode == "input":
        g_ref = refs[p]
        p += 1
    elif grid_mode == "ext":
        ext_ref = refs[p]
        p += 1
    nreal_ref = dlfill_ref = None
    if logical_s is not None:
        nreal_ref, dlfill_ref = refs[p:p + 2]
        p += 2
    cd_ref, cs_ref = refs[p:p + 2]
    p += 2
    cos_refs = refs[p:p + n_cos]
    mass_refs = refs[p + n_cos:p + n_cos + n_mass]
    p += n_cos + n_mass
    gcos_refs = refs[p:p + n_cos]
    gmass_refs = refs[p + n_cos:p + n_cos + n_mass]
    p += n_cos + n_mass
    dext_ref = None
    if grid_mode == "ext":
        dext_ref = refs[p]
        p += 1
    z_scr, w_scr, dz_scr, dw_scr = refs[p:]

    eb = pl.program_id(1)

    cos_vals = [r[0, 0, :] for r in cos_refs]
    mass_vals = [r[0, 0, :] for r in mass_refs]
    m1 = m1_ref[...]
    m2 = m2_ref[...]
    dl = dl_ref[...]
    invp = invp_ref[...]
    dl_fill = dlfill_ref[...] if logical_s is not None else None

    def phase_a(cvals, mvals):
        cosmo = tree_unflatten(cos_def, [
            v.reshape(sh) if sh else v[0] for v, sh in zip(cvals, cos_shapes)])
        mass = tree_unflatten(mass_def, [
            v.reshape(sh) if sh else v[0] for v, sh in zip(mvals, mass_shapes)])
        z_ = cosmo_fns.z_from_dgw(cosmo, dl)
        inv1pz = 1.0 / (1.0 + z_)
        w_ = p_m1m2(mass, m1 * inv1pz, m2 * inv1pz) * invp
        if logical_s is None:
            return z_, w_, jnp.zeros((dl.shape[0], 1), dl.dtype)
        return z_, w_, cosmo_fns.z_from_dgw(cosmo, dl_fill)

    (z, w, zf), phase_a_vjp = jax.vjp(phase_a, cos_vals, mass_vals)
    z_scr[...] = z
    w_scr[...] = w
    dt = z.dtype
    tiny = jnp.asarray(jnp.finfo(dt).tiny, dt)
    sl_log = float(n_samples if logical_s is None else logical_s)
    n_val = (nreal_ref[...].astype(dt) if logical_s is not None else None)

    def stats_of(z_, w_, zf_):
        """Row statistics — the safe-math _reference_impl formulas."""
        sum_w_ = jnp.sum(w_, axis=-1, keepdims=True)
        sum_w2_ = jnp.sum(w_ * w_, axis=-1, keepdims=True)
        if logical_s is None:
            z_mean = jnp.mean(z_, axis=-1, keepdims=True)
            z_var = jnp.mean((z_ - z_mean) ** 2, axis=-1, keepdims=True)
            z_min = jnp.min(z_, axis=-1, keepdims=True)
            z_max = jnp.max(z_, axis=-1, keepdims=True)
        else:
            f_pp = float(n_samples) - n_val
            f_log = sl_log - n_val
            sum_z_real = jnp.sum(z_, axis=-1, keepdims=True) - f_pp * zf_
            z_mean = (sum_z_real + f_log * zf_) / sl_log
            ss_pp = jnp.sum((z_ - z_mean) ** 2, axis=-1, keepdims=True)
            z_var = (ss_pp + (f_log - f_pp) * (zf_ - z_mean) ** 2) / sl_log
            z_min = jnp.minimum(jnp.min(z_, axis=-1, keepdims=True), zf_)
            z_max = jnp.maximum(jnp.max(z_, axis=-1, keepdims=True), zf_)
        # variance floor sqrt(tiny): see _reference_impl (finite partials)
        z_sig = jnp.sqrt(jnp.maximum(z_var, jnp.sqrt(tiny)))
        # Kish n_eff clamped to its exact mathematical range [1, S] — see
        # _reference_impl (underflow-overflow gradient poisoning)
        neff_ = jnp.clip(
            sum_w_ * sum_w_ / jnp.where(sum_w2_ > 0, sum_w2_, 1.0),
            1.0, sl_log)
        h_ = bw_factor(neff_, 1, bw_method) * z_sig
        if grid_mode == "auto":
            lo_ = jnp.where(z_min - cut_grid * z_sig > 0.0,
                            z_min - cut_grid * z_sig, 1e-8)
            ub_ = z_max + cut_grid * z_sig
        else:
            lo_ = jnp.zeros_like(z_min)
            ub_ = jnp.zeros_like(z_min)
        return (lo_, ub_, sum_w_ / sl_log, neff_, h_, sum_w_, sum_w2_)

    stats, stats_vjp = jax.vjp(stats_of, z, w, zf)
    lo_s, ub_s, norms, neff, h, sum_w, sum_w2 = stats
    inv_h = 1.0 / h
    gp = cd_ref.shape[2]
    e_blk = cd_ref.shape[1]
    cd = cd_ref[0, :, :]                                       # (E, Gp)

    if grid_mode == "input":
        g = g_ref[...]
    else:
        if grid_mode == "ext":
            lo_g = ext_ref[0, :, 0:1]
            ub_g = ext_ref[0, :, 1:2]
        else:
            lo_g, ub_g = lo_s, ub_s
        delta = (ub_g - lo_g) / (n_grid - 1)
        g_idx = jax.lax.broadcasted_iota(jnp.int32, (e_blk, gp), 1)
        g = lo_g + delta * g_idx.astype(dt)

    if den_scale == "norms":
        denom = sl_log
        c1 = cd * (inv_h / denom)                              # (E, Gp)
    else:
        # select-denominator (see _reference_impl): near-zero weight rows
        # have zero density and clean zero gradients
        row_ok = sum_w > jnp.sqrt(tiny)
        denom = jnp.where(row_ok, sum_w, 1.0)
        c1 = jnp.where(row_ok, cd * (inv_h / denom), 0.0)

    # ---- adjoint of the KDE contraction, streamed over sample chunks -----
    # gp is always a multiple of 128 but not necessarily of 256 (e.g.
    # n_grid=300 -> gp=384): pick the largest tile that divides it exactly,
    # or the tile loop would drop the tail columns.
    g_tile = 256 if gp % 256 == 0 else 128

    def chunk(i, carry):
        # (E, Sc, Gt) orientation, grid axis split into <=256-lane tiles:
        # each temporary is E*Sc*Gt*4B (~1 MB) and ~5 are live per tile —
        # the whole working set stays inside the 16 MB scoped-VMEM budget.
        # (Sc is 128: lane-aligned dynamic slices of the (E, S) scratch;
        # the event block must stay 8 for sublane divisibility.)
        r_acc, t_acc, dg_acc = carry
        sl = pl.ds(i * block_s, block_s)
        zc = z_scr[:, sl]                                      # (E, Sc)
        wc = w_scr[:, sl]
        dw_c = jnp.zeros((e_blk, block_s), dt)
        dz_c = jnp.zeros((e_blk, block_s), dt)
        t_c = jnp.zeros((e_blk, 1), dt)
        r_pieces, dg_pieces = [], []
        for gh in range(gp // g_tile):
            gsl = slice(gh * g_tile, (gh + 1) * g_tile)
            gg = g[:, gsl]                                     # (E, Gt)
            c1g = c1[:, gsl]
            u = (gg[:, None, :] - zc[:, :, None]) * inv_h[:, None, :]
            if kernel == "epan":
                inside = (u > -1.0) & (u < 1.0)
                k = jnp.where(inside, 0.75 * (1.0 - u * u), 0.0)
                kp = jnp.where(inside, -1.5 * u, 0.0)
            else:
                k = jnp.exp(-0.5 * u * u) * (1.0 / _SQRT_2PI)
                kp = -u * k
            du = (c1g[:, None, :] * wc[:, :, None]) * kp       # (E, Sc, Gt)
            dw_c = dw_c + jnp.sum(c1g[:, None, :] * k, axis=2)
            dz_c = dz_c - inv_h[:, 0:1] * jnp.sum(du, axis=2)
            r_pieces.append(jnp.sum(wc[:, :, None] * k, axis=1))
            dg_pieces.append(inv_h * jnp.sum(du, axis=1))      # (E, Gt)
            # two-stage reduction keeps intermediates >= rank 2 (Mosaic)
            t_c = t_c + jnp.sum(jnp.sum(du * u, axis=2), axis=1,
                                keepdims=True)
        dw_scr[:, sl] = dw_c
        dz_scr[:, sl] = dz_c
        r_acc = r_acc + jnp.concatenate(r_pieces, axis=1)      # (E, Gp)
        dg_acc = dg_acc + jnp.concatenate(dg_pieces, axis=1)
        return (r_acc, t_acc + t_c, dg_acc)

    zeros_eg = jnp.zeros((e_blk, gp), dt)
    zeros_e1 = jnp.zeros((e_blk, 1), dt)
    if stats_only:
        r_tot, t_tot, dg_tot = zeros_eg, zeros_e1, zeros_eg
        dz_kde = jnp.zeros((e_blk, n_samples), dt)
        dw_kde = jnp.zeros((e_blk, n_samples), dt)
    else:
        r_tot, t_tot, dg_tot = jax.lax.fori_loop(
            0, n_samples // block_s, chunk, (zeros_eg, zeros_e1, zeros_eg))
        dz_kde = dz_scr[...]
        dw_kde = dw_scr[...]

    # ---- contraction-side chains ----------------------------------------
    ct_lo = cs_ref[0, :, 0:1]
    ct_ub = cs_ref[0, :, 1:2]
    ct_norms = cs_ref[0, :, 2:3]
    ct_neff = cs_ref[0, :, 3:4]
    ct_h = cs_ref[0, :, 4:5]
    ct_sw = cs_ref[0, :, 5:6]
    ct_sw2 = cs_ref[0, :, 6:7]

    cd_r = jnp.sum(cd * r_tot, axis=-1, keepdims=True)         # (E, 1)
    dh_kde = -inv_h * inv_h * (cd_r / denom + t_tot / inv_h)
    d_sum_w_extra = jnp.zeros_like(sum_w)
    if den_scale != "norms":
        den_row = r_tot * (inv_h / denom)
        d_sum_w_extra = jnp.where(
            row_ok,
            -jnp.sum(cd * den_row, axis=-1, keepdims=True) / denom, 0.0)

    # effective-grid bound chains: g = lo + (ub - lo) * frac
    if grid_mode != "input" and not stats_only:
        frac = jax.lax.broadcasted_iota(jnp.int32, (e_blk, gp), 1).astype(dt) \
            / (n_grid - 1)
        dlo_g = jnp.sum(dg_tot * (1.0 - frac), axis=-1, keepdims=True)
        dub_g = jnp.sum(dg_tot * frac, axis=-1, keepdims=True)
    else:
        dlo_g = jnp.zeros_like(sum_w)
        dub_g = jnp.zeros_like(sum_w)

    if grid_mode == "ext":
        # bounds are kernel INPUTS: cotangents (incl. the stats lo/ub
        # passthrough the forward exposes) go to the d_ext output
        dext_ref[...] = jnp.concatenate(
            [ct_lo + dlo_g, ct_ub + dub_g], axis=-1)[None, :, :]
        ct_lo = jnp.zeros_like(ct_lo)
        ct_ub = jnp.zeros_like(ct_ub)
    elif grid_mode == "auto":
        ct_lo = ct_lo + dlo_g
        ct_ub = ct_ub + dub_g
    # 'input' mode: lo/ub outputs are constants; their cotangents vanish

    dz_stats, dw_stats, dzf = stats_vjp(
        (ct_lo, ct_ub, ct_norms, ct_neff, ct_h + dh_kde,
         ct_sw + d_sum_w_extra, ct_sw2))

    dcos, dmass = phase_a_vjp((dz_kde + dz_stats, dw_kde + dw_stats, dzf))

    @pl.when(eb == 0)
    def _init():
        for ref in gcos_refs + gmass_refs:
            ref[...] = jnp.zeros(ref.shape, ref.dtype)

    for ref, grad in zip(gcos_refs, dcos):
        ref[...] += grad.reshape(ref.shape)
    for ref, grad in zip(gmass_refs, dmass):
        ref[...] += grad.reshape(ref.shape)


def _adjoint_impl(cfg: _FusedCfg, residuals, cotangents):
    """Run the adjoint kernel; package cotangents for _fused_call's args."""
    import numpy as np

    from jax.dtypes import float0

    (m1det, m2det, dl, inv_pe_prior, cosmo_batch, mass_batch,
     grids, n_real, dl_fill, ext_bounds, s1, s2, f1, f2) = residuals
    assert s1 is None, "contract mode uses the XLA backward"
    ct_den, ct_stats = cotangents
    e, s = dl.shape
    # Sc must be a multiple of 128 (lane-aligned dynamic slices of the
    # (E, S) scratch); VMEM pressure is controlled by tiling the grid axis
    # inside the chunk body instead (see _adjoint_kernel).
    block_s = 128
    cos_packed, cos_def, cos_shapes = _pack_leaves(cosmo_batch)
    mass_packed, mass_def, mass_shapes = _pack_leaves(mass_batch)
    L = cos_packed[0].shape[0] if cos_packed else mass_packed[0].shape[0]
    if grids is not None and ext_bounds is None:
        grid_mode = "input"
        n_grid = grids.shape[1]
    elif ext_bounds is not None:
        grid_mode = "ext"
        n_grid = cfg.n_grid
    else:
        grid_mode = "auto"
        n_grid = cfg.n_grid
    gp = _round_up(n_grid, 128)

    cd = jnp.pad(jnp.asarray(ct_den, dl.dtype),
                 [(0, 0), (0, 0), (0, gp - ct_den.shape[2])])  # zero-pad
    # stats cotangent layout mirrors the forward's 8-slot concat
    cs = jnp.stack([
        ct_stats["lo"], ct_stats["ub"],
        ct_stats["norms"], ct_stats["neff"], ct_stats["bandwidth"],
        ct_stats["sum_w"], ct_stats["sum_w2"],
        jnp.zeros_like(ct_stats["lo"]),
    ], axis=-1).astype(dl.dtype)                               # (L, E, 8)

    e_blk = _BLOCK_E
    pe_spec = pl.BlockSpec((e_blk, s), lambda l, eb: (eb, 0),
                           memory_space=pltpu.VMEM)
    grid_inputs, grid_specs = [], []
    if grid_mode == "input":
        gpad = jnp.pad(grids, [(0, 0), (0, gp - n_grid)], mode="edge")
        grid_inputs = [gpad]
        grid_specs = [pl.BlockSpec((e_blk, gp), lambda l, eb: (eb, 0),
                                   memory_space=pltpu.VMEM)]
    elif grid_mode == "ext":
        grid_inputs = [ext_bounds.astype(dl.dtype)]
        grid_specs = [pl.BlockSpec((1, e_blk, 2), lambda l, eb: (l, eb, 0),
                                   memory_space=pltpu.VMEM)]
    if cfg.logical_s is not None:
        grid_inputs += [n_real.reshape(e, 1).astype(dl.dtype),
                        dl_fill.reshape(e, 1).astype(dl.dtype)]
        grid_specs += [pl.BlockSpec((e_blk, 1), lambda l, eb: (eb, 0),
                                    memory_space=pltpu.VMEM)] * 2
    cd_spec = pl.BlockSpec((1, e_blk, gp), lambda l, eb: (l, eb, 0),
                           memory_space=pltpu.VMEM)
    cs_spec = pl.BlockSpec((1, e_blk, 8), lambda l, eb: (l, eb, 0),
                           memory_space=pltpu.VMEM)
    leaf_specs = [
        pl.BlockSpec((1, 1, pk.shape[-1]), lambda l, eb: (l, 0, 0),
                     memory_space=pltpu.VMEM)
        for pk in cos_packed + mass_packed
    ]
    out_shape = [jax.ShapeDtypeStruct(pk.shape, dl.dtype)
                 for pk in cos_packed + mass_packed]
    out_specs = [
        pl.BlockSpec((1, 1, pk.shape[-1]), lambda l, eb: (l, 0, 0),
                     memory_space=pltpu.VMEM)
        for pk in cos_packed + mass_packed
    ]
    if grid_mode == "ext":
        out_shape.append(jax.ShapeDtypeStruct((L, e, 2), dl.dtype))
        out_specs.append(pl.BlockSpec((1, e_blk, 2), lambda l, eb: (l, eb, 0),
                                      memory_space=pltpu.VMEM))

    kern = functools.partial(
        _adjoint_kernel, cos_def=cos_def, cos_shapes=cos_shapes,
        mass_def=mass_def, mass_shapes=mass_shapes,
        n_cos=len(cos_packed), n_mass=len(mass_packed),
        kernel=cfg.kernel, bw_method=cfg.bw_method, cut_grid=cfg.cut_grid,
        den_scale=cfg.den_scale, n_samples=s, block_s=block_s,
        n_grid=n_grid, logical_s=cfg.logical_s, grid_mode=grid_mode,
        stats_only=cfg.stats_only)

    outs = pl.pallas_call(
        kern,
        out_shape=out_shape,
        grid=(L, e // e_blk),              # lambda outer: grad blocks resident
        in_specs=[pe_spec] * 4 + grid_specs + [cd_spec, cs_spec] + leaf_specs,
        out_specs=out_specs,
        scratch_shapes=[pltpu.VMEM((e_blk, s), dl.dtype)] * 4,
        interpret=cfg.interpret,
    )(m1det, m2det, dl, inv_pe_prior, *grid_inputs, cd, cs, *cos_packed,
      *mass_packed)

    n_cos = len(cos_packed)
    n_leaves = n_cos + len(mass_packed)
    grads = outs[:n_leaves]
    d_ext = outs[n_leaves] if grid_mode == "ext" else None
    cos_leaves, _ = tree_flatten(cosmo_batch)
    mass_leaves, _ = tree_flatten(mass_batch)
    dcos = tree_unflatten(cos_def, [
        gr.reshape(leaf.shape).astype(leaf.dtype)
        for gr, leaf in zip(grads[:n_cos], cos_leaves)])
    dmass = tree_unflatten(mass_def, [
        gr.reshape(leaf.shape).astype(leaf.dtype)
        for gr, leaf in zip(grads[n_cos:], mass_leaves)])

    def zero_ct(x):
        if x is None:
            return None
        if jnp.issubdtype(jnp.asarray(x).dtype, jnp.integer):
            return np.zeros(jnp.shape(x), dtype=float0)
        return jnp.zeros_like(x)

    return (zero_ct(m1det), zero_ct(m2det), zero_ct(dl),
            zero_ct(inv_pe_prior), dcos, dmass, zero_ct(grids),
            zero_ct(n_real), zero_ct(dl_fill),
            d_ext if d_ext is not None else None,
            None, None, None, None)


def _pallas_impl(cfg: _FusedCfg, m1det, m2det, dl, inv_pe_prior,
                 cosmo_batch, mass_batch, grids, n_real, dl_fill,
                 ext_bounds=None, s1=None, s2=None, f1=None, f2=None):
    e, s = dl.shape
    kernel, bw_method = cfg.kernel, cfg.bw_method
    cut_grid, n_grid = cfg.cut_grid, cfg.n_grid
    den_scale, interpret, logical_s = cfg.den_scale, cfg.interpret, cfg.logical_s
    block_s = next((b for b in (_BLOCK_S, 256, 128) if s % b == 0), None)
    cos_packed, cos_def, cos_shapes = _pack_leaves(cosmo_batch)
    mass_packed, mass_def, mass_shapes = _pack_leaves(mass_batch)
    L = cos_packed[0].shape[0] if cos_packed else mass_packed[0].shape[0]
    if grids is not None and ext_bounds is None:
        n_grid = grids.shape[1]
    gp = _round_up(n_grid, 128)

    pe_spec = pl.BlockSpec((_BLOCK_E, s), lambda eb, l: (eb, 0),
                           memory_space=pltpu.VMEM)
    grid_inputs, grid_specs = [], []
    if grids is not None and ext_bounds is None:
        # pad grid columns by repeating the endpoint (extra densities are
        # computed at a duplicate abscissa and sliced off)
        gpad = jnp.pad(grids, [(0, 0), (0, gp - n_grid)], mode="edge")
        grid_inputs = [gpad]
        grid_specs = [pl.BlockSpec((_BLOCK_E, gp), lambda eb, l: (eb, 0),
                                   memory_space=pltpu.VMEM)]
    if ext_bounds is not None:
        grid_inputs += [ext_bounds.astype(dl.dtype)]
        grid_specs += [pl.BlockSpec((1, _BLOCK_E, 2), lambda eb, l: (l, eb, 0),
                                    memory_space=pltpu.VMEM)]
    if logical_s is not None:
        if n_real is None or dl_fill is None:
            raise ValueError("logical_s requires n_real and dl_fill")
        grid_inputs += [n_real.reshape(e, 1).astype(dl.dtype),
                        dl_fill.reshape(e, 1).astype(dl.dtype)]
        grid_specs += [pl.BlockSpec((_BLOCK_E, 1), lambda eb, l: (eb, 0),
                                    memory_space=pltpu.VMEM)] * 2
    npix = cfg.npix
    if npix:
        # s1/s2 per-row static factors: zero-pad the grid columns (padded
        # abscissae then contribute exactly nothing); f1/f2 per-(lambda,
        # event) factors: block covers the row-block's event(s).
        zpad = [(0, 0), (0, gp - n_grid)]
        grid_inputs += [jnp.pad(s1.astype(dl.dtype), zpad),
                        jnp.pad(s2.astype(dl.dtype), zpad)]
        grid_specs += [pl.BlockSpec((_BLOCK_E, gp), lambda eb, l: (eb, 0),
                                    memory_space=pltpu.VMEM)] * 2
        fpad = [(0, 0)] + zpad
        f1p = jnp.pad(f1.astype(dl.dtype), fpad)
        f2p = jnp.pad(f2.astype(dl.dtype), fpad)
        if npix == 1:
            grid_inputs += [f1p, f2p]
            f_spec = pl.BlockSpec((1, _BLOCK_E, gp), lambda eb, l: (l, eb, 0),
                                  memory_space=pltpu.VMEM)
        else:
            # Mosaic requires the block's 2nd-to-last dim to divide 8 or
            # equal the array's — a (1, 1, gp) block of (L, E, gp) is
            # rejected; an extra singleton axis makes the last-two block
            # dims (1, gp) equal to the array's.
            e_ev = f1.shape[1]
            grid_inputs += [f1p.reshape(L, e_ev, 1, gp),
                            f2p.reshape(L, e_ev, 1, gp)]
            blocks_per_event = npix // _BLOCK_E
            f_spec = pl.BlockSpec(
                (1, 1, 1, gp),
                lambda eb, l: (l, eb // blocks_per_event, 0, 0),
                memory_space=pltpu.VMEM)
        grid_specs += [f_spec] * 2
    leaf_specs = [
        pl.BlockSpec((1, 1, p.shape[-1]), lambda eb, l: (l, 0, 0),
                     memory_space=pltpu.VMEM)
        for p in cos_packed + mass_packed
    ]
    den_cols = 8 if npix else gp
    out_shape = [
        jax.ShapeDtypeStruct((L, e, den_cols), dl.dtype),
        jax.ShapeDtypeStruct((L, e, 8), dl.dtype),
    ]
    out_specs = [
        pl.BlockSpec((1, _BLOCK_E, den_cols), lambda eb, l: (l, eb, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, _BLOCK_E, 8), lambda eb, l: (l, eb, 0),
                     memory_space=pltpu.VMEM),
    ]

    kern = functools.partial(
        _fused_kernel, cos_def=cos_def, cos_shapes=cos_shapes,
        mass_def=mass_def, mass_shapes=mass_shapes,
        n_cos=len(cos_packed), n_mass=len(mass_packed),
        kernel=kernel, bw_method=bw_method, cut_grid=cut_grid,
        n_grid=n_grid, n_samples=s, block_s=block_s, den_scale=den_scale,
        logical_s=logical_s, has_ext_bounds=ext_bounds is not None,
        stats_only=cfg.stats_only, npix=npix)

    den, stats = pl.pallas_call(
        kern,
        out_shape=out_shape,
        grid=(e // _BLOCK_E, L),        # lambda innermost: PE blocks reused
        in_specs=[pe_spec] * 4 + grid_specs + leaf_specs,
        out_specs=out_specs,
        scratch_shapes=[pltpu.VMEM((_BLOCK_E, s), dl.dtype)] * 2,
        interpret=interpret,
    )(m1det, m2det, dl, inv_pe_prior, *grid_inputs, *cos_packed,
      *mass_packed)

    den = den[:, :, :2] if npix else den[:, :, :n_grid]
    return den, {
        "lo": stats[:, :, 0], "ub": stats[:, :, 1],
        "norms": stats[:, :, 2], "neff": stats[:, :, 3],
        "bandwidth": stats[:, :, 4],
        "sum_w": stats[:, :, 5], "sum_w2": stats[:, :, 6],
    }
