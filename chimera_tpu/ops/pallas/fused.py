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
                  stats_only):
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
    gp = den_ref.shape[2]
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
        den_ref[0, :, :] = jnp.zeros((_BLOCK_E, gp), z.dtype)
    else:
        den = jax.lax.fori_loop(0, n_samples // block_s, chunk,
                                jnp.zeros((_BLOCK_E, gp), z.dtype))
        if den_scale == "norms":
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

    Returns:
      den:   (L, E, n_grid) densities on per-(lambda,event) effective grids
        (cut_grid mode) or on ``grids`` (analysis mode)
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
    cfg = _FusedCfg(kernel=kernel, bw_method=bw_method, cut_grid=cut_grid,
                    n_grid=n_grid, den_scale=den_scale, interpret=interpret,
                    logical_s=logical_s, stats_only=stats_only, bwd=bwd)
    return _fused_call(cfg, m1det, m2det, dl, inv_pe_prior,
                       cosmo_batch, mass_batch, grids, n_real, dl_fill,
                       ext_bounds)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _fused_call(cfg, m1det, m2det, dl, inv_pe_prior, cosmo_batch, mass_batch,
                grids, n_real, dl_fill, ext_bounds):
    return _pallas_impl(cfg, m1det, m2det, dl, inv_pe_prior, cosmo_batch,
                        mass_batch, grids, n_real, dl_fill, ext_bounds)


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
    return (cfg.cut_grid is None and cfg.logical_s is None
            and not cfg.stats_only and cfg.kernel in ("epan", "gauss"))


_fused_call.defvjp(_fused_fwd, _fused_bwd)


def _reference_impl(cfg: _FusedCfg, m1det, m2det, dl, inv_pe_prior,
                    cosmo_batch, mass_batch, grids, n_real, dl_fill,
                    ext_bounds=None):
    """Pure-XLA implementation of the fused kernel's exact semantics.

    Used as (a) the differentiation path of :func:`fused_weights_kde` and
    (b) an engine-agreement oracle in the tests.  Mirrors `_fused_kernel`
    phase by phase."""
    e, s = dl.shape
    dt = dl.dtype

    def per_lambda(cosmo, mass, ext):
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
        z_sig = jnp.sqrt(jnp.maximum(z_var, tiny))
        neff = sum_w * sum_w / jnp.where(sum_w2 > 0, sum_w2, 1.0)
        h = bw_factor(jnp.maximum(neff, tiny), 1, cfg.bw_method) * z_sig

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
            denom = sl if cfg.den_scale == "norms" else jnp.maximum(
                sum_w, tiny)[:, None]
            den = den / h[:, None] / denom
        return den, lo, ub, sum_w / sl, neff, h, sum_w, sum_w2

    den, lo, ub, norms, neff, h, sum_w, sum_w2 = jax.vmap(per_lambda)(
        cosmo_batch, mass_batch, ext_bounds)
    return den, {"lo": lo, "ub": ub, "norms": norms, "neff": neff,
                 "bandwidth": h, "sum_w": sum_w, "sum_w2": sum_w2}


# ---------------------------------------------------------------------------
# Adjoint kernel (fast hyper-lambda gradients)
# ---------------------------------------------------------------------------

def _adjoint_kernel(*refs, cos_def, cos_shapes, mass_def, mass_shapes,
                    n_cos, n_mass, kernel, bw_method, den_scale,
                    n_samples, block_s, n_grid):
    """Adjoint of the analysis-grid eventwise forward: given cotangents for
    (den, stats), accumulate gradients w.r.t. the cosmology/mass leaves.

    Grid layout is (lambda OUTER, event-block INNER) — the per-lambda leaf
    gradient blocks stay resident while the event blocks sweep, so
    accumulation across blocks is a read-modify-write on VMEM."""
    (m1_ref, m2_ref, dl_ref, invp_ref, g_ref, cd_ref, cs_ref) = refs[:7]
    cos_refs = refs[7:7 + n_cos]
    mass_refs = refs[7 + n_cos:7 + n_cos + n_mass]
    gcos_refs = refs[7 + n_cos + n_mass:7 + 2 * n_cos + n_mass]
    gmass_refs = refs[7 + 2 * n_cos + n_mass:7 + 2 * (n_cos + n_mass)]
    z_scr, w_scr, dz_scr, dw_scr = refs[7 + 2 * (n_cos + n_mass):]

    eb = pl.program_id(1)

    cos_vals = [r[0, 0, :] for r in cos_refs]
    mass_vals = [r[0, 0, :] for r in mass_refs]

    def phase_a(cvals, mvals, m1, m2, dl_in, invp):
        cosmo = tree_unflatten(cos_def, [
            v.reshape(s) if s else v[0] for v, s in zip(cvals, cos_shapes)])
        mass = tree_unflatten(mass_def, [
            v.reshape(s) if s else v[0] for v, s in zip(mvals, mass_shapes)])
        z = cosmo_fns.z_from_dgw(cosmo, dl_in)
        inv1pz = 1.0 / (1.0 + z)
        w = p_m1m2(mass, m1 * inv1pz, m2 * inv1pz) * invp
        return z, w

    m1 = m1_ref[...]
    m2 = m2_ref[...]
    dl = dl_ref[...]
    invp = invp_ref[...]
    (z, w), phase_a_vjp = jax.vjp(
        lambda cv, mv: phase_a(cv, mv, m1, m2, dl, invp),
        cos_vals, mass_vals)
    z_scr[...] = z
    w_scr[...] = w
    dt = z.dtype
    tiny = jnp.asarray(jnp.finfo(dt).tiny, dt)

    # ---- forward row statistics (same safe math as _reference_impl) ------
    s = float(n_samples)
    sum_w = jnp.sum(w, axis=-1, keepdims=True)                 # (E, 1)
    sum_w2 = jnp.sum(w * w, axis=-1, keepdims=True)
    z_mean = jnp.mean(z, axis=-1, keepdims=True)
    z_var = jnp.mean((z - z_mean) ** 2, axis=-1, keepdims=True)
    z_sig = jnp.sqrt(jnp.maximum(z_var, tiny))
    sum_w2_safe = jnp.where(sum_w2 > 0, sum_w2, 1.0)
    neff = sum_w * sum_w / sum_w2_safe
    neff_safe = jnp.maximum(neff, tiny)
    if bw_method is None or bw_method == "scott":
        bw = jnp.exp(-0.2 * jnp.log(neff_safe))
        dbw_dneff = -0.2 * bw / neff_safe
    elif bw_method == "silverman":
        bw = jnp.exp(-0.2 * jnp.log(neff_safe * 0.75))
        dbw_dneff = -0.2 * bw / neff_safe
    else:
        bw = jnp.full_like(neff, float(bw_method))
        dbw_dneff = jnp.zeros_like(neff)
    h = bw * z_sig
    inv_h = 1.0 / h
    g = g_ref[...]                                             # (E, Gp)
    cd = cd_ref[0, :, :]                                       # (E, Gp)
    denom = s if den_scale == "norms" else jnp.maximum(sum_w, tiny)
    c1 = cd * (inv_h / denom)                                  # (E, Gp)

    # ---- adjoint of the KDE contraction, streamed over sample chunks -----
    e_blk, gp = cd.shape

    # gp is always a multiple of 128 but not necessarily of 256 (e.g.
    # n_grid=300 -> gp=384): pick the largest tile that divides it exactly,
    # or the full loop would drop the tail columns.
    g_tile = 256 if gp % 256 == 0 else 128

    def chunk(i, carry):
        # (E, Sc, Gt) orientation, grid axis split into 256-lane tiles:
        # each temporary is E*Sc*Gt*4B (~1 MB) and ~5 are live per tile —
        # the whole working set stays inside the 16 MB scoped-VMEM budget.
        # (Sc is 128: lane-aligned dynamic slices of the (E, S) scratch;
        # the event block must stay 8 for sublane divisibility.)
        r_acc, t_acc = carry
        sl = pl.ds(i * block_s, block_s)
        zc = z_scr[:, sl]                                      # (E, Sc)
        wc = w_scr[:, sl]
        dw_c = jnp.zeros((e_blk, block_s), dt)
        dz_c = jnp.zeros((e_blk, block_s), dt)
        t_c = jnp.zeros((e_blk, 1), dt)
        r_pieces = []
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
            # two-stage reduction keeps intermediates >= rank 2 (Mosaic)
            t_c = t_c + jnp.sum(jnp.sum(du * u, axis=2), axis=1,
                                keepdims=True)
        dw_scr[:, sl] = dw_c
        dz_scr[:, sl] = dz_c
        r_acc = r_acc + jnp.concatenate(r_pieces, axis=1)      # (E, Gp)
        return (r_acc, t_acc + t_c)

    r_tot, t_tot = jax.lax.fori_loop(
        0, n_samples // block_s, chunk,
        (jnp.zeros((e_blk, gp), dt), jnp.zeros((e_blk, 1), dt)))

    # ---- scalar chains ---------------------------------------------------
    ct_norms = cs_ref[0, :, 2:3]
    ct_neff = cs_ref[0, :, 3:4]
    ct_h = cs_ref[0, :, 4:5]
    ct_sw = cs_ref[0, :, 5:6]
    ct_sw2 = cs_ref[0, :, 6:7]

    cd_r = jnp.sum(cd * r_tot, axis=-1, keepdims=True)         # (E, 1)
    d_invh = cd_r / denom + t_tot / inv_h
    dh = ct_h - inv_h * inv_h * d_invh
    d_sum_w_extra = jnp.zeros_like(sum_w)
    if den_scale != "norms":
        den_row = r_tot * (inv_h / denom)
        d_sum_w_extra = -jnp.sum(cd * den_row, axis=-1, keepdims=True) \
            / jnp.maximum(sum_w, tiny)
    ct_neff_tot = ct_neff + dh * z_sig * dbw_dneff
    d_sum_w = (ct_sw + ct_norms / s + d_sum_w_extra
               + ct_neff_tot * 2.0 * sum_w / sum_w2_safe)
    d_sum_w2 = ct_sw2 - ct_neff_tot * neff / sum_w2_safe
    dz_sig = dh * bw
    dz_var = jnp.where(z_var > tiny, dz_sig * 0.5 / z_sig, 0.0)

    dz_total = dz_scr[...] + dz_var * 2.0 * (z - z_mean) / s
    dw_total = dw_scr[...] + d_sum_w + 2.0 * w * d_sum_w2

    dcos, dmass = phase_a_vjp((dz_total, dw_total))

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
    (m1det, m2det, dl, inv_pe_prior, cosmo_batch, mass_batch,
     grids, n_real, dl_fill, ext_bounds) = residuals
    ct_den, ct_stats = cotangents
    e, s = dl.shape
    # Sc must be a multiple of 128 (lane-aligned dynamic slices of the
    # (E, S) scratch); VMEM pressure is controlled by tiling the grid axis
    # inside the chunk body instead (see _adjoint_kernel).
    block_s = 128
    cos_packed, cos_def, cos_shapes = _pack_leaves(cosmo_batch)
    mass_packed, mass_def, mass_shapes = _pack_leaves(mass_batch)
    L = cos_packed[0].shape[0] if cos_packed else mass_packed[0].shape[0]
    n_grid = grids.shape[1]
    gp = _round_up(n_grid, 128)

    gpad = jnp.pad(grids, [(0, 0), (0, gp - n_grid)], mode="edge")
    cd = jnp.pad(jnp.asarray(ct_den, dl.dtype),
                 [(0, 0), (0, 0), (0, gp - n_grid)])  # zero-pad: no ct there
    # stats cotangent layout mirrors the forward's 8-slot concat
    cs = jnp.stack([
        jnp.zeros_like(ct_stats["lo"]),   # lo/ub are constants in this mode
        jnp.zeros_like(ct_stats["ub"]),
        ct_stats["norms"], ct_stats["neff"], ct_stats["bandwidth"],
        ct_stats["sum_w"], ct_stats["sum_w2"],
        jnp.zeros_like(ct_stats["lo"]),
    ], axis=-1).astype(dl.dtype)                               # (L, E, 8)

    e_blk = _BLOCK_E
    pe_spec = pl.BlockSpec((e_blk, s), lambda l, eb: (eb, 0),
                           memory_space=pltpu.VMEM)
    g_spec = pl.BlockSpec((e_blk, gp), lambda l, eb: (eb, 0),
                          memory_space=pltpu.VMEM)
    cd_spec = pl.BlockSpec((1, e_blk, gp), lambda l, eb: (l, eb, 0),
                           memory_space=pltpu.VMEM)
    cs_spec = pl.BlockSpec((1, e_blk, 8), lambda l, eb: (l, eb, 0),
                           memory_space=pltpu.VMEM)
    leaf_specs = [
        pl.BlockSpec((1, 1, p.shape[-1]), lambda l, eb: (l, 0, 0),
                     memory_space=pltpu.VMEM)
        for p in cos_packed + mass_packed
    ]
    out_shape = [jax.ShapeDtypeStruct(p.shape, dl.dtype)
                 for p in cos_packed + mass_packed]
    out_specs = [
        pl.BlockSpec((1, 1, p.shape[-1]), lambda l, eb: (l, 0, 0),
                     memory_space=pltpu.VMEM)
        for p in cos_packed + mass_packed
    ]

    kern = functools.partial(
        _adjoint_kernel, cos_def=cos_def, cos_shapes=cos_shapes,
        mass_def=mass_def, mass_shapes=mass_shapes,
        n_cos=len(cos_packed), n_mass=len(mass_packed),
        kernel=cfg.kernel, bw_method=cfg.bw_method, den_scale=cfg.den_scale,
        n_samples=s, block_s=block_s, n_grid=n_grid)

    grads = pl.pallas_call(
        kern,
        out_shape=out_shape,
        grid=(L, e // e_blk),              # lambda outer: grad blocks resident
        in_specs=[pe_spec] * 4 + [g_spec, cd_spec, cs_spec] + leaf_specs,
        out_specs=out_specs,
        scratch_shapes=[pltpu.VMEM((e_blk, s), dl.dtype)] * 4,
        interpret=cfg.interpret,
    )(m1det, m2det, dl, inv_pe_prior, gpad, cd, cs, *cos_packed,
      *mass_packed)

    n_cos = len(cos_packed)
    cos_leaves, _ = tree_flatten(cosmo_batch)
    mass_leaves, _ = tree_flatten(mass_batch)
    dcos = tree_unflatten(cos_def, [
        g.reshape(leaf.shape).astype(leaf.dtype)
        for g, leaf in zip(grads[:n_cos], cos_leaves)])
    dmass = tree_unflatten(mass_def, [
        g.reshape(leaf.shape).astype(leaf.dtype)
        for g, leaf in zip(grads[n_cos:], mass_leaves)])

    zeros = jax.tree_util.tree_map(jnp.zeros_like,
                                   (m1det, m2det, dl, inv_pe_prior))
    return (*zeros, dcos, dmass, jnp.zeros_like(grids), None, None, None)


def _pallas_impl(cfg: _FusedCfg, m1det, m2det, dl, inv_pe_prior,
                 cosmo_batch, mass_batch, grids, n_real, dl_fill,
                 ext_bounds=None):
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
    leaf_specs = [
        pl.BlockSpec((1, 1, p.shape[-1]), lambda eb, l: (l, 0, 0),
                     memory_space=pltpu.VMEM)
        for p in cos_packed + mass_packed
    ]
    out_shape = [
        jax.ShapeDtypeStruct((L, e, gp), dl.dtype),
        jax.ShapeDtypeStruct((L, e, 8), dl.dtype),
    ]
    out_specs = [
        pl.BlockSpec((1, _BLOCK_E, gp), lambda eb, l: (l, eb, 0),
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
        stats_only=cfg.stats_only)

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

    den = den[:, :, :n_grid]
    return den, {
        "lo": stats[:, :, 0], "ub": stats[:, :, 1],
        "norms": stats[:, :, 2], "neff": stats[:, :, 3],
        "bandwidth": stats[:, :, 4],
        "sum_w": stats[:, :, 5], "sum_w2": stats[:, :, 6],
    }
