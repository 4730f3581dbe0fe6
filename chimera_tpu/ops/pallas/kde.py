"""Pallas TPU kernel: batched weighted 1-D KDE on per-event grids.

The hyper-likelihood's hot kernel (SURVEY.md 3.1: math.py:78-81) is the
(events x grid x samples) contraction

    density[e, g] = sum_s w[e, s] * K((grid[e, g] - z[e, s]) / h[e]) / h[e].

Bandwidths are folded into the inputs outside the kernel (z' = z/h,
g' = g/h, w' = w/h), so the kernel is the pure contraction

    out[e, g] = sum_s w'[e, s] * K(g'[e, g] - z'[e, s]).

Tiling: each program owns an (8-event x 128-grid-point) output tile and
streams the sample axis in chunks; the (8, 128, Sc) kernel-evaluation tile
lives only in VMEM/registers, and the output tile accumulates across sample
chunks in f32.  The pure-XLA formulation (ops.kde.kde1d_core) leaves these
fusion decisions to the compiler; this kernel pins them.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import Array
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_SQRT_2PI = 2.5066282746310002

_BLOCK_E = 8      # events per program (sublane tile)
_BLOCK_G = 128    # grid points per program (lane tile)
_BLOCK_S = 512    # sample-chunk length streamed per grid step


def _kde_kernel(z_ref, w_ref, grid_ref, out_ref, *, kernel: str):
    s_idx = pl.program_id(2)

    @pl.when(s_idx == 0)
    def _init():
        out_ref[...] = jnp.zeros_like(out_ref)

    g = grid_ref[...]                       # (E, Gt)
    z = z_ref[...]                          # (E, Sc)
    w = w_ref[...]                          # (E, Sc)
    u = g[:, :, None] - z[:, None, :]       # (E, Gt, Sc)
    if kernel == "epan":
        k = 0.75 * jnp.maximum(0.0, 1.0 - u * u)
    else:
        k = jnp.exp(-0.5 * u * u) * (1.0 / _SQRT_2PI)
    out_ref[...] += jnp.sum(w[:, None, :] * k, axis=-1)


def _round_up(n: int, m: int) -> int:
    return -(-n // m) * m


def _pad2(x: Array, rows: int, cols: int, value: float = 0.0) -> Array:
    b, n = x.shape
    if rows == b and cols == n:
        return x
    return jnp.pad(x, [(0, rows - b), (0, cols - n)], constant_values=value)


@functools.partial(jax.jit, static_argnames=("kernel", "interpret"))
def kde1d_grid(
    z: Array,
    weights: Array,
    grids: Array,
    bandwidths: Array,
    kernel: str = "epan",
    interpret: bool = False,
) -> Array:
    """Batched KDE: z (B, S) samples, weights (B, S) *normalized* weights,
    grids (B, G) evaluation points, bandwidths (B,) -> (B, G) densities.

    The batch axis is events (or events x pixels, flattened).  All axes are
    padded internally to TPU tile multiples; padding samples carry zero
    weight, padding events/grid points are sliced off the output.
    """
    b, s = z.shape
    g = grids.shape[1]

    # Fold bandwidths into the operands: K((g - z)/h)/h = K(g' - z') * (w/h).
    inv_h = 1.0 / bandwidths[:, None]
    z = z * inv_h
    grids = grids * inv_h
    weights = weights * inv_h

    bp = _round_up(b, _BLOCK_E)
    sp = _round_up(s, min(_BLOCK_S, _round_up(s, 128)))
    gp = _round_up(g, _BLOCK_G)
    block_s = min(_BLOCK_S, sp)

    z = _pad2(z, bp, sp)
    weights = _pad2(weights, bp, sp)       # zero weight: no contribution
    grids = _pad2(grids, bp, gp)

    grid_dims = (bp // _BLOCK_E, gp // _BLOCK_G, sp // block_s)
    out = pl.pallas_call(
        functools.partial(_kde_kernel, kernel=kernel),
        out_shape=jax.ShapeDtypeStruct((bp, gp), z.dtype),
        grid=grid_dims,
        in_specs=[
            pl.BlockSpec((_BLOCK_E, block_s), lambda e, j, si: (e, si),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_BLOCK_E, block_s), lambda e, j, si: (e, si),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_BLOCK_E, _BLOCK_G), lambda e, j, si: (e, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_BLOCK_E, _BLOCK_G), lambda e, j, si: (e, j),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(z, weights, grids)
    return out[:b, :g]
