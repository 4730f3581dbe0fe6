"""Pallas TPU kernel: batched weighted 1-D KDE on per-event grids.

The hyper-likelihood's hot kernel (SURVEY.md 3.1: math.py:78-81) is the
(events x grid x samples) contraction

    density[e, g] = sum_s w[e, s] * K((grid[e, g] - z[e, s]) / h[e]) / h[e].

The pure-XLA formulation materializes its fusion decisions opaquely; this
kernel pins the tiling: one event per program, a G-tile of the grid resident
in VMEM, samples streamed in S-chunks, accumulation in f32 registers.  The
(Gt, S) kernel-evaluation tile never touches HBM.

Numerically identical to ops.kde.kde1d's core (same kernels, same order of
operations up to the reduction tree).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import Array
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_SQRT_2PI = 2.5066282746310002


def _kde_kernel(z_ref, w_ref, grid_ref, h_ref, out_ref, *, kernel: str):
    g = grid_ref[0, :]          # (Gt,)
    z = z_ref[0, :]             # (S,)
    w = w_ref[0, :]             # (S,)
    h = h_ref[0, 0]
    inv_h = 1.0 / h
    u = (g[:, None] - z[None, :]) * inv_h          # (Gt, S)
    if kernel == "epan":
        k = 0.75 * jnp.maximum(0.0, 1.0 - u * u)
    else:
        k = jnp.exp(-0.5 * u * u) * (1.0 / _SQRT_2PI)
    out_ref[0, :] = jnp.sum(w[None, :] * k, axis=-1) * inv_h


def _round_up(n: int, m: int) -> int:
    return -(-n // m) * m


@functools.partial(jax.jit, static_argnames=("kernel", "block_g", "interpret"))
def kde1d_grid(
    z: Array,
    weights: Array,
    grids: Array,
    bandwidths: Array,
    kernel: str = "epan",
    block_g: int = 128,
    interpret: bool = False,
) -> Array:
    """Batched KDE: z (B, S) samples, weights (B, S) *normalized* weights,
    grids (B, G) evaluation points, bandwidths (B,) -> (B, G) densities.

    The batch axis is events (or events x pixels, flattened).  S and G are
    padded internally to lane multiples; padding samples carry zero weight.
    """
    b, s = z.shape
    g = grids.shape[1]
    s_pad = _round_up(s, 128)
    if s_pad != s:
        pad = [(0, 0), (0, s_pad - s)]
        z = jnp.pad(z, pad)
        weights = jnp.pad(weights, pad)  # zero weight: no contribution
    out_shape = jax.ShapeDtypeStruct((b, g), z.dtype)
    grid_dims = (b, pl.cdiv(g, block_g))

    return pl.pallas_call(
        functools.partial(_kde_kernel, kernel=kernel),
        out_shape=out_shape,
        grid=grid_dims,
        in_specs=[
            pl.BlockSpec((1, s_pad), lambda e, j: (e, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s_pad), lambda e, j: (e, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_g), lambda e, j: (e, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda e, j: (e, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, block_g), lambda e, j: (e, j),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(z, weights, grids, bandwidths[:, None])
