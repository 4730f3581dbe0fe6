"""Diagnostic plots: pixelization sky maps and per-pixel probability curves.

Capability parity with reference CHIMERA/utils/plotting.py:7-166, rebuilt on
the framework's mask-based padded arrays (no -100 sentinel comparisons) and
the pure-JAX HEALPix ``boundaries`` (the reference needed healpy's C++
``hp.boundaries`` / ``hp.vec2ang``, utils/plotting.py:47-48).

matplotlib is imported lazily so the core library never pays for it.
"""

from __future__ import annotations

import numpy as np

from chimera_tpu.ops import healpix as hpx


def _mpl():
    import matplotlib as mpl
    import matplotlib.pyplot as plt

    return mpl, plt


def _colors(cmap):
    mpl, _ = _mpl()
    if cmap is None:
        return mpl.colormaps["tab20"].colors
    return cmap


def _event_pixels(theta_gw, ev: int):
    """Valid pixel indices / centers / nside of one event (mask applied)."""
    mask = np.asarray(theta_gw.pixel_mask[ev])
    pix = np.asarray(theta_gw.pixels_opt_nsides[ev])[mask].astype(int)
    ra_pix = np.asarray(theta_gw.ra_pix[ev])[mask]
    dec_pix = np.asarray(theta_gw.dec_pix[ev])[mask]
    nside = int(theta_gw.opt_nsides[ev])
    return pix, ra_pix, dec_pix, nside, mask


def plot_pixelization(theta_gw, ev: int, cmap=None, ax=None, figsize=(6, 4),
                      label=True, plot_grid=False, boundary_step=10):
    """Sky scatter of one event's PE samples colored by assigned pixel, with
    pixel centers and exact HEALPix pixel boundaries
    (reference plotting.py:7-61)."""
    _, plt = _mpl()
    colors = _colors(cmap)
    fig = None
    if ax is None:
        fig, ax = plt.subplots(figsize=figsize)

    pix, ra_pix, dec_pix, nside, _ = _event_pixels(theta_gw, ev)
    ra = np.asarray(theta_gw.ra[ev])
    dec = np.asarray(theta_gw.dec[ev])
    pe_pix = np.asarray(theta_gw.pixels_pe_opt_nside[ev])

    for i, jpix in enumerate(pix):
        c = colors[i % len(colors)]
        sel = pe_pix == jpix
        ax.scatter(ra[sel], dec[sel], color=c, alpha=0.25, s=50, marker="x")
        ax.scatter(ra_pix[i], dec_pix[i], s=100, marker="o", color=c,
                   edgecolor="black", linewidth=1.0)
        b_theta, b_phi = hpx.boundaries(nside, jpix, step=boundary_step)
        b_theta = np.append(np.asarray(b_theta), np.asarray(b_theta)[0])
        b_phi = np.append(np.asarray(b_phi), np.asarray(b_phi)[0])
        ax.plot(b_phi, np.pi / 2 - b_theta, lw=0.85, zorder=0, color=c)

    if plot_grid:
        ax.grid(True, alpha=0.5)
    if label:
        ax.set_xlabel("RA [rad]", fontsize=14)
        ax.set_ylabel("Dec [rad]", fontsize=14)
    return fig


def _per_pixel_curves(ax, z_grid, curves, mask, cmap, label, ylabel):
    colors = _colors(cmap)
    for i in np.flatnonzero(mask):
        ax.plot(z_grid, curves[i], color=colors[i % len(colors)], lw=1.0)
    if label:
        ax.set_xlabel("z", fontsize=14)
        ax.set_ylabel(ylabel, fontsize=14)


def plot_p_gw3d_pixelated(hl, ev: int, cmap=None, ax=None, label=True,
                          figsize=(6, 4), **hyper_params):
    """Per-pixel p_gw3d(z) curves of one event at the given hyper-parameters
    (reference plotting.py:63-102)."""
    from chimera_tpu.likelihood import (
        p_gw_3d_approximate,
        p_gw_3d_full,
        p_gw_3d_marginalized,
    )

    _, plt = _mpl()
    fig = None
    if ax is None:
        fig, ax = plt.subplots(figsize=figsize)
    pop = hl.population.update(**hyper_params)
    kind_fn = {"approximate": p_gw_3d_approximate,
               "marginalized": p_gw_3d_marginalized,
               "full": p_gw_3d_full}[hl.kind]
    p = np.asarray(kind_fn(hl, pop)[ev])            # (P, Nz)
    mask = np.asarray(hl.theta_gw.pixel_mask[ev])
    _per_pixel_curves(ax, np.asarray(hl.z_grids[ev]), p, mask, cmap, label,
                      r"$p_{\rm gw}(z,\hat\Omega)$")
    return fig


def plot_p_gal_pixelated(hl, ev: int, cmap=None, ax=None, label=True,
                         figsize=(6, 4), **hyper_params):
    """Per-pixel galaxy-prior p_gal(z) curves of one event
    (reference plotting.py:104-137)."""
    _, plt = _mpl()
    fig = None
    if ax is None:
        fig, ax = plt.subplots(figsize=figsize)
    pop = hl.population.update(**hyper_params)
    p_gal = np.asarray(
        pop.gal_cat.p_gal(pop.cosmo, hl.z_grids)[ev])   # (P, Nz)
    mask = np.asarray(hl.theta_gw.pixel_mask[ev])
    _per_pixel_curves(ax, np.asarray(hl.z_grids[ev]), p_gal, mask, cmap,
                      label, r"$p_{\rm gal}(z,\hat\Omega)$")
    return fig


def plot_p_cat_pixelated(gal_cat, z_grids, ev: int, cmap=None, ax=None,
                         label=True, figsize=(6, 4)):
    """Per-pixel precomputed catalog term p_cat(z) of one event
    (reference plotting.py:139-166)."""
    _, plt = _mpl()
    fig = None
    if ax is None:
        fig, ax = plt.subplots(figsize=figsize)
    p_cat = np.asarray(gal_cat.p_cat[ev])           # (P, Nz)
    mask = np.asarray(gal_cat.pixel_mask[ev])
    _per_pixel_curves(ax, np.asarray(z_grids[ev]), p_cat, mask, cmap, label,
                      r"$p_{\rm cat}(z,\hat\Omega)$")
    return fig
