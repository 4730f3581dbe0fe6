"""Diagnostic plots (reference CHIMERA/utils/plotting.py:7-166).

matplotlib is an optional dependency: every function imports it lazily and
raises a clear error if unavailable.  Sky plots draw pixel centers (the
reference drew healpy pixel boundaries; boundary polygons are plot-only and
deliberately out of the compute path).
"""

from __future__ import annotations

import numpy as np


def _plt():
    try:
        import matplotlib.pyplot as plt
        return plt
    except ImportError as e:  # pragma: no cover
        raise ImportError("plotting requires matplotlib") from e


def plot_pixelization(theta_gw, event: int, ax=None):
    """PE sample cloud + selected confidence pixels for one event."""
    plt = _plt()
    if ax is None:
        _, ax = plt.subplots()
    ra = np.asarray(theta_gw.ra[event])
    dec = np.asarray(theta_gw.dec[event])
    m = np.asarray(theta_gw.pixel_mask[event])
    ax.scatter(ra, dec, s=2, alpha=0.3, label="PE samples")
    ax.scatter(np.asarray(theta_gw.ra_pix[event])[m],
               np.asarray(theta_gw.dec_pix[event])[m],
               marker="x", c="r", label="pixel centers")
    ax.set_xlabel("RA [rad]")
    ax.set_ylabel("Dec [rad]")
    ax.legend()
    return ax


def plot_p_gw3d_pixelated(hl, hyper: dict, event: int, ax=None):
    """Per-pixel p_gw(z) curves for one event (plotting.py:63-102)."""
    plt = _plt()
    from chimera_tpu.likelihood import _P_GW_3D

    if ax is None:
        _, ax = plt.subplots()
    pop = hl.population.update(**hyper)
    p = np.asarray(_P_GW_3D[hl.kind](hl, pop))[event]
    zg = np.asarray(hl.z_grids[event])
    mask = np.asarray(hl.theta_gw.pixel_mask[event])
    for i in np.nonzero(mask)[0]:
        ax.plot(zg, p[i], lw=0.8)
    ax.set_xlabel("z")
    ax.set_ylabel("p_gw(z, pix)")
    return ax


def plot_p_gal_pixelated(hl, hyper: dict, event: int, ax=None):
    """Per-pixel p_gal(z) curves for one event (plotting.py:104-137)."""
    plt = _plt()
    if ax is None:
        _, ax = plt.subplots()
    pop = hl.population.update(**hyper)
    p = np.asarray(pop.gal_cat.p_gal(pop.cosmo, hl.z_grids))[event]
    zg = np.asarray(hl.z_grids[event])
    mask = np.asarray(hl.theta_gw.pixel_mask[event])
    for i in np.nonzero(mask)[0]:
        ax.plot(zg, p[i], lw=0.8)
    ax.set_xlabel("z")
    ax.set_ylabel("p_gal(z, pix)")
    return ax


def plot_p_cat_pixelated(gal_cat, z_grids, event: int, ax=None):
    """Precomputed p_cat(z) per pixel (plotting.py:139-166)."""
    plt = _plt()
    if ax is None:
        _, ax = plt.subplots()
    p = np.asarray(gal_cat.p_cat)[event]
    zg = np.asarray(z_grids[event])
    mask = np.asarray(gal_cat.pixel_mask[event])
    for i in np.nonzero(mask)[0]:
        ax.plot(zg, p[i], lw=0.8)
    ax.set_xlabel("z")
    ax.set_ylabel("p_cat(z, pix)")
    return ax


def plot_h0_scan(hl, h0_grid, ax=None, normalize=True):
    """1-D H0 posterior scan (the reference notebooks' headline figure)."""
    plt = _plt()
    if ax is None:
        _, ax = plt.subplots()
    import jax.numpy as jnp

    logl = np.asarray(hl.log_like_batch({"H0": jnp.asarray(h0_grid)}))
    if normalize:
        logl = logl - logl.max()
        post = np.exp(logl)
        post /= np.trapezoid(post, np.asarray(h0_grid))
        ax.plot(np.asarray(h0_grid), post)
        ax.set_ylabel("p(H0 | d)")
    else:
        ax.plot(np.asarray(h0_grid), logl)
        ax.set_ylabel("log L(H0)")
    ax.set_xlabel("H0 [km/s/Mpc]")
    return ax
