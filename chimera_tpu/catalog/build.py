"""Offline pixelated-catalog precompute: galaxies -> per-(event, pixel)
redshift priors p_cat(z).

Capability parity with CHIMERA/catalog/catalog.py:51-231 (init +
``precompute_p_cat`` + the ``_sum_gaussians_*`` kernels), rebuilt on the
pure-JAX HEALPix.  Run-once host-side precompute (regime 1); the hot-path
consumer is chimera_tpu.catalog.pixelated.PixelatedCatalog.

p_cat is computed at the *fiducial* cosmology (same approximation as the
reference, catalog.py:219): per galaxy, a Gaussian N(z; z_gal, z_err) times
dV_C/dz (or an arbitrary p_bkg), normalized on the event's z-grid, then
weight-averaged over the galaxies in each (event, pixel) voxel.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from chimera_tpu.catalog.pixelated import PixelatedCatalog
from chimera_tpu.config import logger
from chimera_tpu.data.structs import ThetaPEDet
from chimera_tpu.models import cosmology as cosmo_fns
from chimera_tpu.ops import healpix as hpx
from chimera_tpu.ops.integrate import trapz


def _sum_gaussians(z_grid: np.ndarray, mu: np.ndarray, sigma: np.ndarray,
                   weights: np.ndarray, bkg_grid: np.ndarray) -> np.ndarray:
    """Weighted, per-galaxy-normalized sum of Gaussians x background prior on
    the grid (catalog.py:209-231)."""
    if mu.size == 0:
        return np.zeros_like(z_grid)
    g = (np.power(2 * np.pi * sigma[None, :] ** 2, -0.5)
         * np.exp(-0.5 * ((z_grid[:, None] - mu[None, :]) / sigma[None, :]) ** 2))
    g = g * bkg_grid[:, None]
    norm = np.trapezoid(g, z_grid, axis=0)
    norm = np.where(norm > 0, norm, 1.0)
    return (g / norm) @ weights / weights.sum()


def _voxel_galaxy_csr(gal_pix: dict, opt_nsides: np.ndarray,
                      pix_sets: np.ndarray, pixel_mask: np.ndarray
                      ) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized galaxy -> (event, pixel) voxel assignment.

    For every valid (event, pixel) pair, the galaxies whose HEALPix index
    (at the event's nside) equals that pixel — as two flat arrays
    ``(gal_idx, seg)`` where ``seg = e * max_npix + j``.  One argsort +
    two searchsorted per distinct nside replace the reference's per-event
    ``np.isin`` scans (catalog.py:137-139): O(G log G + E P log G) instead
    of O(E G).  A galaxy lands in at most one voxel per event (its pixel
    is unique and an event's confidence pixels are distinct)."""
    nev, max_npix = pix_sets.shape
    gal_parts, seg_parts = [], []
    for ns in np.unique(opt_nsides):
        ev_sel = np.nonzero(opt_nsides == ns)[0]
        gp = gal_pix[int(ns)]
        order = np.argsort(gp, kind="stable")
        sorted_pix = gp[order]
        pix = pix_sets[ev_sel]                                   # (Ei, P)
        starts = np.searchsorted(sorted_pix, pix, side="left")
        ends = np.searchsorted(sorted_pix, pix, side="right")
        lens = np.where(pixel_mask[ev_sel], ends - starts, 0).ravel()
        total = int(lens.sum())
        if total == 0:
            continue
        offs = np.cumsum(lens) - lens
        # position within the concatenated ragged ranges -> sorted-pix index
        pos = (np.arange(total) - np.repeat(offs, lens)
               + np.repeat(starts.ravel(), lens))
        ep = (ev_sel[:, None] * max_npix + np.arange(max_npix)[None, :])
        gal_parts.append(order[pos])
        seg_parts.append(np.repeat(ep.ravel(), lens))
    if not gal_parts:
        return (np.zeros(0, np.int64),) * 2
    return np.concatenate(gal_parts), np.concatenate(seg_parts)


@partial(jax.jit, static_argnames=("nev", "max_npix", "chunk"))
def _p_cat_segments(mu, sig, w, seg, valid, z_grids, bkg_grids, *, nev,
                    max_npix, chunk):
    """On-device p_cat accumulation over fixed-size galaxy chunks.

    The per-galaxy work of catalog.py:209-231 — Gaussian N(z; mu, sig) x
    background prior on the event's grid, trapz-normalized, weighted — runs
    as a ``lax.scan`` over (chunk,)-galaxy blocks with scatter-adds into the
    (E*P, Nz) voxel accumulator: static shapes, no host round-trips, and the
    (G, Nz) Gaussian table never materializes beyond one chunk."""
    nz = z_grids.shape[1]
    n_chunks = mu.shape[0] // chunk
    xs = tuple(a.reshape(n_chunks, chunk) for a in (mu, sig, w, seg, valid))

    def step(carry, x):
        acc_p, acc_w, acc_n = carry
        mu_c, sig_c, w_c, seg_c, valid_c = x
        e = seg_c // max_npix
        zg = z_grids[e]                                          # (c, Nz)
        in_z = (mu_c > zg[:, 0]) & (mu_c < zg[:, -1]) & valid_c
        w_eff = jnp.where(in_z, w_c, 0.0)
        g = (jnp.exp(-0.5 * jnp.square((zg - mu_c[:, None]) / sig_c[:, None]))
             / jnp.sqrt(2.0 * jnp.pi * jnp.square(sig_c[:, None])))
        g = g * bkg_grids[e]
        norm = trapz(g, zg, axis=1)
        g = g / jnp.where(norm > 0, norm, 1.0)[:, None]
        acc_p = acc_p.at[seg_c].add(w_eff[:, None] * g)
        acc_w = acc_w.at[seg_c].add(w_eff)
        acc_n = acc_n.at[e].add(in_z.astype(jnp.int32))
        return (acc_p, acc_w, acc_n), None

    init = (jnp.zeros((nev * max_npix, nz), z_grids.dtype),
            jnp.zeros(nev * max_npix, z_grids.dtype),
            jnp.zeros(nev, jnp.int32))
    (acc_p, acc_w, acc_n), _ = jax.lax.scan(step, init, xs)
    p_cat = acc_p / jnp.where(acc_w > 0, acc_w, 1.0)[:, None]
    p_cat = jnp.where(jnp.isfinite(p_cat), p_cat, 0.0)
    return p_cat.reshape(nev, max_npix, nz), acc_n


def build_pixelated_catalog(
    galaxies: dict,
    theta_gw: ThetaPEDet,
    z_grids,
    cosmo,
    completeness,
    z_err: float = 0.01,
    weights: np.ndarray | None = None,
    sumgauss: str = "dVdz",
    nest: bool = False,
    mask: np.ndarray | None = None,
    z_reshuffle_seed: int | None = None,
    out_file: str | None = None,
    engine: str = "device",
) -> PixelatedCatalog:
    """Precompute the pixelated catalog prior for a pixelized GW catalog.

    Args:
      galaxies: {'ra', 'dec', 'z'} in radians (chimera_tpu.data.io loader).
      theta_gw: pixelized PE catalog (chimera_tpu.data.pixelize).
      z_grids: (Nev, Nz) analysis grids.
      cosmo: fiducial cosmology for the dV_C/dz factor inside p_cat.
      completeness: completeness model providing P_compl / fR / p_bkg.
      z_err: per-galaxy redshift sigma as a fraction of (1 + z)
             (catalog.py:115).
      sumgauss: 'dVdz' or 'pbkg' — which prior multiplies the Gaussians.
      mask: optional boolean galaxy subselection (catalog.py:120-123).
      z_reshuffle_seed: if set, resample each galaxy's z from
        N(z, z_err (1+z)) — the reference's mock-scatter option
        (catalog.py:124-127), but seeded.
      out_file: optional HDF5 path to persist the precomputed state
        (reload with ``load_pixelated_catalog`` and skip this precompute).
      engine: 'device' (default) runs the per-galaxy Gaussian sums as a
        jitted on-device scan over galaxy chunks (SURVEY 7.2-7: no
        per-(event, pixel) host loop — at 1000 events x 1.6M galaxies the
        host loop is minutes, the scan is seconds); 'host' keeps the
        loop-free-of-jit numpy path (the independent oracle the device
        engine is tested against).
    """
    if engine not in ("device", "host"):
        raise ValueError("engine must be 'device' or 'host'")
    ra = np.asarray(galaxies["ra"])
    dec = np.asarray(galaxies["dec"])
    z = np.asarray(galaxies["z"])
    w = np.ones_like(z) if weights is None else np.asarray(weights)
    if mask is not None:
        ra, dec, z, w = (a[np.asarray(mask)] for a in (ra, dec, z, w))
    sig = z_err * (1.0 + z)
    if z_reshuffle_seed is not None:
        rng = np.random.default_rng(z_reshuffle_seed)
        z = rng.normal(z, sig)
        sig = z_err * (1.0 + z)

    z_grids_np = np.asarray(z_grids)
    nev, nz = z_grids_np.shape
    pix_sets = np.asarray(theta_gw.pixels_opt_nsides)
    pixel_mask = np.asarray(theta_gw.pixel_mask)
    opt_nsides = np.asarray(theta_gw.opt_nsides)
    max_npix = pix_sets.shape[1]

    # Galaxy pixel tables for every distinct event nside (catalog.py:129-134).
    gal_pix: dict[int, np.ndarray] = {}
    for ns in np.unique(opt_nsides):
        logger.info(f"indexing {z.size} galaxies at nside={ns}")
        gal_pix[int(ns)] = np.asarray(
            hpx.find_pix_ra_dec(jnp.asarray(ra), jnp.asarray(dec), int(ns),
                                nest=nest))

    p_cat = np.zeros((nev, max_npix, nz))
    n_gal = np.zeros(nev, dtype=np.int64)

    if sumgauss not in ("dVdz", "pbkg"):
        raise ValueError("sumgauss must be 'dVdz' or 'pbkg'")

    # Prior factor on the grids (reference catalog.py:219, 229) — ONE
    # batched device call for all events.  A per-event call inside the loop
    # costs a device dispatch each; on a remote/tunneled TPU backend that is
    # ~0.3 s of round-trip latency per event (measured: 321 s of the
    # 1000-event precompute was this loop's dispatches).
    if sumgauss == "dVdz":
        bkg_grids = np.asarray(cosmo_fns.differential_comoving_volume(
            cosmo, jnp.asarray(z_grids_np)))
    else:
        bkg_grids = np.asarray(completeness.p_bkg(cosmo,
                                                  jnp.asarray(z_grids_np)))

    if engine == "device":
        gal_idx, seg = _voxel_galaxy_csr(gal_pix, opt_nsides, pix_sets,
                                         pixel_mask)
        chunk = 4096
        total = gal_idx.size
        # pad to whole chunks, bucketed to limit jit cache entries
        n_chunks = max(1, -(-total // chunk))
        n_chunks = 1 << (n_chunks - 1).bit_length()
        padded = n_chunks * chunk
        pad = padded - total
        logger.info(f"device p_cat: {total} voxel galaxies in "
                    f"{n_chunks} x {chunk} chunks")
        mu_s = np.concatenate([z[gal_idx], np.zeros(pad)])
        sig_s = np.concatenate([sig[gal_idx], np.ones(pad)])
        w_s = np.concatenate([w[gal_idx], np.zeros(pad)])
        seg_s = np.concatenate([seg, np.zeros(pad, np.int64)])
        valid_s = np.concatenate([np.ones(total, bool), np.zeros(pad, bool)])
        p_cat_d, n_gal_d = _p_cat_segments(
            jnp.asarray(mu_s), jnp.asarray(sig_s), jnp.asarray(w_s),
            jnp.asarray(seg_s), jnp.asarray(valid_s),
            jnp.asarray(z_grids_np), jnp.asarray(bkg_grids),
            nev=nev, max_npix=max_npix, chunk=chunk)
        p_cat = np.asarray(p_cat_d)
        n_gal = np.asarray(n_gal_d, dtype=np.int64)
    else:
        for e in range(nev):
            ns = int(opt_nsides[e])
            zg = z_grids_np[e]
            good = pix_sets[e][pixel_mask[e]].astype(np.int64)
            in_vox = np.isin(gal_pix[ns], good) & (z > zg[0]) & (z < zg[-1])
            idx = np.nonzero(in_vox)[0]
            gp = gal_pix[ns][idx]
            bkg_grid = bkg_grids[e]
            for j, p in enumerate(good):
                sel = gp == p
                if sel.sum() == 0:
                    continue
                p_cat[e, j] = _sum_gaussians(zg, z[idx][sel], sig[idx][sel],
                                             w[idx][sel], bkg_grid)
            n_gal[e] = int(in_vox.sum())
            p_cat[e][~np.isfinite(p_cat[e])] = 0.0

    P_compl = np.asarray(completeness.P_compl(jnp.asarray(z_grids_np)))[:, None, :]
    cat = PixelatedCatalog(
        p_cat=jnp.asarray(p_cat),
        P_compl=jnp.asarray(P_compl),
        pixel_mask=jnp.asarray(pixel_mask),
        n_gal=jnp.asarray(n_gal),
        completeness=completeness,
    )
    if out_file is not None:
        save_pixelated_catalog(out_file, cat)
    return cat


_CAT_FIELDS = ("p_cat", "P_compl", "pixel_mask", "n_gal")


def save_pixelated_catalog(fname: str, cat: PixelatedCatalog) -> None:
    """Persist the precomputed catalog state (the reference's save_set use,
    catalog.py:96-103); the completeness model is reattached at load."""
    import h5py

    with h5py.File(fname, "w") as f:
        for k in _CAT_FIELDS:
            f.create_dataset(k, data=np.asarray(getattr(cat, k)))


def load_pixelated_catalog(fname: str, completeness) -> PixelatedCatalog:
    """Reload a precomputed catalog, skipping the precompute entirely
    (the reference's gal_cat_file path, catalog.py:101-103, 140-141)."""
    import h5py

    with h5py.File(fname, "r") as f:
        arrs = {k: jnp.asarray(f[k][...]) for k in _CAT_FIELDS}
    arrs["pixel_mask"] = arrs["pixel_mask"].astype(bool)
    return PixelatedCatalog(completeness=completeness, **arrs)
