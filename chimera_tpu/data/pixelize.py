"""GW-catalog pixelization: confidence-region pixel sets, optimal nside
selection, per-pixel sky-localization pdfs.

Capability parity with CHIMERA/data.py:239-392 (``pixelize_gw_catalog``,
``compute_sky_conf_event``) rebuilt on the pure-JAX HEALPix — no healpy.
This is a run-once precompute (regime 1 of SURVEY.md 1): the per-sample
pixel indexing and the 2-D KDEs run vectorized on-device; the ragged
confidence-set bookkeeping stays host-side numpy and is amortized.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from chimera_tpu.config import logger
from chimera_tpu.data.structs import PAD_VALUE, ThetaPEDet
from chimera_tpu.ops import healpix as hpx
from chimera_tpu.ops.kde import gaussian_kde_nd


def confidence_pixels(pix_samples: np.ndarray, sky_conf: float,
                      nside: int) -> np.ndarray:
    """Pixels covering ``sky_conf`` of an event's sky probability.

    Reference data.py:239-260: empirical per-pixel probability from PE-sample
    counts; keep every pixel whose probability is >= the smallest value whose
    descending cumulative sum reaches sky_conf."""
    unique, counts = np.unique(np.asarray(pix_samples), return_counts=True)
    p = counts / pix_samples.shape[0]
    order = np.argsort(p)[::-1]
    cum = np.cumsum(p[order])
    thr = p[order][np.searchsorted(cum, sky_conf)]
    return unique[p >= thr]


def pixelize_gw_catalog(
    theta_gw: ThetaPEDet,
    nside_list: list[int],
    mean_npixels_event: int,
    sky_conf: float = 0.9,
    nest: bool = False,
) -> ThetaPEDet:
    """Attach pixelation metadata to a PE catalog.

    Per event: choose the nside whose confidence region has closest to
    ``mean_npixels_event`` pixels; record the pixel set, centers, per-pixel
    2-D localization pdf, and each PE sample's pixel (samples outside the
    confidence region snap to the nearest confidence pixel — data.py:319-340).
    Ragged pixel sets are padded with an explicit mask.
    """
    ra = np.asarray(theta_gw.ra)
    dec = np.asarray(theta_gw.dec)
    n_events = ra.shape[0]

    # Pixel index of every PE sample at every candidate nside (on-device).
    pix_all: dict[int, np.ndarray] = {}
    for nside in nside_list:
        logger.info(f"pixelizing at nside={nside} (nest={nest})")
        pix_all[nside] = np.asarray(
            hpx.find_pix_ra_dec(theta_gw.ra, theta_gw.dec, nside, nest=nest))

    # Optimal nside per event.
    counts = np.array([
        [confidence_pixels(pix_all[ns][e], sky_conf, ns).size
         for ns in nside_list]
        for e in range(n_events)
    ])
    best = np.argmin(np.abs(counts - mean_npixels_event), axis=1)
    opt_nsides = np.asarray(nside_list)[best]
    logger.info(f"optimal nsides: {dict(zip(*np.unique(opt_nsides, return_counts=True)))}")

    event_pixels = [confidence_pixels(pix_all[opt_nsides[e]][e], sky_conf,
                                      opt_nsides[e])
                    for e in range(n_events)]
    max_npix = max(len(p) for p in event_pixels)

    pix_padded = np.full((n_events, max_npix), PAD_VALUE)
    ra_pix = np.full((n_events, max_npix), PAD_VALUE)
    dec_pix = np.full((n_events, max_npix), PAD_VALUE)
    loc_pdf = np.full((n_events, max_npix), PAD_VALUE)
    mask = np.zeros((n_events, max_npix), dtype=bool)
    pe_pix = np.zeros_like(ra, dtype=np.int64)

    for e in range(n_events):
        pix_e = event_pixels[e]
        k = len(pix_e)
        nside = int(opt_nsides[e])
        r_c, d_c = hpx.find_ra_dec(jnp.asarray(pix_e), nside, nest=nest)
        r_c, d_c = np.asarray(r_c), np.asarray(d_c)
        pix_padded[e, :k] = pix_e
        ra_pix[e, :k] = r_c
        dec_pix[e, :k] = d_c
        mask[e, :k] = True

        # Assign PE samples: in-region samples keep their pixel; others snap
        # to the angularly nearest confidence pixel.
        samp_pix = pix_all[nside][e]
        inside = np.isin(samp_pix, pix_e)
        sep = np.asarray(hpx.angular_separation(
            jnp.asarray(ra[e][:, None]), jnp.asarray(dec[e][:, None]),
            jnp.asarray(r_c[None, :]), jnp.asarray(d_c[None, :])))
        nearest = pix_e[np.argmin(sep, axis=1)]
        pe_pix[e] = np.where(inside, samp_pix, nearest)

        # Per-pixel 2-D localization pdf (data.py:342-345).
        dataset = jnp.asarray(np.stack([ra[e], dec[e]]))
        centers = jnp.asarray(np.stack([r_c, d_c]))
        loc_pdf[e, :k] = np.asarray(gaussian_kde_nd(dataset, centers))

    return theta_gw.update(
        opt_nsides=jnp.asarray(opt_nsides),
        pixels_opt_nsides=jnp.asarray(pix_padded),
        ra_pix=jnp.asarray(ra_pix),
        dec_pix=jnp.asarray(dec_pix),
        gw_loc2d_pdf=jnp.asarray(loc_pdf),
        pixels_pe_opt_nside=jnp.asarray(pe_pix),
        pixel_mask=jnp.asarray(mask),
    )


def compact_samples_by_pixel(theta_gw: ThetaPEDet, pad_multiple: int = 128
                             ) -> dict:
    """Regroup each event's PE samples by their assigned pixel.

    The pixelization snaps every sample into exactly one confidence pixel
    (pixels *partition* the sample axis), so the per-pixel masked KDE of the
    'marginalized' likelihood (reference likelihood.py:178-203) can run on
    per-pixel contiguous sample blocks instead of P redundant full-S masked
    passes — this is what makes the fused dark-siren kernel ~P times cheaper.

    Returns a dict of lambda-independent arrays:
      m1det, m2det, dL, inv_pe_prior: (Nev, P, S_pp) — padded slots carry
        dL = event's min dL (so their z equals the reference's z.min()
        filler under every cosmology) and inv_pe_prior = 0 (zero weight);
      n_real: (Nev, P) sample count per pixel;
      dl_fill: (Nev,) the filler distance.
    S_pp is the max per-pixel occupancy rounded up to ``pad_multiple``.
    """
    pe_pix = np.asarray(theta_gw.pixels_pe_opt_nside)     # (E, S)
    pixels = np.asarray(theta_gw.pixels_opt_nsides)       # (E, P)
    pmask = np.asarray(theta_gw.pixel_mask)
    m1 = np.asarray(theta_gw.m1det)
    m2 = np.asarray(theta_gw.m2det)
    dl = np.asarray(theta_gw.dL)
    inv_prior = 1.0 / np.asarray(theta_gw.pe_prior)
    n_ev, n_pix = pixels.shape

    counts = np.zeros((n_ev, n_pix), dtype=np.int64)
    idx_lists = []
    for e in range(n_ev):
        row = []
        for p in range(n_pix):
            if pmask[e, p]:
                idx = np.flatnonzero(pe_pix[e] == pixels[e, p])
            else:
                idx = np.empty(0, dtype=np.int64)
            counts[e, p] = idx.size
            row.append(idx)
        idx_lists.append(row)

    s_pp = int(-(-max(1, counts.max()) // pad_multiple) * pad_multiple)
    dl_fill = dl.min(axis=1)
    out = {
        "m1det": np.zeros((n_ev, n_pix, s_pp), m1.dtype),
        "m2det": np.zeros((n_ev, n_pix, s_pp), m2.dtype),
        "dL": np.repeat(dl_fill[:, None, None], n_pix, 1).repeat(s_pp, 2),
        "inv_pe_prior": np.zeros((n_ev, n_pix, s_pp), inv_prior.dtype),
    }
    # filler masses: any in-support value (weights are zero); use the
    # event's first sample so the kernel math stays finite
    out["m1det"][:] = m1[:, :1, None]
    out["m2det"][:] = m2[:, :1, None]
    for e in range(n_ev):
        for p in range(n_pix):
            idx = idx_lists[e][p]
            k = idx.size
            out["m1det"][e, p, :k] = m1[e, idx]
            out["m2det"][e, p, :k] = m2[e, idx]
            out["dL"][e, p, :k] = dl[e, idx]
            out["inv_pe_prior"][e, p, :k] = inv_prior[e, idx]

    return {
        "m1det": jnp.asarray(out["m1det"]),
        "m2det": jnp.asarray(out["m2det"]),
        "dL": jnp.asarray(out["dL"]),
        "inv_pe_prior": jnp.asarray(out["inv_pe_prior"]),
        "n_real": jnp.asarray(counts),
        "dl_fill": jnp.asarray(dl_fill),
    }
