"""GW-catalog pixelization: confidence-region pixel sets, optimal nside
selection, per-pixel sky-localization pdfs.

Capability parity with CHIMERA/data.py:239-392 (``pixelize_gw_catalog``,
``compute_sky_conf_event``) rebuilt on the pure-JAX HEALPix — no healpy.
This is a run-once precompute (regime 1 of SURVEY.md 1): the per-sample
pixel indexing and the 2-D KDEs run vectorized on-device; the ragged
confidence-set bookkeeping stays host-side numpy and is amortized.
"""

from __future__ import annotations

import jax
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

    Device work is batched across events (one ang2pix call per nside, one
    separation call, one vmapped 2-D KDE call) — the reference's per-event
    Python/healpy loops (data.py:286-345) would cost a device round-trip and
    a recompile per distinct pixel count, minutes of setup at 1000 events.
    Only the ragged confidence-set bookkeeping stays host-side numpy.
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
    # Pad the pixel axis to a multiple of 8: masked slots are exact no-ops
    # everywhere, and (8, 128)-tiled row layouts (the fused kernel's
    # contract mode) need P % 8 == 0.
    max_npix = -(-max(len(p) for p in event_pixels) // 8) * 8

    pix_padded = np.full((n_events, max_npix), PAD_VALUE)
    mask = np.zeros((n_events, max_npix), dtype=bool)
    for e, pix_e in enumerate(event_pixels):
        pix_padded[e, :len(pix_e)] = pix_e
        mask[e, :len(pix_e)] = True

    # Pixel centers: one batched pix2ang call per distinct nside (padded
    # slots clamped to pixel 0, masked after).
    pix_clamped = np.where(mask, pix_padded, 0)
    ra_pix = np.full((n_events, max_npix), float(PAD_VALUE))
    dec_pix = np.full((n_events, max_npix), float(PAD_VALUE))
    for ns in np.unique(opt_nsides):
        sel = opt_nsides == ns
        r_c, d_c = hpx.find_ra_dec(jnp.asarray(pix_clamped[sel].ravel()),
                                   int(ns), nest=nest)
        ra_pix[sel] = np.asarray(r_c).reshape(-1, max_npix)
        dec_pix[sel] = np.asarray(d_c).reshape(-1, max_npix)
    ra_c = np.where(mask, ra_pix, 0.0)
    dec_c = np.where(mask, dec_pix, 0.0)
    ra_pix[~mask] = PAD_VALUE
    dec_pix[~mask] = PAD_VALUE

    # Assign PE samples: in-region samples keep their pixel; others snap to
    # the angularly nearest confidence pixel.  One batched separation call.
    samp_pix = np.stack([pix_all[int(opt_nsides[e])][e]
                         for e in range(n_events)])              # (E, S)
    eq = samp_pix[:, None, :] == pix_padded[:, :, None]          # (E, P, S)
    inside = eq.any(axis=1)
    sep = np.asarray(hpx.angular_separation(
        jnp.asarray(ra[:, :, None]), jnp.asarray(dec[:, :, None]),
        jnp.asarray(ra_c[:, None, :]), jnp.asarray(dec_c[:, None, :])))
    sep = np.where(mask[:, None, :], sep, np.inf)                # (E, S, P)
    nearest = np.take_along_axis(pix_padded, np.argmin(sep, axis=2), axis=1)
    pe_pix = np.where(inside, samp_pix, nearest)

    # Per-pixel 2-D localization pdf (data.py:342-345), vmapped over events.
    dataset = jnp.asarray(np.stack([ra, dec], axis=1))           # (E, 2, S)
    centers = jnp.asarray(np.stack([ra_c, dec_c], axis=1))       # (E, 2, P)
    loc = np.asarray(jax.jit(jax.vmap(gaussian_kde_nd))(dataset, centers))
    loc_pdf = np.where(mask, loc, float(PAD_VALUE))

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
    m1 = np.asarray(theta_gw.m1det)
    m2 = np.asarray(theta_gw.m2det)
    dl = np.asarray(theta_gw.dL)
    inv_prior = 1.0 / np.asarray(theta_gw.pe_prior)
    n_ev, n_pix = pixels.shape
    n_s = pe_pix.shape[1]

    # Vectorized grouping (the per-(event, pixel) flatnonzero loop is
    # O(E*P*S) Python — minutes at 1000 events): match each sample to its
    # pixel's index j in the event's pixel list, stable-sort by j, and
    # scatter by (j, rank-within-pixel).
    eq = pixels[:, :, None] == pe_pix[:, None, :]         # (E, P, S)
    assert bool(eq.any(axis=1).all()), \
        "every PE sample must map to a confidence pixel (run pixelize first)"
    j_of = np.argmax(eq, axis=1)                          # (E, S)
    counts = eq.sum(axis=2, dtype=np.int64)               # (E, P)
    order = np.argsort(j_of, axis=1, kind="stable")
    j_sorted = np.take_along_axis(j_of, order, axis=1)
    starts = np.concatenate(
        [np.zeros((n_ev, 1), np.int64), np.cumsum(counts, axis=1)[:, :-1]],
        axis=1)
    rank = np.arange(n_s)[None, :] - np.take_along_axis(starts, j_sorted,
                                                        axis=1)

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
    e_idx = np.arange(n_ev)[:, None]
    for name, src in (("m1det", m1), ("m2det", m2), ("dL", dl),
                      ("inv_pe_prior", inv_prior)):
        out[name][e_idx, j_sorted, rank] = np.take_along_axis(src, order,
                                                              axis=1)

    return {
        "m1det": jnp.asarray(out["m1det"]),
        "m2det": jnp.asarray(out["m2det"]),
        "dL": jnp.asarray(out["dL"]),
        "inv_pe_prior": jnp.asarray(out["inv_pe_prior"]),
        "n_real": jnp.asarray(counts),
        "dl_fill": jnp.asarray(dl_fill),
    }


def chunk_rows_from_compact(compact: dict, chunk: int = 128) -> dict:
    """Repack the rectangular (E, P, S_pp) compacted samples into dense
    chunk rows of ``chunk`` samples: (E, C, chunk) where each row holds one
    pixel's samples (a pixel with n samples spans ceil(n/chunk) rows).

    The rectangular layout pads every pixel to the GLOBAL max occupancy —
    measured ~5x wasted KDE work at 1000 events (sky localization puts most
    samples in one core pixel).  Chunk rows pad only the last chunk of each
    pixel plus the event's row count to the per-event max C — ~2-3x less
    kernel work.  Row statistics (bandwidths, weight sums) still come from
    the rectangular layout's logical-row machinery; this layout feeds only
    the KDE contraction (ops.pallas.fused.fused_rows_contract), whose
    per-row scale factors are gathered via ``row_pix``.

    Returns dict: m1det/m2det/dL/inv_pe_prior (E, C, chunk); row_pix (E, C)
    pixel index p of each row (0 for dead rows, whose weights are all zero).
    """
    m1 = np.asarray(compact["m1det"])
    n_ev, n_pix, s_pp = m1.shape
    assert s_pp % chunk == 0
    counts = np.asarray(compact["n_real"])                 # (E, P)
    chunks_pp = -(-counts // chunk)                        # ceil, 0 if empty
    c_ev = chunks_pp.sum(axis=1)
    c_max = int(-(-max(1, c_ev.max()) // 8) * 8)           # event blocks of 8

    # Source chunk pool: (E, P * S_pp/chunk, chunk) slices of the rectangle.
    pool_per_pix = s_pp // chunk
    sel = np.zeros((n_ev, c_max), dtype=np.int64)          # pool index
    row_pix = np.zeros((n_ev, c_max), dtype=np.int64)
    dead = np.ones((n_ev, c_max), dtype=bool)
    # Vectorized run-length expansion (one pass over all (event, pixel)
    # runs — the last host loop in the pixelization pipeline): each (e, p)
    # contributes a run of chunks_pp[e, p] consecutive rows starting at the
    # exclusive per-event cumsum.
    flat_k = chunks_pp.ravel()                             # (E*P,)
    start = (np.cumsum(chunks_pp, axis=1) - chunks_pp).ravel()
    ev_of = np.repeat(np.arange(n_ev), n_pix)
    pix_of = np.tile(np.arange(n_pix), n_ev)
    idx_in_run = np.arange(flat_k.sum()) \
        - np.repeat(np.cumsum(flat_k) - flat_k, flat_k)
    ev = np.repeat(ev_of, flat_k)
    pix = np.repeat(pix_of, flat_k)
    pos = np.repeat(start, flat_k) + idx_in_run
    sel[ev, pos] = pix * pool_per_pix + idx_in_run
    row_pix[ev, pos] = pix
    dead[ev, pos] = False

    out = {"row_pix": jnp.asarray(row_pix)}
    e_idx = np.arange(n_ev)[:, None]
    for name in ("m1det", "m2det", "dL", "inv_pe_prior"):
        pool = np.asarray(compact[name]).reshape(n_ev, n_pix * pool_per_pix,
                                                 chunk)
        rows = pool[e_idx, sel]                            # (E, C, chunk)
        if name == "inv_pe_prior":
            rows = np.where(dead[:, :, None], 0.0, rows)   # dead rows: w = 0
        elif name == "dL":
            dlf = np.asarray(compact["dl_fill"])[:, None, None]
            rows = np.where(dead[:, :, None], dlf, rows)
        out[name] = jnp.asarray(rows)
    return out
