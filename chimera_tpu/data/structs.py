"""Event-parameter pytree structs with explicit masks.

Capability parity with CHIMERA/data.py:15-64 (theta_pe_det, theta_inj_det,
theta_src), with one deliberate redesign: ragged (event x pixel) arrays are
padded to static shapes *and carry an explicit boolean* ``pixel_mask`` instead
of the reference's magic ``-100`` sentinel comparisons.  Masks survive vmap /
shard_map and keep TPU tiles dense; the ``-100`` convention is still honored
at the HDF5 boundary for file compatibility (see chimera_tpu.data.io).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from jax import Array

from chimera_tpu import pytree

PAD_VALUE = -100.0  # file-format sentinel (reference data.py:347-352)


@pytree.dataclass
class ThetaPEDet:
    """Detector-frame PE samples for a GW catalog, plus pixelation metadata.

    Core arrays have shape (Nev, Nsamples); pixel arrays are padded to
    (Nev, max_npixels) with ``pixel_mask`` marking real pixels.
    """

    m1det: Array | None = None
    m2det: Array | None = None
    dL: Array | None = None
    phi: Array | None = None
    theta: Array | None = None
    ra: Array | None = None
    dec: Array | None = None
    pe_prior: Array | None = None
    # Pixelated-catalog extras (reference data.py:37-43):
    opt_nsides: Array | None = None           # (Nev,)
    pixels_opt_nsides: Array | None = None     # (Nev, P) padded
    ra_pix: Array | None = None                # (Nev, P) padded
    dec_pix: Array | None = None               # (Nev, P) padded
    gw_loc2d_pdf: Array | None = None          # (Nev, P) padded
    pixels_pe_opt_nside: Array | None = None   # (Nev, Ns)
    pixel_mask: Array | None = None            # (Nev, P) bool

    def update(self, **kwargs: Any) -> "ThetaPEDet":
        return pytree.replace(self, **kwargs)

    @property
    def n_events(self) -> int:
        return self.dL.shape[0]

    @property
    def n_samples(self) -> int:
        return self.dL.shape[1]

    @property
    def pixelated(self) -> bool:
        return self.pixels_opt_nsides is not None

    @property
    def max_npixels(self) -> int:
        return self.pixels_opt_nsides.shape[1]

    @property
    def n_pixels_per_event(self) -> Array:
        return jnp.sum(self.pixel_mask, axis=-1)

    def with_derived(self) -> "ThetaPEDet":
        """Fill derived fields: unit pe_prior, pixel_mask from padding."""
        out = self
        if out.pe_prior is None and out.dL is not None:
            out = pytree.replace(out, pe_prior=jnp.ones_like(out.dL))
        if out.pixel_mask is None and out.ra_pix is not None:
            out = pytree.replace(out, pixel_mask=out.ra_pix != PAD_VALUE)
        return out


@pytree.dataclass
class ThetaInjDet:
    """Detector-frame parameters of detected injections (data.py:49-53)."""

    m1det: Array | None = None
    m2det: Array | None = None
    dL: Array | None = None
    p_draw: Array | None = None

    def update(self, **kwargs: Any) -> "ThetaInjDet":
        return pytree.replace(self, **kwargs)

    @property
    def n_detected(self) -> int:
        return self.dL.shape[0]


@pytree.dataclass
class ThetaSrc:
    """Source-frame parameters (data.py:55-59).  ``original_distances``
    carries the measured GW distances so MG cosmologies can de-modify them
    without a second table inversion (cosmo.py:269-279)."""

    m1src: Array | None = None
    m2src: Array | None = None
    z: Array | None = None
    original_distances: Array | None = None

    def update(self, **kwargs: Any) -> "ThetaSrc":
        return pytree.replace(self, **kwargs)
