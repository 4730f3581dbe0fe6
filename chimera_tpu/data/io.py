"""HDF5 I/O: reference-schema-compatible loaders and artifact round-trips.

Capability parity with CHIMERA/utils/io.py (save_set/load_set/load_data_h5)
and CHIMERA/data.py:70-233 (galaxy catalogs, GW PE samples, injections).
File layouts match the reference's Zenodo datasets exactly (``posteriors``
group with m1det/m2det/dL/...; injection key mapping of data.py:170-179;
-100-padded pixel arrays) so reference data files run unmodified — on load,
-100 sentinels are converted into explicit masks (chimera_tpu.data.structs).
"""

from __future__ import annotations

import h5py
import jax.numpy as jnp
import numpy as np

from chimera_tpu.config import logger
from chimera_tpu.data.structs import PAD_VALUE, ThetaInjDet, ThetaPEDet

THETA_PE_DATASETS = ["m1det", "m2det", "dL", "pe_prior"]
THETA_PE_PIXELATED_DATASETS = THETA_PE_DATASETS + [
    "ra", "dec", "theta", "phi", "opt_nsides", "pixels_opt_nsides",
    "ra_pix", "dec_pix", "gw_loc2d_pdf", "pixels_pe_opt_nside"]


def load_data_h5(fname, group=None, backend="jax", require_keys=None) -> dict:
    """Load every dataset in a file/group into a dict (io.py:44-66)."""
    xp = jnp if backend == "jax" else np
    out = {}
    with h5py.File(fname, "r") as f:
        target = f if group is None else f[group]
        if require_keys:
            missing = [k for k in require_keys if k not in target]
            if missing:
                raise ValueError(f"missing keys in {fname}: {missing}")
        for k in target.keys():
            out[k] = xp.asarray(target[k][:])
    return out


def save_attrs_datasets(obj, fname, attrs=(), datasets=(), groups=()) -> None:
    """Generic artifact writer (io.py:7-18)."""
    with h5py.File(fname, "w") as f:
        for a in attrs:
            f.attrs[a] = getattr(obj, a)
        for d in datasets:
            f.create_dataset(d, data=np.asarray(getattr(obj, d)))
        for g in groups:
            grp = f.create_group(g)
            for k, v in getattr(obj, g).items():
                grp.create_dataset(str(k), data=np.asarray(v))


def load_attrs_datasets(fname, attrs=(), datasets=(), groups=()) -> dict:
    """Generic artifact reader; returns a field dict (io.py:20-41)."""
    out = {}
    with h5py.File(fname, "r") as f:
        for a in attrs:
            out[a] = f.attrs[a]
        for d in datasets:
            out[d] = jnp.asarray(f[d][:])
        for g in groups:
            out[g] = {k: jnp.asarray(f[g][k][:]) for k in f[g].keys()}
    return out


# ---------------------------------------------------------------------------
# Catalog loaders (reference data.py:70-233)
# ---------------------------------------------------------------------------

def load_galaxy_catalog(file_path, parameters=("ra_gal", "dec_gal", "z_cgal"),
                        units="rad", backend="numpy") -> dict:
    """Galaxy catalog -> {'ra', 'dec', 'z'} with optional deg->rad."""
    if units not in ("rad", "deg"):
        raise ValueError("units must be 'rad' or 'deg'")
    data = load_data_h5(file_path, backend=backend,
                        require_keys=list(parameters))
    xp = jnp if backend == "jax" else np
    out = {"ra": data[parameters[0]], "dec": data[parameters[1]],
           "z": data[parameters[2]]}
    if units == "rad":
        out["ra"] = xp.deg2rad(out["ra"])
        out["dec"] = xp.deg2rad(out["dec"])
    return out


def _selection_indices(n, max_n, name, rng: np.random.Generator | None = None):
    """Event/sample/injection subselection (data.py:219-233) — seeded."""
    if n is None:
        return slice(None)
    if isinstance(n, (list, np.ndarray)):
        return np.asarray(n)
    if isinstance(n, int):
        if n > max_n:
            logger.warning(f"requested more {name} than available; using all")
            return slice(None)
        rng = rng or np.random.default_rng(0)
        return np.sort(rng.choice(max_n, n, replace=False))
    raise ValueError(f"invalid selection for {name}")


def load_gw_pe_samples(file_ev_pe,
                       parameters=("dL", "m1det", "m2det", "phi", "theta"),
                       group="posteriors", nevents=None, nsamples=None,
                       rng=None) -> ThetaPEDet:
    """PE samples from the reference file schema (data.py:107-148)."""
    data = load_data_h5(file_ev_pe, group=group, backend="numpy",
                        require_keys=list(parameters))
    ev_idx = _selection_indices(nevents, data["dL"].shape[0], "events", rng)
    s_idx = _selection_indices(nsamples, data["dL"].shape[1], "samples", rng)
    result = {k: jnp.asarray(data[k][ev_idx][:, s_idx]) for k in parameters}
    if {"theta", "phi"} <= set(parameters):
        result["ra"] = result["phi"]
        result["dec"] = 0.5 * jnp.pi - result["theta"]
    return ThetaPEDet(**result).with_derived()


def load_injection_data(file_inj, snr_cut=None, ninj=None, group=None,
                        key_mapping=None, rng=None) -> tuple[ThetaInjDet, int]:
    """Injection set with SNR cut and detector-frame conversion
    (data.py:150-216).  Returns (theta_inj, n_detected_loaded); the total
    N_generated must come from the file's metadata or the caller."""
    keys = {"m1s": "m1src", "m2s": "m2src", "m1d": "m1det", "m2d": "m2det",
            "dL": "dL", "z": "z", "snr": "SNR_net",
            "log_pdraw": "log_p_draw_nospin"}
    keys.update(key_mapping or {})
    data = load_data_h5(file_inj, group=group, backend="numpy")

    keep = data[keys["snr"]] > snr_cut if snr_cut else slice(None)
    if keys["m1d"] in data:
        m1d, m2d = data[keys["m1d"]], data[keys["m2d"]]
    else:
        m1d = data[keys["m1s"]] * (1 + data[keys["z"]])
        m2d = data[keys["m2s"]] * (1 + data[keys["z"]])
    m1d, m2d, dl = m1d[keep], m2d[keep], data[keys["dL"]][keep]
    assert (m1d > 0).all() and (m2d > 0).all(), "masses must be positive"
    assert (dl > 0).all(), "distances must be positive"
    assert (m2d <= m1d).all(), "primary mass must be >= secondary"
    p_draw = np.exp(data[keys["log_pdraw"]][keep])

    idx = _selection_indices(ninj, len(m1d), "injections", rng)
    theta = ThetaInjDet(m1det=jnp.asarray(m1d[idx]), m2det=jnp.asarray(m2d[idx]),
                        dL=jnp.asarray(dl[idx]), p_draw=jnp.asarray(p_draw[idx]))
    return theta, theta.n_detected


def save_pixelated_gw_catalog(theta: ThetaPEDet, fname: str) -> None:
    """Write a pixelated catalog in the reference file layout (data.py:365-371):
    masked pixel slots stored as -100."""
    masked = theta
    if theta.pixel_mask is not None:
        import jax

        def refill(x):
            if x is None:
                return x
            if x.ndim == 2 and x.shape == theta.pixel_mask.shape:
                return jnp.where(theta.pixel_mask, x,
                                 jnp.asarray(PAD_VALUE, x.dtype))
            return x
        masked = theta.update(
            pixels_opt_nsides=refill(theta.pixels_opt_nsides),
            ra_pix=refill(theta.ra_pix), dec_pix=refill(theta.dec_pix),
            gw_loc2d_pdf=refill(theta.gw_loc2d_pdf))
    save_attrs_datasets(masked, fname, datasets=THETA_PE_PIXELATED_DATASETS)


def load_pixelated_gw_catalog(fname: str) -> ThetaPEDet:
    """Read a pixelated catalog (reference layout, data.py:395-404);
    -100 sentinels become the pixel mask."""
    fields = load_attrs_datasets(fname, datasets=THETA_PE_PIXELATED_DATASETS)
    return ThetaPEDet(**fields).with_derived()
