"""Headline benchmark: 1000-event hyper-likelihood wall time per hyper-lambda.

North star (BASELINE.json): full 1000-event evaluation < 10 ms per sample on
TPU v5e-8.  This script measures ms per hyper-lambda on whatever backend JAX
selects (the real chip under the driver), using the flagship spectral-siren
configuration at O5-like scale: 1000 events x 4096 PE samples, 500-point
z-grids, ~1e5 detected injections.

Prints ONE JSON line:
  {"metric": "hyperlike_eval_ms_1kev", "value": <ms>, "unit": "ms",
   "vs_baseline": <10ms / value>}
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp


def build(n_events=1000, n_samples=4096, n_inj=2_000_000, z_res=500):
    from chimera_tpu import HyperLikelihood, SelectionFunction
    from chimera_tpu.catalog import EmptyCatalog
    from chimera_tpu.data.mock import make_mock_catalog, make_mock_injections
    from chimera_tpu.models import (
        FLRW,
        MadauDickinsonRate,
        Population,
        PowerLawPeak,
        compute_z_grids,
    )

    cosmo = FLRW.create(H0=70.0, Om0=0.25)
    pop = Population.create(cosmo, PowerLawPeak.create(),
                            MadauDickinsonRate.create(), gal_cat=EmptyCatalog())
    cat = make_mock_catalog(jax.random.PRNGKey(42), pop, n_events=n_events,
                            n_samples=n_samples, snr_threshold=12.0,
                            oversample=max(100, 4 * 50_000 // n_events))
    inj, n_gen = make_mock_injections(jax.random.PRNGKey(7), pop,
                                      n_generated=n_inj, snr_threshold=12.0)
    z_grids = compute_z_grids(cosmo, cat, cosmo_prior={"H0": [40.0, 120.0]},
                              z_int_res=z_res)
    sel = SelectionFunction.create(inj, n_gen)
    # TPU flagship config: direct (unbinned) KDE evaluated straight on the
    # analysis grids (cut_grid=None) — exact (no binning approximation, no
    # effective-grid resampling) and fully fused on TPU.
    return HyperLikelihood.create(cat, z_grids, pop, sel, binning=False,
                                  cut_grid=None)


def _time_batch(hl, batch=16, n_rep=5):
    # NOTE: evaluate through the library's jitted entry point, which takes
    # the HyperLikelihood pytree as an ARGUMENT — closure-capturing it
    # would bake the PE/injection arrays into the program as constants and
    # blow the tunneled backend's compile-request size limit.
    h0s = jnp.linspace(55.0, 95.0, batch)
    out = hl.log_like_batch({"H0": h0s})
    jax.block_until_ready(out)  # compile + warmup
    # hardware-numerics guard: round 2 found a TPU-only bf16-matmul
    # corruption that made dark-siren likelihoods inf on-chip while every
    # CPU test passed — a bench that times garbage must fail loudly.
    assert bool(jnp.isfinite(out).all()), "non-finite log-likelihoods"
    best = float("inf")
    for _ in range(n_rep):
        t0 = time.perf_counter()
        jax.block_until_ready(hl.log_like_batch({"H0": h0s}))
        best = min(best, time.perf_counter() - t0)
    return best / batch * 1e3


def build_dark_full(n_events=128, n_samples=1024, n_pix=12, z_res=500,
                    n_inj=200_000):
    """'full' 3-D variant at scale (streamed sample axis)."""
    from chimera_tpu import HyperLikelihood, SelectionFunction, pytree
    from chimera_tpu.catalog import DVdzCompleteness, EmptyCatalog
    from chimera_tpu.catalog.build import build_pixelated_catalog
    from chimera_tpu.data.mock import (make_mock_catalog, make_mock_galaxies,
                                       make_mock_injections)
    from chimera_tpu.data.pixelize import pixelize_gw_catalog
    from chimera_tpu.models import (FLRW, MadauDickinsonRate, Population,
                                    PowerLawPeak, compute_z_grids)

    cosmo = FLRW.create(H0=70.0, Om0=0.25)
    pop = Population.create(cosmo, PowerLawPeak.create(),
                            MadauDickinsonRate.create(),
                            gal_cat=EmptyCatalog())
    cat, truths = make_mock_catalog(
        jax.random.PRNGKey(11), pop, n_events=n_events, n_samples=n_samples,
        snr_threshold=12.0, sigma_sky_rad=0.03, oversample=400,
        return_truths=True)
    cat = pixelize_gw_catalog(cat, nside_list=[8, 16],
                              mean_npixels_event=n_pix, sky_conf=0.9)
    z_grids = compute_z_grids(cosmo, cat, cosmo_prior={"H0": [40.0, 120.0]},
                              z_int_res=z_res)
    gal = make_mock_galaxies(jax.random.PRNGKey(12), pop, truths,
                             n_background=50_000)
    compl = DVdzCompleteness.create(z_range=(0.0, 3.0), kind="step")
    gc = build_pixelated_catalog(gal, cat, z_grids, cosmo, compl, z_err=0.01)
    pop = pytree.replace(pop, gal_cat=gc)
    inj, n_gen = make_mock_injections(jax.random.PRNGKey(13), pop,
                                      n_generated=n_inj, snr_threshold=12.0)
    sel = SelectionFunction.create(inj, n_gen)
    return HyperLikelihood.create(cat, z_grids, pop, sel, kind="full",
                                  binning=False)


def suite():
    """Extended benchmark rows for BASELINE.md (run manually:
    BENCH_SUITE=1 python bench.py)."""
    rows = []
    for n_ev in (100, 1000, 10_000):
        hl = build(n_events=n_ev)
        ms = _time_batch(hl, batch=16 if n_ev <= 1000 else 4)
        rows.append({"metric": f"hyperlike_eval_ms_{n_ev}ev",
                     "value": round(ms, 4), "unit": "ms"})
        print(json.dumps(rows[-1]), flush=True)
    hl_full = build_dark_full()
    ms = _time_batch(hl_full, batch=4)
    rows.append({"metric": "hyperlike_full3d_ms_128ev",
                 "value": round(ms, 4), "unit": "ms"})
    print(json.dumps(rows[-1]), flush=True)
    from chimera_tpu import HyperLikelihood

    hl_marg = HyperLikelihood.create(
        hl_full.theta_gw, hl_full.z_grids, hl_full.population,
        hl_full.selection, kind="marginalized", binning=False)
    ms = _time_batch(hl_marg, batch=8)
    rows.append({"metric": "hyperlike_marginalized_ms_128ev",
                 "value": round(ms, 4), "unit": "ms"})
    print(json.dumps(rows[-1]), flush=True)
    return rows


def suite_mesh():
    """Weak-scaling row: events+injections sharded over an 8-device mesh
    (virtual CPU devices unless 8 real chips exist).  Run:
    BENCH_MESH=1 python bench.py."""
    from chimera_tpu.utils.devices import ensure_virtual_devices

    # Provision BEFORE any backend use: probing the device count would
    # initialize the default (single-chip) backend and lock the platform.
    if not ensure_virtual_devices(8):
        raise SystemExit("BENCH_MESH needs 8 devices; run in a fresh process")
    from chimera_tpu.parallel import make_mesh
    from chimera_tpu.parallel.mesh import (log_like_batch_sharded,
                                           shard_hyperlikelihood)

    hl = build(n_events=1000, n_samples=1024, n_inj=500_000, z_res=500)
    h0s = jnp.linspace(55.0, 95.0, 8)

    jax.block_until_ready(hl.log_like_batch({"H0": h0s}))
    t0 = time.perf_counter()
    jax.block_until_ready(hl.log_like_batch({"H0": h0s}))
    t_single = time.perf_counter() - t0

    mesh = make_mesh(params=1, data=8)
    hls = shard_hyperlikelihood(hl, mesh)
    jax.block_until_ready(log_like_batch_sharded(hls, {"H0": h0s}, mesh))
    t0 = time.perf_counter()
    jax.block_until_ready(log_like_batch_sharded(hls, {"H0": h0s}, mesh))
    t_mesh = time.perf_counter() - t0

    row = {"metric": "mesh8_speedup_1kev",
           "value": round(t_single / t_mesh, 3), "unit": "x",
           "single_ms": round(t_single / 8 * 1e3, 2),
           "mesh_ms": round(t_mesh / 8 * 1e3, 2)}
    print(json.dumps(row), flush=True)
    return row


def main():
    import os

    if os.environ.get("BENCH_SUITE"):
        suite()
        return
    if os.environ.get("BENCH_MESH"):
        suite_mesh()
        return
    ms_per_lambda = _time_batch(build())
    print(json.dumps({
        "metric": "hyperlike_eval_ms_1kev",
        "value": round(ms_per_lambda, 4),
        "unit": "ms",
        "vs_baseline": round(10.0 / ms_per_lambda, 3),
    }))


if __name__ == "__main__":
    main()
