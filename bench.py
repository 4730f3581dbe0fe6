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


def main():
    hl = build()
    from chimera_tpu.likelihood import log_hyperlikelihood_batch

    batch = 16
    h0s = jnp.linspace(55.0, 95.0, batch)

    fn = jax.jit(lambda b: log_hyperlikelihood_batch(hl, {"H0": b}))
    out = fn(h0s)
    jax.block_until_ready(out)  # compile + warmup

    n_rep = 5
    best = float("inf")
    for _ in range(n_rep):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(h0s))
        dt = time.perf_counter() - t0
        best = min(best, dt)

    ms_per_lambda = best / batch * 1e3
    print(json.dumps({
        "metric": "hyperlike_eval_ms_1kev",
        "value": round(ms_per_lambda, 4),
        "unit": "ms",
        "vs_baseline": round(10.0 / ms_per_lambda, 3),
    }))


if __name__ == "__main__":
    main()
