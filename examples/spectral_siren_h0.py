"""Spectral-siren H0 inference end-to-end (mock data).

The chimera_tpu analog of the reference's examples/test1dspectral.ipynb:
build a population, generate an O5-like mock catalog + detected injections,
scan H0, and sample the posterior with both the ensemble sampler and HMC.

Run:  python examples/spectral_siren_h0.py  [--events 100] [--samples 1024]

On a TPU backend the batched likelihood automatically routes through the
fused Pallas kernel; on CPU it runs the pure-XLA path (set
XLA_FLAGS=--xla_force_host_platform_device_count=8 to exercise the mesh).
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

from chimera_tpu import HyperLikelihood, SelectionFunction
from chimera_tpu.catalog import EmptyCatalog
from chimera_tpu.data.mock import make_mock_catalog, make_mock_injections
from chimera_tpu.inference import (
    init_state,
    initialize_walkers,
    make_vector_log_prob,
    run,
    sample_hyperposterior,
)
from chimera_tpu.models import (
    FLRW,
    MadauDickinsonRate,
    Population,
    PowerLawPeak,
    compute_z_grids,
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", type=str,
                    default=str(pathlib.Path(__file__).parent
                                / "spectral_siren.toml"),
                    help="TOML run configuration (chimera_tpu.runconfig)")
    ap.add_argument("--events", type=int, default=None,
                    help="override [data].events")
    ap.add_argument("--hmc", action="store_true", help="also run HMC")
    args = ap.parse_args()

    from chimera_tpu.runconfig import (
        RunConfig,
        build_likelihood,
        build_population,
        cosmo_prior,
        prior_bounds,
    )

    cfg = RunConfig.load(args.config)
    if args.events is not None:
        cfg.data["events"] = args.events

    # --- population at the fiducial cosmology (from [cosmology] etc.) -----
    pop = build_population(cfg, gal_cat=EmptyCatalog())

    # --- mock data (replace with data.io loaders for real catalogs) -------
    seed = int(cfg.data.get("seed", 1))
    theta = make_mock_catalog(
        jax.random.PRNGKey(seed), pop,
        n_events=int(cfg.data.get("events", 100)),
        n_samples=int(cfg.data.get("samples", 1024)), snr_threshold=12.0)
    inj, n_gen = make_mock_injections(
        jax.random.PRNGKey(seed + 1), pop,
        n_generated=int(cfg.data.get("injections", 200_000)),
        snr_threshold=12.0)
    z_grids = compute_z_grids(pop.cosmo, theta,
                              cosmo_prior=cosmo_prior(cfg),
                              z_int_res=int(cfg.data.get("z_int_res", 300)))
    hl = build_likelihood(cfg, theta, z_grids, pop,
                          SelectionFunction.create(inj, n_gen))

    # --- 1-D H0 scan -------------------------------------------------------
    bounds = prior_bounds(cfg)
    h0_lo, h0_hi = bounds.get("H0", (40.0, 120.0))
    h0s = jnp.linspace(h0_lo + 5.0, h0_hi - 5.0, 71)
    t0 = time.perf_counter()
    lls = np.asarray(hl.log_like_batch({"H0": h0s}))
    jax.block_until_ready(lls)
    dt = time.perf_counter() - t0
    print(f"H0 scan: peak at {h0s[np.argmax(lls)]:.1f} (truth 70), "
          f"{dt / len(h0s) * 1e3:.2f} ms per evaluation (incl. compile)")

    # --- ensemble MCMC -----------------------------------------------------
    n_walkers = int(cfg.sampler.get("n_walkers", 32))
    n_steps = int(cfg.sampler.get("n_steps", 300))
    thin = int(cfg.sampler.get("thin", 10))
    logp = make_vector_log_prob(hl, ["H0"], bounds={"H0": (h0_lo, h0_hi)})
    walkers = initialize_walkers(jax.random.PRNGKey(seed + 2), {"H0": 75.0},
                                 n_walkers, ["H0"], scale={"H0": 10.0},
                                 bounds={"H0": (h0_lo, h0_hi)})
    state, hist = run(init_state(jax.random.PRNGKey(seed + 3), walkers, logp),
                      logp, n_steps=n_steps, thin=thin)
    samp = np.asarray(hist["coords"][5:]).ravel()
    print(f"ensemble: H0 = {np.median(samp):.1f} "
          f"[{np.percentile(samp, 16):.1f}, {np.percentile(samp, 84):.1f}] "
          f"(16-84%)")

    # --- HMC (gradient-based; the likelihood is differentiable) -----------
    if args.hmc:
        hmc_params = [p for p in ("H0", "Om0") if p in bounds] or ["H0"]
        samples, stats = sample_hyperposterior(
            jax.random.PRNGKey(seed + 4), hl, hmc_params,
            bounds={p: bounds.get(p, (40.0, 120.0)) for p in hmc_params},
            init={"H0": 75.0, "Om0": 0.3}, n_chains=4,
            n_warmup=200, n_samples=300)
        h0 = np.asarray(samples["H0"])[50:]
        print(f"HMC: H0 = {np.median(h0):.1f} "
              f"[{np.percentile(h0, 16):.1f}, {np.percentile(h0, 84):.1f}], "
              f"accept = {float(np.mean(np.asarray(stats['accept']))):.2f}")


if __name__ == "__main__":
    main()
