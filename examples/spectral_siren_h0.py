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
    ap.add_argument("--events", type=int, default=100)
    ap.add_argument("--samples", type=int, default=1024)
    ap.add_argument("--injections", type=int, default=200_000)
    ap.add_argument("--z-res", type=int, default=300)
    ap.add_argument("--hmc", action="store_true", help="also run HMC")
    args = ap.parse_args()

    # --- population at the fiducial cosmology (H0 = 70) -------------------
    cosmo = FLRW.create(H0=70.0, Om0=0.25)
    pop = Population.create(cosmo, PowerLawPeak.create(),
                            MadauDickinsonRate.create(),
                            gal_cat=EmptyCatalog())

    # --- mock data (replace with data.io loaders for real catalogs) -------
    theta = make_mock_catalog(jax.random.PRNGKey(1), pop,
                              n_events=args.events, n_samples=args.samples,
                              snr_threshold=12.0)
    inj, n_gen = make_mock_injections(jax.random.PRNGKey(2), pop,
                                      n_generated=args.injections,
                                      snr_threshold=12.0)
    z_grids = compute_z_grids(cosmo, theta,
                              cosmo_prior={"H0": [40.0, 120.0]},
                              z_int_res=args.z_res)
    hl = HyperLikelihood.create(theta, z_grids, pop,
                                SelectionFunction.create(inj, n_gen),
                                binning=False, cut_grid=None)

    # --- 1-D H0 scan -------------------------------------------------------
    h0s = jnp.linspace(45.0, 115.0, 71)
    t0 = time.perf_counter()
    lls = np.asarray(hl.log_like_batch({"H0": h0s}))
    jax.block_until_ready(lls)
    dt = time.perf_counter() - t0
    print(f"H0 scan: peak at {h0s[np.argmax(lls)]:.1f} (truth 70), "
          f"{dt / len(h0s) * 1e3:.2f} ms per evaluation (incl. compile)")

    # --- ensemble MCMC -----------------------------------------------------
    logp = make_vector_log_prob(hl, ["H0"], bounds={"H0": (40.0, 120.0)})
    walkers = initialize_walkers(jax.random.PRNGKey(3), {"H0": 75.0}, 32,
                                 ["H0"], scale={"H0": 10.0},
                                 bounds={"H0": (40.0, 120.0)})
    state, hist = run(init_state(jax.random.PRNGKey(4), walkers, logp),
                      logp, n_steps=300, thin=10)
    samp = np.asarray(hist["coords"][5:]).ravel()
    print(f"ensemble: H0 = {np.median(samp):.1f} "
          f"[{np.percentile(samp, 16):.1f}, {np.percentile(samp, 84):.1f}] "
          f"(16-84%)")

    # --- HMC (gradient-based; the likelihood is differentiable) -----------
    if args.hmc:
        samples, stats = sample_hyperposterior(
            jax.random.PRNGKey(5), hl, ["H0", "Om0"],
            bounds={"H0": (40.0, 120.0), "Om0": (0.05, 0.95)},
            init={"H0": 75.0, "Om0": 0.3}, n_chains=4,
            n_warmup=200, n_samples=300)
        h0 = np.asarray(samples["H0"])[50:]
        print(f"HMC: H0 = {np.median(h0):.1f} "
              f"[{np.percentile(h0, 16):.1f}, {np.percentile(h0, 84):.1f}], "
              f"accept = {float(np.mean(np.asarray(stats['accept']))):.2f}")


if __name__ == "__main__":
    main()
