"""Mesh-sharded inference: events + injections over 'data', walkers over
'params' — the TPU-native replacement for the reference's three MPI schemes
(CHIMERA/parallel.py: 'params' / 'data' / 'both' -> mesh axis sizes).

Run on 8 virtual CPU devices:
  XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
      python examples/sharded_inference.py

On a real pod slice, jax.distributed bring-up is one call — pass
``require=True`` so a mis-configured deployment fails loudly instead of
silently proceeding single-process (every process would quietly compute on
its local chips only):
  from chimera_tpu.parallel import init_distributed
  init_distributed(require=True)
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from chimera_tpu import HyperLikelihood, SelectionFunction
from chimera_tpu.catalog import EmptyCatalog
from chimera_tpu.data.mock import make_mock_catalog, make_mock_injections
from chimera_tpu.inference import init_state, initialize_walkers, run
from chimera_tpu.inference.ensemble import make_vector_log_prob
from chimera_tpu.models import (
    FLRW,
    MadauDickinsonRate,
    Population,
    PowerLawPeak,
    compute_z_grids,
)
from chimera_tpu.parallel import (
    PARAMS_AXIS,
    log_like_batch_sharded,
    make_mesh,
    shard_hyperlikelihood,
)


def main():
    n_dev = jax.device_count()
    print(f"{n_dev} devices on backend {jax.default_backend()!r}")

    cosmo = FLRW.create(H0=70.0, Om0=0.25)
    pop = Population.create(cosmo, PowerLawPeak.create(),
                            MadauDickinsonRate.create(),
                            gal_cat=EmptyCatalog())
    theta = make_mock_catalog(jax.random.PRNGKey(1), pop, n_events=64,
                              n_samples=256)
    inj, n_gen = make_mock_injections(jax.random.PRNGKey(2), pop,
                                      n_generated=100_000)
    z_grids = compute_z_grids(cosmo, theta,
                              cosmo_prior={"H0": [40.0, 120.0]},
                              z_int_res=200)
    hl = HyperLikelihood.create(theta, z_grids, pop,
                                SelectionFunction.create(inj, n_gen))

    # reference scheme 'both': 2-D mesh (params x data); 'params' alone is
    # make_mesh(params=n_dev, data=1), 'data' alone is params=1.
    params = 2 if n_dev % 2 == 0 and n_dev > 1 else 1
    mesh = make_mesh(params=params, data=n_dev // params)
    hls = shard_hyperlikelihood(hl, mesh)

    h0s = jnp.linspace(55.0, 95.0, 16)
    got = np.asarray(log_like_batch_sharded(hls, {"H0": h0s}, mesh))
    exp = np.asarray(hl.log_like_batch({"H0": h0s}))
    print(f"sharded vs single-device max rel diff: "
          f"{np.max(np.abs((got - exp) / exp)):.2e}")

    # sharded ensemble MCMC: walkers ride the 'params' axis
    logp = make_vector_log_prob(hls, ["H0"], bounds={"H0": (40.0, 120.0)})
    walkers = initialize_walkers(jax.random.PRNGKey(3), {"H0": 75.0},
                                 8 * n_dev, ["H0"], scale={"H0": 10.0},
                                 bounds={"H0": (40.0, 120.0)})
    walkers = jax.device_put(walkers, NamedSharding(mesh, P(PARAMS_AXIS)))
    state, hist = run(init_state(jax.random.PRNGKey(4), walkers, logp),
                      logp, n_steps=100, thin=10)
    samp = np.asarray(hist["coords"][3:]).ravel()
    print(f"sharded ensemble: H0 = {np.median(samp):.1f} "
          f"[{np.percentile(samp, 16):.1f}, {np.percentile(samp, 84):.1f}]")


if __name__ == "__main__":
    main()
