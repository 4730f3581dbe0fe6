"""f32 parity gate (SURVEY.md 7.3-1, BASELINE acceptance): the TPU-precision
(f32) pipeline must reproduce the f64 reference to <=1e-6 relative on the
log hyper-likelihood.

The f32 run executes in a subprocess with x64 disabled (the only honest way
— with x64 enabled, table builds silently promote) on data generated here
and shared through a npz file.
"""

import json
import os
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

_EVAL = r"""
import os, sys, json
sys.path.insert(0, sys.argv[3])
os.environ['XLA_FLAGS'] = ''
import jax
jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_enable_x64', False)
import jax.numpy as jnp, numpy as np
from chimera_tpu import HyperLikelihood, SelectionFunction
from chimera_tpu.catalog import EmptyCatalog
from chimera_tpu.data.structs import ThetaPEDet, ThetaInjDet
from chimera_tpu.models import FLRW, PowerLawPeak, MadauDickinsonRate, Population
d = np.load(sys.argv[1])
f32 = jnp.float32
theta = ThetaPEDet(m1det=jnp.asarray(d["m1"], f32), m2det=jnp.asarray(d["m2"], f32),
                   dL=jnp.asarray(d["dl"], f32), pe_prior=jnp.asarray(d["prior"], f32))
inj = ThetaInjDet(m1det=jnp.asarray(d["im1"], f32), m2det=jnp.asarray(d["im2"], f32),
                  dL=jnp.asarray(d["idl"], f32), p_draw=jnp.asarray(d["ipd"], f32))
cosmo = FLRW.create(H0=70., Om0=0.25)
pop = Population.create(cosmo, PowerLawPeak.create(), MadauDickinsonRate.create(),
                        gal_cat=EmptyCatalog())
hl = HyperLikelihood.create(theta, jnp.asarray(d["zg"], f32), pop,
                            SelectionFunction.create(inj, float(d["n_gen"])),
                            binning=False, cut_grid=None)
h0s = jnp.linspace(58., 100., 7)
ll = np.asarray(hl.log_like_batch({"H0": h0s}), np.float64)
json.dump({"ll": ll.tolist()}, open(sys.argv[2], "w"))
"""


@pytest.mark.slow
def test_f32_loglike_parity(tmp_path, fiducial_population):
    from chimera_tpu import HyperLikelihood, SelectionFunction
    from chimera_tpu.data.mock import make_mock_catalog, make_mock_injections
    from chimera_tpu.models import compute_z_grids

    # The relative gate is defined at realistic scale (errors average over
    # events and samples; the conftest micro-mock sits ~3x higher).
    pop = fiducial_population
    theta = make_mock_catalog(jax.random.PRNGKey(1), pop, n_events=64,
                              n_samples=1024)
    theta_inj, n_gen = make_mock_injections(jax.random.PRNGKey(2), pop,
                                            n_generated=200_000)
    mock_z_grids = compute_z_grids(pop.cosmo, theta,
                                   cosmo_prior={"H0": [40.0, 120.0]},
                                   z_int_res=300)
    data = tmp_path / "data.npz"
    np.savez(data, m1=theta.m1det, m2=theta.m2det, dl=theta.dL,
             prior=theta.pe_prior, im1=theta_inj.m1det, im2=theta_inj.m2det,
             idl=theta_inj.dL, ipd=theta_inj.p_draw, zg=mock_z_grids,
             n_gen=n_gen)

    # f64 reference in-process (x64 is on in the test harness)
    hl = HyperLikelihood.create(theta, mock_z_grids, fiducial_population,
                                SelectionFunction.create(theta_inj, n_gen),
                                binning=False, cut_grid=None)
    # restrict to the region where the likelihood is finite for this small
    # mock (at the prior edges the selection N_eff guard gates to -inf,
    # which both precisions represent differently)
    h0s = jnp.linspace(58.0, 100.0, 7)
    ll64 = np.asarray(hl.log_like_batch({"H0": h0s}), np.float64)

    script = tmp_path / "eval32.py"
    script.write_text(_EVAL)
    out = tmp_path / "out.json"
    env = {k: v for k, v in os.environ.items() if k != "JAX_ENABLE_X64"}
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    subprocess.run([sys.executable, str(script), str(data), str(out), repo],
                   check=True, env=env, timeout=500)
    ll32 = np.asarray(json.load(open(out))["ll"])

    rel = np.abs((ll32 - ll64) / ll64)
    assert rel.max() < 1e-6, f"f32 parity gate violated: {rel}"
