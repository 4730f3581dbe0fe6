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


_EVAL_DARK = r"""
import os, sys, json
sys.path.insert(0, sys.argv[3])
os.environ['XLA_FLAGS'] = ''
import jax
jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_enable_x64', False)
import jax.numpy as jnp, numpy as np
from chimera_tpu import HyperLikelihood, SelectionFunction, pytree
from chimera_tpu.catalog import DVdzCompleteness, EmptyCatalog
from chimera_tpu.catalog.pixelated import PixelatedCatalog
from chimera_tpu.data.structs import ThetaPEDet, ThetaInjDet
from chimera_tpu.models import FLRW, PowerLawPeak, MadauDickinsonRate, Population
d = np.load(sys.argv[1])
f32 = jnp.float32
theta = ThetaPEDet(
    m1det=jnp.asarray(d["m1"], f32), m2det=jnp.asarray(d["m2"], f32),
    dL=jnp.asarray(d["dl"], f32), pe_prior=jnp.asarray(d["prior"], f32),
    ra=jnp.asarray(d["ra"], f32), dec=jnp.asarray(d["dec"], f32),
    opt_nsides=jnp.asarray(d["opt_nsides"]),
    pixels_opt_nsides=jnp.asarray(d["pixels"]),
    ra_pix=jnp.asarray(d["ra_pix"], f32), dec_pix=jnp.asarray(d["dec_pix"], f32),
    gw_loc2d_pdf=jnp.asarray(d["loc2d"], f32),
    pixels_pe_opt_nside=jnp.asarray(d["pix_pe"]),
    pixel_mask=jnp.asarray(d["pmask"]))
inj = ThetaInjDet(m1det=jnp.asarray(d["im1"], f32), m2det=jnp.asarray(d["im2"], f32),
                  dL=jnp.asarray(d["idl"], f32), p_draw=jnp.asarray(d["ipd"], f32))
compl = DVdzCompleteness.create(z_range=(0.0, 3.0), kind="step")
gc = PixelatedCatalog(p_cat=jnp.asarray(d["p_cat"], f32),
                      P_compl=jnp.asarray(d["P_compl"], f32),
                      pixel_mask=jnp.asarray(d["pmask"]),
                      n_gal=jnp.asarray(d["n_gal"]), completeness=compl)
cosmo = FLRW.create(H0=70., Om0=0.25)
pop = Population.create(cosmo, PowerLawPeak.create(), MadauDickinsonRate.create(),
                        gal_cat=gc)
hl = HyperLikelihood.create(theta, jnp.asarray(d["zg"], f32), pop,
                            SelectionFunction.create(inj, float(d["n_gen"])),
                            kind="marginalized", binning=False, cut_grid=None)
h0s = jnp.linspace(58., 100., 7)
ll = np.asarray(hl.log_like_batch({"H0": h0s}), np.float64)
json.dump({"ll": ll.tolist()}, open(sys.argv[2], "w"))
"""


@pytest.mark.slow
def test_f32_dark_siren_parity(tmp_path, fiducial_population):
    """f32 gate for the dark-siren 'marginalized' pipeline (the round-2
    hardware-precision incident showed dark sirens need their own
    precision coverage, not just spectral)."""
    from chimera_tpu import HyperLikelihood, SelectionFunction, pytree
    from chimera_tpu.catalog import DVdzCompleteness
    from chimera_tpu.catalog.build import build_pixelated_catalog
    from chimera_tpu.data.mock import (make_mock_catalog, make_mock_galaxies,
                                       make_mock_injections)
    from chimera_tpu.data.pixelize import pixelize_gw_catalog
    from chimera_tpu.models import compute_z_grids

    pop = fiducial_population
    theta, truths = make_mock_catalog(
        jax.random.PRNGKey(31), pop, n_events=16, n_samples=512,
        sigma_sky_rad=0.03, oversample=400, return_truths=True)
    theta = pixelize_gw_catalog(theta, nside_list=[8, 16],
                                mean_npixels_event=6, sky_conf=0.9)
    z_grids = compute_z_grids(pop.cosmo, theta,
                              cosmo_prior={"H0": [40.0, 120.0]},
                              z_int_res=200)
    gal = make_mock_galaxies(jax.random.PRNGKey(32), pop, truths,
                             n_background=10_000)
    compl = DVdzCompleteness.create(z_range=(0.0, 3.0), kind="step")
    gc = build_pixelated_catalog(gal, theta, z_grids, pop.cosmo, compl,
                                 z_err=0.01)
    theta_inj, n_gen = make_mock_injections(jax.random.PRNGKey(33), pop,
                                            n_generated=100_000)
    pop_pix = pytree.replace(pop, gal_cat=gc)
    hl = HyperLikelihood.create(theta, z_grids, pop_pix,
                                SelectionFunction.create(theta_inj, n_gen),
                                kind="marginalized", binning=False,
                                cut_grid=None)
    h0s = jnp.linspace(58.0, 100.0, 7)
    ll64 = np.asarray(hl.log_like_batch({"H0": h0s}), np.float64)

    data = tmp_path / "dark.npz"
    np.savez(data, m1=theta.m1det, m2=theta.m2det, dl=theta.dL,
             prior=theta.pe_prior, ra=theta.ra, dec=theta.dec,
             opt_nsides=theta.opt_nsides, pixels=theta.pixels_opt_nsides,
             ra_pix=theta.ra_pix, dec_pix=theta.dec_pix,
             loc2d=theta.gw_loc2d_pdf, pix_pe=theta.pixels_pe_opt_nside,
             pmask=theta.pixel_mask, p_cat=gc.p_cat, P_compl=gc.P_compl,
             n_gal=gc.n_gal, im1=theta_inj.m1det, im2=theta_inj.m2det,
             idl=theta_inj.dL, ipd=theta_inj.p_draw, zg=z_grids, n_gen=n_gen)

    script = tmp_path / "eval32d.py"
    script.write_text(_EVAL_DARK)
    out = tmp_path / "outd.json"
    env = {k: v for k, v in os.environ.items() if k != "JAX_ENABLE_X64"}
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    subprocess.run([sys.executable, str(script), str(data), str(out), repo],
                   check=True, env=env, timeout=500)
    ll32 = np.asarray(json.load(open(out))["ll"])
    rel = np.abs((ll32 - ll64) / ll64)
    # 1e-6 is the BASELINE.md acceptance gate.  Reached in round 3 by fixing
    # the f32 DCT basis in ops.chebyshev (cos of ~200-rad arguments computed
    # on-device in f32 put ~3e-6 noise on every fitted coefficient; the
    # static basis is now an exact host-f64 constant) — measured 5.7e-6 ->
    # 7.0e-7 on this mock.
    assert rel.max() < 1e-6, f"dark-siren f32 parity violated: {rel}"
