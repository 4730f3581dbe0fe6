"""Pallas KDE kernel: numeric parity with the fused-XLA core (interpret mode
on CPU; the same kernel compiles for real on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from chimera_tpu.ops.kde import kde1d_core, kde1d_params
from chimera_tpu.ops.pallas.kde import kde1d_grid


@pytest.mark.parametrize("kernel", ["epan", "gauss"])
@pytest.mark.parametrize("s", [200, 1024])
def test_pallas_matches_xla_core(kernel, s):
    key = jax.random.PRNGKey(0)
    b, g = 7, 130  # deliberately non-multiples of the tile sizes
    z = jax.random.normal(key, (b, s)) * 0.2 + 1.0
    w = jax.random.uniform(jax.random.PRNGKey(1), (b, s))
    grids = jnp.linspace(0.3, 1.8, g)[None, :] * jnp.linspace(
        0.8, 1.2, b)[:, None]
    wn, h = kde1d_params(z, w, None)
    expect = jax.vmap(lambda zz, gg, ww, hh: kde1d_core(zz, gg, ww, hh, kernel)
                      )(z, grids, wn, h)
    got = kde1d_grid(z, wn, grids, h, kernel=kernel, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expect),
                               rtol=5e-6, atol=1e-10)


def test_likelihood_engines_agree(fiducial_population, mock_catalog,
                                  mock_injections, mock_z_grids):
    """Full spectral likelihood: pallas(interpret) vs xla engine."""
    from chimera_tpu import HyperLikelihood, SelectionFunction, pytree

    theta_inj, n_inj = mock_injections
    sel = SelectionFunction.create(theta_inj, n_inj)
    hl_x = HyperLikelihood.create(mock_catalog, mock_z_grids,
                                  fiducial_population, sel, num_bins=100,
                                  kde_engine="xla")
    hl_p = pytree.replace(hl_x, kde_engine="pallas")
    for h0 in (60.0, 70.0, 90.0):
        a = float(hl_x.log_like(H0=h0))
        b = float(hl_p.log_like(H0=h0))
        np.testing.assert_allclose(b, a, rtol=1e-8)
