"""Chebyshev-interpolant tests: spectral accuracy and hot-path parity between
the 'chebyshev' (gather-free) and 'table' (reference-semantics) engines."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from chimera_tpu.models import FLRW, MGFLRW, PowerLawPeak, TruncatedPowerLaw
from chimera_tpu.models import cosmology as cf
from chimera_tpu.ops.chebyshev import chebeval, chebfit_from_fn


def test_chebfit_exact_polynomial():
    # A cubic is represented exactly by degree >= 4.
    f = lambda x: 2.0 + x - 3.0 * x**2 + 0.5 * x**3
    coeffs = chebfit_from_fn(f, -2.0, 5.0, 8)
    x = jnp.linspace(-2.0, 5.0, 100)
    np.testing.assert_allclose(np.asarray(chebeval(coeffs, x, -2.0, 5.0)),
                               np.asarray(f(x)), rtol=1e-12, atol=1e-12)


def test_chebfit_converges_geometrically():
    f = jnp.exp
    errs = []
    x = jnp.linspace(0.0, 3.0, 500)
    for n in (8, 16, 32):
        c = chebfit_from_fn(f, 0.0, 3.0, n)
        errs.append(float(jnp.max(jnp.abs(chebeval(c, x, 0.0, 3.0) - f(x)))))
    assert errs[1] < errs[0] * 1e-4
    assert errs[2] < 1e-12


def test_chebeval_clamps_like_interp():
    c = chebfit_from_fn(jnp.sin, 0.0, 1.0, 16)
    lo = float(chebeval(c, jnp.asarray(-5.0), 0.0, 1.0))
    hi = float(chebeval(c, jnp.asarray(7.0), 0.0, 1.0))
    assert abs(lo - np.sin(0.0)) < 1e-10
    assert abs(hi - np.sin(1.0)) < 1e-10


@pytest.mark.parametrize("cls,extra", [(FLRW, {}),
                                       (MGFLRW, {"Xi0": 1.6, "n": 1.9})])
def test_cosmology_engines_agree(cls, extra):
    """chebyshev vs table engine: distances and inversions agree to ~1e-7
    (both approximate the same smooth functions; the table itself carries
    O((dz)^2) interpolation error)."""
    kw = dict(H0=67.0, Om0=0.32, z_grid_res=8000, **extra)
    c_cheb = cls.create(interp_method="chebyshev", **kw)
    c_tab = cls.create(interp_method="table", **kw)
    z = jnp.linspace(0.01, 9.5, 300)
    for fn in (cf.comoving_distance, cf.dl_at_z, cf.ddl_dz_at_z,
               cf.differential_comoving_volume):
        a = np.asarray(fn(c_cheb, z))
        b = np.asarray(fn(c_tab, z))
        # bounded by the table's own piecewise-linear error at this res
        np.testing.assert_allclose(a, b, rtol=2e-6)
    d = jnp.linspace(0.05, 80.0, 300)
    np.testing.assert_allclose(np.asarray(cf.z_from_dgw(c_cheb, d)),
                               np.asarray(cf.z_from_dgw(c_tab, d)), rtol=2e-6,
                               atol=2e-7)


def test_z_from_dgw_roundtrip_chebyshev():
    c = FLRW.create(H0=70.0, Om0=0.3, z_grid_res=8000)
    z = jnp.linspace(0.01, 5.0, 50)
    z_back = cf.z_from_dgw(c, cf.dl_at_z(c, z))
    np.testing.assert_allclose(np.asarray(z_back), np.asarray(z), rtol=1e-6,
                               atol=1e-7)


def test_mass_cdf_engines_agree():
    for cls, kw in [(PowerLawPeak, {}), (TruncatedPowerLaw, {}),
                    (PowerLawPeak, {"delta_m": 0.5}),
                    (PowerLawPeak, {"delta_m": 15.0})]:
        m_a = cls.create(cdf_engine="analytic", **kw)
        m_t = cls.create(cdf_engine="table", grid_res=20000, **kw)
        m1 = jnp.linspace(4.0, 90.0, 400)
        a = np.asarray(m_a.conditional_cdf_at(m1))
        b = np.asarray(m_t.conditional_cdf_at(m1))
        scale = b[-1]
        np.testing.assert_allclose(a / scale, b / scale, rtol=2e-5, atol=3e-6,
                                   err_msg=f"{cls.__name__} {kw}")


def test_p_m1m2_engines_agree():
    m_a = PowerLawPeak.create(cdf_engine="analytic")
    m_t = PowerLawPeak.create(cdf_engine="table", grid_res=20000)
    from chimera_tpu.models.mass import p_m1m2

    key = jax.random.PRNGKey(0)
    m1 = jax.random.uniform(key, (2000,), minval=5.2, maxval=86.0)
    m2 = m1 * jax.random.uniform(jax.random.PRNGKey(1), (2000,), minval=0.3,
                                 maxval=1.0)
    a = np.asarray(p_m1m2(m_a, m1, m2))
    b = np.asarray(p_m1m2(m_t, m1, m2))
    np.testing.assert_allclose(a, b, rtol=2e-4, atol=1e-12)


def test_uniform_interp_matches_jnp():
    from chimera_tpu.ops import uniform_interp

    fp = jnp.asarray(np.random.default_rng(0).normal(size=64))
    xp = jnp.linspace(2.0, 7.0, 64)
    x = jnp.linspace(1.5, 7.5, 500)
    got = uniform_interp(x, 2.0, 7.0, fp)
    expect = jnp.interp(x, xp, fp, left=0.0, right=0.0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expect),
                               rtol=1e-12, atol=1e-12)


def test_chebeval_custom_vjp_matches_numerical():
    """chebeval's analytic custom VJP (scatter-free, required inside Pallas
    kernels) against centered finite differences in every argument."""
    import numpy as np

    rng = np.random.default_rng(3)
    n = 12
    coeffs = jnp.asarray(rng.normal(size=n))
    x = jnp.asarray(rng.uniform(0.31, 1.9, size=17))
    a, b = 0.3, 2.0

    def f(c, xx, aa, bb):
        return jnp.sum(jnp.sin(chebeval(c, xx, aa, bb)) ** 2)

    gc, gx, ga, gb = jax.grad(f, argnums=(0, 1, 2, 3))(
        coeffs, x, jnp.asarray(a), jnp.asarray(b))
    eps = 1e-6
    for i in [0, 1, 5, n - 1]:
        e = jnp.zeros(n).at[i].set(eps)
        num = (f(coeffs + e, x, a, b) - f(coeffs - e, x, a, b)) / (2 * eps)
        np.testing.assert_allclose(float(gc[i]), float(num), rtol=1e-5,
                                   atol=1e-9)
    e = jnp.zeros(17).at[3].set(eps)
    num = (f(coeffs, x + e, a, b) - f(coeffs, x - e, a, b)) / (2 * eps)
    np.testing.assert_allclose(float(gx[3]), float(num), rtol=1e-5)
    num = (f(coeffs, x, a + eps, b) - f(coeffs, x, a - eps, b)) / (2 * eps)
    np.testing.assert_allclose(float(ga), float(num), rtol=1e-5)
    num = (f(coeffs, x, a, b + eps) - f(coeffs, x, a, b - eps)) / (2 * eps)
    np.testing.assert_allclose(float(gb), float(num), rtol=1e-5)
    # clipped points: value still depends on coeffs, not on x
    x_out = jnp.asarray([0.1, 2.5])
    gxo = jax.grad(lambda xx: jnp.sum(chebeval(coeffs, xx, a, b)))(x_out)
    np.testing.assert_allclose(np.asarray(gxo), 0.0, atol=1e-12)
    gco = jax.grad(lambda c: jnp.sum(chebeval(c, x_out, a, b)))(coeffs)
    assert float(jnp.abs(gco).max()) > 0.0
