"""Cosmology model tests against closed forms and scipy quadrature oracles."""

import jax.numpy as jnp
import numpy as np
import pytest
import scipy.integrate

from chimera_tpu.models import FLRW, MGFLRW
from chimera_tpu.models import cosmology as cf

C = 299792.458e-3  # Gpc * (km/s/Mpc)


def _dc_quad(h0, om0, z, ok0=0.0, or0=0.0, w0=-1.0, wa=0.0):
    """Comoving distance via scipy quadrature (oracle)."""
    ode0 = 1.0 - om0 - or0 - ok0

    def inv_e(zz):
        w_z = w0 + wa * zz / (1 + zz)
        return 1.0 / np.sqrt(om0 * (1 + zz) ** 3 + or0 * (1 + zz) ** 4
                             + ok0 * (1 + zz) ** 2
                             + ode0 * (1 + zz) ** (3 * (1 + w_z)))

    return C / h0 * scipy.integrate.quad(inv_e, 0.0, z, epsabs=1e-12)[0]


def test_e_at_z_lcdm():
    c = FLRW.create(H0=70.0, Om0=0.3)
    z = jnp.array([0.0, 0.5, 1.0, 5.0])
    expect = np.sqrt(0.3 * (1 + np.asarray(z)) ** 3 + 0.7)
    np.testing.assert_allclose(np.asarray(cf.e_at_z(c, z)), expect, rtol=1e-12)


def test_comoving_distance_vs_quadrature():
    c = FLRW.create(H0=67.0, Om0=0.32, z_grid_res=8000)
    for z in [0.1, 0.5, 1.0, 3.0]:
        got = float(cf.comoving_distance(c, jnp.asarray(z)))
        expect = _dc_quad(67.0, 0.32, z)
        assert abs(got - expect) / expect < 2e-5


def test_luminosity_distance_eds_closed_form():
    # Einstein-de-Sitter (Om0=1): dL = 2 (c/H0)(1+z)(1 - 1/sqrt(1+z)).
    c = FLRW.create(H0=70.0, Om0=1.0, z_grid_res=20000)
    z = jnp.array([0.2, 1.0, 4.0])
    got = cf.dl_at_z(c, z)
    dh = C / 70.0
    expect = 2 * dh * (1 + np.asarray(z)) * (1 - 1 / np.sqrt(1 + np.asarray(z)))
    np.testing.assert_allclose(np.asarray(got), expect, rtol=5e-5)


def test_curved_cosmologies_distances():
    for ok0 in [0.1, -0.1]:
        c = FLRW.create(H0=70.0, Om0=0.3, Ok0=ok0, z_grid_res=8000)
        z = 1.0
        dcr = _dc_quad(70.0, 0.3, z, ok0=ok0)
        dh = C / 70.0
        s = np.sqrt(abs(ok0))
        if ok0 > 0:
            expect = dh / s * np.sinh(s * dcr / dh)
        else:
            expect = dh / s * np.sin(s * dcr / dh)
        got = float(cf.transverse_comoving_distance(c, jnp.asarray(z)))
        assert abs(got - expect) / expect < 5e-5


def test_dvcdz_is_derivative_of_vc():
    # FD step straddles many interp-table segments (the tables are piecewise
    # linear, so a tiny step would measure a single segment's slope).
    c = FLRW.create(H0=70.0, Om0=0.3, z_grid_res=8000)
    z = jnp.asarray(0.8)
    dz = 1e-2
    v1 = float(cf.comoving_volume(c, z + dz))
    v0 = float(cf.comoving_volume(c, z - dz))
    got = float(cf.differential_comoving_volume(c, z))
    assert abs(got - (v1 - v0) / (2 * dz)) / got < 2e-3


def test_ddl_dz_is_derivative_of_dl():
    c = FLRW.create(H0=70.0, Om0=0.3, z_grid_res=20000)
    z = jnp.asarray(0.7)
    dz = 1e-2
    num = (float(cf.dl_at_z(c, z + dz)) - float(cf.dl_at_z(c, z - dz))) / (2 * dz)
    got = float(cf.ddl_dz_at_z(c, z))
    assert abs(got - num) / num < 2e-3


def test_z_from_dgw_roundtrip():
    c = FLRW.create(H0=70.0, Om0=0.3, z_grid_res=10000)
    z = jnp.linspace(0.01, 5.0, 40)
    dl = cf.dl_at_z(c, z)
    z_back = cf.z_from_dgw(c, dl)
    np.testing.assert_allclose(np.asarray(z_back), np.asarray(z), rtol=1e-6)


def test_mg_flrw_xi_and_inversion():
    c = MGFLRW.create(H0=70.0, Om0=0.3, Xi0=1.8, n=2.5, z_grid_res=10000)
    z = jnp.linspace(0.01, 3.0, 20)
    xi = np.asarray(c.gw_distance_factor(z))
    expect_xi = 1.8 + (1 - 1.8) / (1 + np.asarray(z)) ** 2.5
    np.testing.assert_allclose(xi, expect_xi, rtol=1e-12)
    # GR limit: Xi0=1 reproduces FLRW distances exactly.
    c_gr = MGFLRW.create(H0=70.0, Om0=0.3, Xi0=1.0, n=2.5)
    c_f = FLRW.create(H0=70.0, Om0=0.3)
    np.testing.assert_allclose(np.asarray(cf.dl_at_z(c_gr, z)),
                               np.asarray(cf.dl_at_z(c_f, z)), rtol=1e-12)
    # Roundtrip through the modified distance relation.
    dgw = cf.dl_at_z(c, z)
    np.testing.assert_allclose(np.asarray(cf.z_from_dgw(c, dgw)),
                               np.asarray(z), rtol=1e-6)


def test_mg_ddl_dz_derivative():
    c = MGFLRW.create(H0=70.0, Om0=0.3, Xi0=0.6, n=1.9, z_grid_res=20000)
    z = jnp.asarray(0.9)
    dz = 1e-2
    num = (float(cf.dl_at_z(c, z + dz)) - float(cf.dl_at_z(c, z - dz))) / (2 * dz)
    got = float(cf.ddl_dz_at_z(c, z))
    assert abs(got - num) / abs(num) < 2e-3


def test_update_changes_tables():
    c = FLRW.create(H0=70.0)
    c2 = c.update(H0=100.0)
    assert float(c2.H0) == 100.0
    assert float(c.H0) == 70.0  # immutability
    z = jnp.asarray(1.0)
    assert float(cf.dl_at_z(c2, z)) < float(cf.dl_at_z(c, z))
    # irrelevant keys return self
    assert c.update(gamma=3.0) is c


def test_update_jit_and_grad():
    import jax

    def dl_of_h0(h0):
        c = FLRW.create(H0=h0, Om0=0.3)
        return cf.dl_at_z(c, jnp.asarray(1.0))

    dl = jax.jit(dl_of_h0)(jnp.asarray(70.0))
    g = jax.grad(dl_of_h0)(jnp.asarray(70.0))
    # dL ∝ 1/H0 at fixed z: d(dL)/dH0 = -dL/H0.
    np.testing.assert_allclose(float(g), -float(dl) / 70.0, rtol=1e-10)


def test_distances_de_modification():
    """theta_src with original_distances: dVdz computed from measured dGW."""
    c = MGFLRW.create(H0=70.0, Om0=0.3, Xi0=1.5, n=2.0, z_grid_res=10000)
    z = jnp.linspace(0.1, 2.0, 10)
    dgw = cf.dl_at_z(c, z)
    via_dist = cf.differential_comoving_volume(c, z, distances=dgw)
    via_table = cf.differential_comoving_volume(c, z)
    np.testing.assert_allclose(np.asarray(via_dist), np.asarray(via_table),
                               rtol=1e-6)
