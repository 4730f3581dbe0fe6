"""Mass- and rate-model tests against analytic oracles."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.integrate

from chimera_tpu.models import (
    BrokenPowerLaw,
    MadauDickinsonRate,
    PowerLawPeak,
    PowerLawRate,
    PowerLawSpline,
    PowerLawTwoPeaks,
    TruncatedMadauDickinsonRate,
    TruncatedPowerLawRate,
    TruncatedPowerLaw,
    p_m1m2,
)
from chimera_tpu.models.mass import smoothing, tpl_cdf, tpl_unnorm
from chimera_tpu.ops import trapz

ALL_MASS_MODELS = [TruncatedPowerLaw, BrokenPowerLaw, PowerLawPeak,
                   PowerLawTwoPeaks, PowerLawSpline]


def test_tpl_cdf_analytic():
    # CDF at m_high equals the pdf normalization.
    alpha, m_lo, m_hi = -2.3, 5.0, 80.0
    expect = (m_hi ** (1 + alpha) - m_lo ** (1 + alpha)) / (1 + alpha)
    got = float(tpl_cdf(jnp.asarray(alpha), jnp.asarray(m_lo), jnp.asarray(m_hi)))
    assert abs(got - expect) / expect < 1e-12
    # alpha = -1 log branch
    got = float(tpl_cdf(jnp.asarray(-1.0), jnp.asarray(5.0), jnp.asarray(80.0)))
    assert abs(got - (np.log(5.0) - np.log(80.0))) < 1e-12


def test_smoothing_window_limits():
    m_low, dm = 5.0, 4.0
    m = jnp.array([4.0, 5.0, 7.0, 9.5, 50.0])
    s = np.asarray(smoothing(m, dm, m_low))
    assert s[0] == 0.0  # below m_low
    assert s[1] == 0.0  # at m_low the window vanishes
    assert 0.0 < s[2] < 1.0
    assert s[4] == 1.0  # far above m_low + delta_m


@pytest.mark.parametrize("model_cls", ALL_MASS_MODELS)
def test_primary_pdf_normalization(model_cls):
    m = model_cls.create()
    # norm_p_m1 equals trapz of the unnormalized pdf on the model grid.
    pdf = m.primary_pdf_unnorm(m.m_grid)
    np.testing.assert_allclose(float(trapz(pdf, m.m_grid)),
                               float(m.norm_p_m1), rtol=1e-12)
    assert float(m.norm_p_m1) > 0


@pytest.mark.parametrize("model_cls", ALL_MASS_MODELS)
def test_joint_pdf_integrates_to_one(model_cls):
    """∫∫ p(m1, m2) dm2 dm1 == 1 (the CDF-table normalization is exact)."""
    m = model_cls.create()
    m1 = jnp.logspace(jnp.log10(m.m_low), jnp.log10(m.m_high), 600)
    m2 = jnp.logspace(jnp.log10(m.m_low), jnp.log10(m.m_high), 500)
    pj = p_m1m2(m, m1[:, None], m2[None, :])
    inner = trapz(pj, m2[None, :], axis=-1)
    total = float(trapz(inner, m1))
    # Un-smoothed models (tpl) have sharp power-law edges at m_low where the
    # outer test grid under-resolves; smoothed models integrate tighter.
    tol = 2e-2 if model_cls is TruncatedPowerLaw else 5e-3
    assert abs(total - 1.0) < tol


def test_p_m1m2_zero_outside_support():
    m = PowerLawPeak.create()
    vals = p_m1m2(m, jnp.array([2.0, 200.0, 30.0]), jnp.array([1.0, 100.0, 40.0]))
    v = np.asarray(vals)
    assert v[0] == 0.0 and v[1] == 0.0
    assert v[2] == 0.0  # m2 > m1 forbidden


def test_p_m1m2_no_nans():
    m = PowerLawPeak.create()
    m1 = jnp.linspace(0.1, 200.0, 300)
    m2 = jnp.linspace(0.1, 200.0, 300)
    vals = p_m1m2(m, m1, m2)
    assert not bool(jnp.any(jnp.isnan(vals)))


def test_mass_update_and_grad():
    m = PowerLawPeak.create()
    m2 = m.update(alpha=2.0, mu_g=40.0)
    assert float(m2.alpha) == 2.0 and float(m2.mu_g) == 40.0
    assert m.update(H0=80.0) is m  # irrelevant keys

    def logp(alpha):
        mm = m.update(alpha=alpha)
        return jnp.log(p_m1m2(mm, jnp.asarray(35.0), jnp.asarray(25.0)))

    g = jax.grad(logp)(jnp.asarray(3.4))
    assert np.isfinite(float(g))


def test_spline_model_perturbation():
    base = PowerLawSpline.create(num_knots=6)
    pert = PowerLawSpline.create(num_knots=6,
                                 spline_coeffs=jnp.full((6,), 0.5))
    m1 = jnp.asarray(30.0)
    m2 = jnp.asarray(20.0)
    # Perturbed model differs but both are normalized.
    assert float(p_m1m2(base, m1, m2)) != float(p_m1m2(pert, m1, m2))
    for m in (base, pert):
        g1 = jnp.logspace(jnp.log10(m.m_low), jnp.log10(m.m_high), 400)
        pdf = m.primary_pdf_unnorm(g1) / m.norm_p_m1
        assert abs(float(trapz(pdf, g1)) - 1.0) < 1e-3


def test_rate_models():
    z = jnp.linspace(0.0, 5.0, 100)
    pl = PowerLawRate.create(gamma=2.0)
    np.testing.assert_allclose(np.asarray(pl.rate(z)), (1 + np.asarray(z)) ** 2,
                               rtol=1e-12)
    md = MadauDickinsonRate.create()
    np.testing.assert_allclose(float(md.rate(jnp.asarray(0.0))), 1.0, rtol=1e-12)
    # MD turns over after zp.
    r = np.asarray(md.rate(z))
    assert r.argmax() > 0 and z[r.argmax()] < 4.0

    tmd = TruncatedMadauDickinsonRate.create(zmax=1.3)
    assert float(tmd.rate(jnp.asarray(2.0))) == 0.0
    assert float(tmd.rate(jnp.asarray(1.0))) > 0.0

    tpl_r = TruncatedPowerLawRate.create(gamma=1.9, zmax=1.3)
    assert float(tpl_r.rate(jnp.asarray(1.5))) == 0.0
    # normalized: ∫ pdf dz over [0, zmax] == 1
    # trapz across the truncation discontinuity at zmax leaves an O(dz) gap
    zz = jnp.linspace(0.0, 1.3, 20001)
    total = float(trapz(tpl_r.rate(zz), zz))
    assert abs(total - 1.0) < 1e-4


def test_rate_update():
    md = MadauDickinsonRate.create()
    md2 = md.update(gamma=3.0)
    assert float(md2.gamma) == 3.0
    assert md.update(H0=70) is md
