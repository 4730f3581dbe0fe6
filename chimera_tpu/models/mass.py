"""Source-frame mass models as functional pytrees.

Capability parity with CHIMERA/population/mass.py (models at :56-233,
primitives at :240-279, ``p_m1m2`` at :334-345), redesigned as frozen-dataclass
pytrees with class-polymorphic PDFs instead of plum dispatch.

All models are *paired*: p(m1, m2) = p(m1) p(m2 | m1) with the m2 | m1
conditional normalized through a precomputed CDF table — the conditional's
shape does not depend on m1 below the cutoff, so CDF(m1) evaluated on a fixed
log-m grid normalizes it exactly (the reference's trick, mass.py:45-52).
Tables are rebuilt inside ``update`` and therefore traced into the jitted
hyper-likelihood graph: a new mass hyper-sample is pure XLA.

Two reference bugs are *not* replicated (SURVEY.md 2.4):
* ``pl2p`` primary pdf referenced undefined variables (mass.py:310-313) —
  implemented correctly here;
* ``pls`` normalization was left unimplemented (mass.py:225-226) — completed
  here with a log-space perturbation spline on fixed knots.
"""

from __future__ import annotations

from typing import ClassVar

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array

from chimera_tpu import pytree
from chimera_tpu.ops.chebyshev import cheb_nodes, chebeval, chebfit_from_values
from chimera_tpu.ops.integrate import cumtrapz, trapz

# ---------------------------------------------------------------------------
# Primitives (mass.py:240-279)
# ---------------------------------------------------------------------------


def _powx(x: Array, a: Array) -> Array:
    """x**a for x > 0 as exp(a log x) — the lowering XLA uses for powf
    anyway, written out because Mosaic (Pallas TPU) has no powf primitive
    and this code runs inside the fused kernel (ops/pallas/fused.py)."""
    return jnp.exp(a * jnp.log(x))


def tpl_unnorm(m: Array, alpha: Array, m_low: Array, m_high: Array) -> Array:
    """Truncated power law m^alpha on [m_low, m_high] (not normalized)."""
    return jnp.where((m_low <= m) & (m <= m_high),
                     _powx(jnp.maximum(m, 1e-30), alpha), 0.0)


def tpl_cdf(alpha: Array, m_low: Array, m: Array) -> Array:
    """Unnormalized CDF of the truncated power law, analytic."""
    mp = jnp.maximum(m, 1e-30)
    return jnp.where(
        alpha == -1.0,
        jnp.log(m_low) - jnp.log(mp),
        (_powx(mp, 1.0 + alpha) - _powx(m_low, 1.0 + alpha)) / (1.0 + alpha),
    )


def smoothing(m: Array, delta_m: Array, m_low: Array) -> Array:
    """LVK low-mass turn-on window (mass.py:255-264).

    The boundary m == m_low + delta_m takes the continuous limit S = 1
    (the reference's eps-regularized formula evaluates to 0 at exactly that
    point — a measure-zero artifact its examples never hit, but our window
    quadrature nodes land on it).
    """
    eps = 1e-99
    log_s = jnp.where(
        m < m_low,
        -jnp.inf,
        jnp.where(
            m >= (m_low + delta_m),
            0.0,
            -jnp.logaddexp(
                0.0,
                delta_m / (m - m_low + eps) + delta_m / (m - m_low - delta_m + eps),
            ),
        ),
    )
    return jnp.exp(log_s)


def gaussian(x: Array, mu: Array, sigma: Array) -> Array:
    log_g = -0.5 * jnp.log(2.0 * jnp.pi) - jnp.log(sigma) - (x - mu) ** 2 / (2.0 * sigma**2)
    return jnp.exp(log_g)


def truncated_gaussian_norm(mu: Array, sigma: Array, x_min: Array,
                            x_max: Array) -> Array:
    """Mass of N(mu, sigma) on [x_min, x_max].  Scalar in all uses (depends
    only on hyper-parameters) — precomputed at ``update`` time so ``erf``
    never appears in the per-sample path (Pallas TPU has no erf lowering)."""
    hi = (x_max - mu) / (sigma * jnp.sqrt(2.0))
    lo = (x_min - mu) / (sigma * jnp.sqrt(2.0))
    return 0.5 * jax.scipy.special.erf(hi) - 0.5 * jax.scipy.special.erf(lo)


def truncated_gaussian(x: Array, mu: Array, sigma: Array, x_min: Array,
                       x_max: Array, norm: Array | None = None) -> Array:
    if norm is None:
        norm = truncated_gaussian_norm(mu, sigma, x_min, x_max)
    return jnp.where((x_min <= x) & (x <= x_max), gaussian(x, mu, sigma) / norm, 0.0)


# ---------------------------------------------------------------------------
# Base model
# ---------------------------------------------------------------------------


@pytree.dataclass
class BaseMassModel:
    """Shared machinery: parameter update + normalization tables."""

    m_low: Array = 5.1
    m_high: Array = 87.0
    m_grid: Array | None = None
    cdf_m2_conditioned: Array | None = None
    norm_p_m1: Array | None = None
    # analytic-CDF engine state (gather-free hot path; see conditional_cdf_at)
    m_join: Array | None = None
    cdf_at_join: Array | None = None
    cheb_cdf_window: Array | None = None
    grid_res: int = pytree.static_field(default=1000)
    # 'analytic': piecewise closed-form + Chebyshev window segment — zero
    # per-sample gathers (TPU-fast).  'table': linear interp into the CDF
    # table (the reference's semantics, mass.py:334-345).
    cdf_engine: str = pytree.static_field(default="analytic")
    window_deg: int = pytree.static_field(default=48)

    name: ClassVar[str] = "base_mass"
    hyper_keys: ClassVar[tuple[str, ...]] = ("m_low", "m_high")
    config_keys: ClassVar[tuple[str, ...]] = ("grid_res", "cdf_engine",
                                              "window_deg")

    @classmethod
    def create(cls, **kwargs):
        defaults = {k: getattr(cls, k) for k in cls.hyper_keys + cls.config_keys}
        unknown = set(kwargs) - set(defaults)
        if unknown:
            raise TypeError(f"unknown mass parameters: {sorted(unknown)}")
        params = dict(defaults)
        params.update(kwargs)
        obj = cls(**params)
        return obj._with_norm_consts()._with_tables()

    def _with_norm_consts(self):
        """Hook: precompute scalar normalization constants that depend only
        on hyper-parameters (e.g. truncated-Gaussian peak masses), so the
        per-sample pdf path stays free of special functions."""
        return self

    def _with_tables(self):
        """Tabulate the m2|m1 CDF and the p(m1) normalization (mass.py:45-52),
        plus the analytic-engine pieces (window-segment Chebyshev fit)."""
        mg = jnp.logspace(
            jnp.log10(self.m_low), jnp.log10(self.m_high), self.grid_res
        )
        obj = pytree.replace(self, m_grid=mg)
        cdf = cumtrapz(obj.secondary_conditioned_pdf_unnorm(mg, obj.m_high), mg)
        norm = trapz(obj.primary_pdf_unnorm(mg), mg)
        obj = pytree.replace(obj, cdf_m2_conditioned=cdf, norm_p_m1=norm)
        if obj.cdf_engine == "analytic":
            obj = obj._with_analytic_cdf()
        return obj

    def _with_analytic_cdf(self):
        """Fit the non-analytic CDF segment: below m_join = m_low + delta_m
        the conditional is window-suppressed (no closed form); above it the
        window is identically 1 and the CDF continues as the exact truncated
        power law.

        The segment CDF values at the fit nodes come from per-node
        Gauss-Legendre quadrature, CDF(m) = (m - m_low) * mean(pdf on
        [m_low, m]) — a positive smooth sum with no long f32 accumulation
        (a dense cumtrapz carries a ~1e-6 systematic into every weight;
        SURVEY.md 7.3-1)."""
        delta = getattr(self, "delta_m", 0.0)
        m_join = jnp.clip(self.m_low + jnp.maximum(delta, 1e-6), None,
                          self.m_high)
        gl_x, gl_w = np.polynomial.legendre.leggauss(96)
        gl_x = jnp.asarray(0.5 * (gl_x + 1.0))
        gl_w = jnp.asarray(0.5 * gl_w)
        nodes = cheb_nodes(self.window_deg, self.m_low, m_join)
        span = nodes - self.m_low                        # (K,)
        m_eval = self.m_low + span[:, None] * gl_x[None, :]
        pdf = self.secondary_conditioned_pdf_unnorm(m_eval, self.m_high)
        cdf_nodes = span * jnp.sum(gl_w[None, :] * pdf, axis=-1)
        cheb = chebfit_from_values(cdf_nodes)
        cdf_at_join = (m_join - self.m_low) * jnp.sum(
            gl_w * self.secondary_conditioned_pdf_unnorm(
                self.m_low + (m_join - self.m_low) * gl_x, self.m_high))
        return pytree.replace(self, m_join=m_join, cdf_at_join=cdf_at_join,
                              cheb_cdf_window=cheb)

    def conditional_cdf_at(self, m1: Array) -> Array:
        """CDF of the m2|m1 conditional evaluated at m1 — the normalization
        of p(m2|m1) (mass.py:339).  Clamps like the reference's interp."""
        if self.cdf_engine == "table":
            return jnp.interp(m1, self.m_grid, self.cdf_m2_conditioned)
        m1c = jnp.clip(m1, self.m_low, self.m_high)
        below = chebeval(self.cheb_cdf_window, m1c, self.m_low, self.m_join)
        above = self.cdf_at_join + tpl_cdf(self.beta, self.m_join, m1c)
        return jnp.where(m1c <= self.m_join, below, above)

    @property
    def as_dict(self) -> dict:
        return {k: getattr(self, k) for k in self.hyper_keys + self.config_keys}

    def update(self, **hyper):
        relevant = {k: v for k, v in hyper.items()
                    if k in self.hyper_keys + self.config_keys}
        if not relevant:
            return self
        merged = self.as_dict
        merged.update(relevant)
        return type(self).create(**merged)

    # subclasses implement:
    def primary_pdf_unnorm(self, m: Array) -> Array:  # pragma: no cover
        raise NotImplementedError

    def secondary_conditioned_pdf_unnorm(self, m2: Array, m1: Array) -> Array:
        """Default m2 | m1 conditional: smoothed power law m2^beta on
        [m_low, m1] (mass.py:320-328)."""
        pdf = tpl_unnorm(m2, self.beta, self.m_low, m1)
        return pdf * smoothing(m2, self.delta_m, self.m_low)


# ---------------------------------------------------------------------------
# Concrete models
# ---------------------------------------------------------------------------


@pytree.dataclass
class TruncatedPowerLaw(BaseMassModel):
    """p(m1) ∝ m1^-alpha on [m_low, m_high]; p(m2|m1) ∝ m2^beta (mass.py:56-83)."""

    alpha: Array = 2.5
    beta: Array = 1.1

    name: ClassVar[str] = "truncated_power_law"
    hyper_keys: ClassVar[tuple[str, ...]] = BaseMassModel.hyper_keys + ("alpha", "beta")

    def primary_pdf_unnorm(self, m: Array) -> Array:
        return tpl_unnorm(m, -self.alpha, self.m_low, self.m_high)

    def secondary_conditioned_pdf_unnorm(self, m2: Array, m1: Array) -> Array:
        # No smoothing window in the reference tpl model (mass.py:320-322).
        return tpl_unnorm(m2, self.beta, self.m_low, m1)

    def _with_analytic_cdf(self):
        return self  # fully closed-form; nothing to fit

    def conditional_cdf_at(self, m1: Array) -> Array:
        if self.cdf_engine == "table":
            return jnp.interp(m1, self.m_grid, self.cdf_m2_conditioned)
        return tpl_cdf(self.beta, self.m_low,
                       jnp.clip(m1, self.m_low, self.m_high))


@pytree.dataclass
class BrokenPowerLaw(BaseMassModel):
    """Broken power law with smoothing (mass.py:85-115, 289-297)."""

    alpha_1: Array = 1.6
    alpha_2: Array = 5.6
    beta: Array = 1.1
    delta_m: Array = 4.8
    break_fraction: Array = 0.43

    name: ClassVar[str] = "broken_power_law"
    hyper_keys: ClassVar[tuple[str, ...]] = BaseMassModel.hyper_keys + (
        "alpha_1", "alpha_2", "beta", "delta_m", "break_fraction")

    def primary_pdf_unnorm(self, m: Array) -> Array:
        m_break = self.m_low + self.break_fraction * (self.m_high - self.m_low)
        pl1_at_break = tpl_unnorm(m_break, -self.alpha_1, self.m_low, m_break)
        pl2_at_break = tpl_unnorm(m_break, -self.alpha_2, m_break, self.m_high)
        pdf = tpl_unnorm(m, -self.alpha_1, self.m_low, m_break)
        pdf += tpl_unnorm(m, -self.alpha_2, m_break, self.m_high) * pl1_at_break / pl2_at_break
        return pdf * smoothing(m, self.delta_m, self.m_low)


@pytree.dataclass
class PowerLawPeak(BaseMassModel):
    """LVK power-law + Gaussian peak (mass.py:117-149, 299-305)."""

    lambda_peak: Array = 0.039
    alpha: Array = 3.4
    beta: Array = 1.1
    delta_m: Array = 4.8
    mu_g: Array = 34.0
    sigma_g: Array = 3.6
    peak_norm: Array | None = None

    name: ClassVar[str] = "power_law_plus_peak"
    hyper_keys: ClassVar[tuple[str, ...]] = BaseMassModel.hyper_keys + (
        "lambda_peak", "alpha", "beta", "delta_m", "mu_g", "sigma_g")

    def _with_norm_consts(self):
        return pytree.replace(self, peak_norm=truncated_gaussian_norm(
            self.mu_g, self.sigma_g, self.m_low,
            self.mu_g + 5.0 * self.sigma_g))

    def primary_pdf_unnorm(self, m: Array) -> Array:
        pl = tpl_unnorm(m, -self.alpha, self.m_low, self.m_high) / tpl_cdf(
            -self.alpha, self.m_low, self.m_high)
        peak = truncated_gaussian(
            m, self.mu_g, self.sigma_g, self.m_low,
            self.mu_g + 5.0 * self.sigma_g, norm=self.peak_norm)
        pdf = (1.0 - self.lambda_peak) * pl + self.lambda_peak * peak
        return pdf * smoothing(m, self.delta_m, self.m_low)


@pytree.dataclass
class PowerLawTwoPeaks(BaseMassModel):
    """Power law + two Gaussian peaks (mass.py:151-189; the reference's pdf
    at :308-314 referenced undefined variables — corrected here)."""

    lambda_peak: Array = 0.05
    lambda1: Array = 0.5
    alpha: Array = 3.4
    beta: Array = 1.1
    delta_m: Array = 4.8
    mu1_g: Array = 34.0
    sigma1_g: Array = 3.6
    mu2_g: Array = 68.0
    sigma2_g: Array = 3.0
    peak1_norm: Array | None = None
    peak2_norm: Array | None = None

    name: ClassVar[str] = "power_law_plus_double_peak"
    hyper_keys: ClassVar[tuple[str, ...]] = BaseMassModel.hyper_keys + (
        "lambda_peak", "lambda1", "alpha", "beta", "delta_m",
        "mu1_g", "sigma1_g", "mu2_g", "sigma2_g")

    def _with_norm_consts(self):
        return pytree.replace(
            self,
            peak1_norm=truncated_gaussian_norm(
                self.mu1_g, self.sigma1_g, self.m_low,
                self.mu1_g + 5.0 * self.sigma1_g),
            peak2_norm=truncated_gaussian_norm(
                self.mu2_g, self.sigma2_g, self.m_low,
                self.mu2_g + 5.0 * self.sigma2_g))

    def primary_pdf_unnorm(self, m: Array) -> Array:
        pl = tpl_unnorm(m, -self.alpha, self.m_low, self.m_high) / tpl_cdf(
            -self.alpha, self.m_low, self.m_high)
        g1 = truncated_gaussian(
            m, self.mu1_g, self.sigma1_g, self.m_low,
            self.mu1_g + 5.0 * self.sigma1_g, norm=self.peak1_norm)
        g2 = truncated_gaussian(
            m, self.mu2_g, self.sigma2_g, self.m_low,
            self.mu2_g + 5.0 * self.sigma2_g, norm=self.peak2_norm)
        pdf = (
            (1.0 - self.lambda_peak) * pl
            + self.lambda_peak * self.lambda1 * g1
            + self.lambda_peak * (1.0 - self.lambda1) * g2
        )
        return pdf * smoothing(m, self.delta_m, self.m_low)


@pytree.dataclass
class PowerLawSpline(BaseMassModel):
    """Semi-parametric power law x exp(spline perturbation) (mass.py:193-233;
    the reference left normalization unimplemented — completed here).

    The perturbation is a piecewise-linear interpolation of ``spline_coeffs``
    over ``num_knots`` log-spaced knots in log(m), pinned to zero at both
    edge knots, applied multiplicatively in log-space:
    p(m1) ∝ m1^-alpha * S(m1) * exp(f(log m1)).
    Normalization reuses the shared table machinery.
    """

    alpha: Array = 3.4
    beta: Array = 1.1
    delta_m: Array = 4.8
    spline_coeffs: Array | None = None
    num_knots: int = pytree.static_field(default=10)

    name: ClassVar[str] = "power_law_plus_spline"
    hyper_keys: ClassVar[tuple[str, ...]] = BaseMassModel.hyper_keys + (
        "alpha", "beta", "delta_m", "spline_coeffs")
    config_keys: ClassVar[tuple[str, ...]] = BaseMassModel.config_keys + ("num_knots",)

    @classmethod
    def create(cls, **kwargs):
        num_knots = kwargs.get("num_knots", cls.num_knots)
        coeffs = kwargs.get("spline_coeffs")
        if coeffs is None:
            coeffs = jnp.zeros((num_knots,))
        kwargs["spline_coeffs"] = jnp.asarray(coeffs)
        return super().create(**kwargs)

    def _knots(self) -> Array:
        return jnp.linspace(jnp.log(self.m_low), jnp.log(self.m_high), self.num_knots + 2)

    def _perturbation(self, m: Array) -> Array:
        # Edge knots pinned to zero (reference pads coeffs, mass.py:221-223).
        full = jnp.concatenate(
            [jnp.zeros((1,)), jnp.atleast_1d(self.spline_coeffs), jnp.zeros((1,))])
        return jnp.interp(jnp.log(jnp.maximum(m, 1e-30)), self._knots(), full)

    def primary_pdf_unnorm(self, m: Array) -> Array:
        pdf = tpl_unnorm(m, -self.alpha, self.m_low, self.m_high)
        pdf *= smoothing(m, self.delta_m, self.m_low)
        return pdf * jnp.exp(self._perturbation(m))


# ---------------------------------------------------------------------------
# Joint pdf — the function the likelihood calls per PE sample (mass.py:334-345)
# ---------------------------------------------------------------------------


def p_m1m2(mass: BaseMassModel, m1: Array, m2: Array) -> Array:
    """Normalized joint pdf p(m1) p(m2 | m1) with 0/0 -> 0 guard.

    The degenerate-conditional guard is applied to the *divisor itself*
    (cdf <= 0 -> divide by 1, then zero the row), not just the quotient: a
    0/0 division whose NaN is masked afterwards still poisons backward
    passes (d(p2/cdf)/d(cdf) = NaN times a zero cotangent = NaN), and the
    hyper-likelihood is differentiated end-to-end (HMC)."""
    p1 = mass.primary_pdf_unnorm(m1) / mass.norm_p_m1
    p21 = mass.secondary_conditioned_pdf_unnorm(m2, m1)
    cdf = mass.conditional_cdf_at(m1)
    ok = cdf > 0.0
    p21 = p21 / jnp.where(ok, cdf, 1.0)
    # Degenerate conditional at m1 -> m_low (zero-width support): the density
    # spikes as 1/(m1 - m_low); define it as 0 like the reference's table
    # clamp does (mass.py:339-340), and scrub inf/0-division artifacts.
    p21 = jnp.where(ok & (m1 > mass.m_low * (1.0 + 1e-9)), p21, 0.0)
    p21 = jnp.where(jnp.isfinite(p21), p21, 0.0)
    return p1 * p21


def pdf_joint_and_marginals(mass: BaseMassModel, res: tuple[int, int] = (5000, 2500)):
    """Joint + marginal pdfs on a dense grid (plot helper, mass.py:351-362)."""
    m1 = jnp.linspace(mass.m_low, mass.m_high, res[0])
    m2 = jnp.linspace(mass.m_low, mass.m_high, res[1])
    m1m, m2m = jnp.meshgrid(m1, m2)
    pj = p_m1m2(mass, m1m, m2m)
    p1 = trapz(pj, x=m2, axis=0)
    p1 = p1 / trapz(p1, x=m1)
    p2 = trapz(pj, x=m1, axis=1)
    p2 = p2 / trapz(p2, x=m2)
    return {"m1": m1, "m2": m2, "m1mesh": m1m, "m2mesh": m2m,
            "p_joint": pj, "p_m1_marg": p1, "p_m2_marg": p2}
