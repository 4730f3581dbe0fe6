"""Mock GW catalog / injection-set generation for tests and benchmarks.

The reference validates against Zenodo-hosted O5-like mock data
(reference examples/test1dspectral.ipynb cell 1; files listed in SURVEY.md
2.4).  Those files are unreachable here, so this module generates equivalent
mocks *from the population model itself*: events drawn from
p(z) ∝ dV_C/dz psi(z)/(1+z) and p(m1, m2 | lambda_m), smeared into PE-sample
clouds, plus an injection set with an analytic p_draw and an SNR-proxy
detection cut.  All randomness flows through explicit jax.random keys
(replacing the reference's unseeded numpy draws — SURVEY.md 5.2).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import Array

from chimera_tpu.data.structs import ThetaInjDet, ThetaPEDet
from chimera_tpu.models import cosmology as cosmo_fns
from chimera_tpu.models.mass import BaseMassModel
from chimera_tpu.models.population import Population
from chimera_tpu.ops.integrate import cumtrapz


def _inverse_cdf_sample(key, pdf_vals: Array, grid: Array, n: int) -> Array:
    """Draw n samples from a tabulated 1-D pdf via inverse-CDF interpolation."""
    cdf = cumtrapz(pdf_vals, grid)
    cdf = cdf / cdf[-1]
    u = jax.random.uniform(key, (n,))
    return jnp.interp(u, cdf, grid)


def sample_source_frame(key, pop: Population, n: int,
                        z_grid_res: int = 4000,
                        z_max: float | None = None) -> dict:
    """Draw (z, m1, m2) from the population model.

    ``z_max`` truncates the redshift draw to the detectable neighborhood
    (the full p(z) support extends to cosmo.z_max where nothing passes the
    SNR cut — sampling there just wastes the oversampling budget)."""
    kz, k1, k2 = jax.random.split(key, 3)
    if z_max is None:
        z_max = min(float(pop.cosmo.z_max), 2.5)
    zz = jnp.linspace(1e-4, z_max, z_grid_res)
    p_z = (cosmo_fns.differential_comoving_volume(pop.cosmo, zz)
           * pop.rate.rate(zz) / (1.0 + zz))
    z = _inverse_cdf_sample(kz, p_z, zz, n)

    mass: BaseMassModel = pop.mass
    p_m1 = mass.primary_pdf_unnorm(mass.m_grid)
    m1 = _inverse_cdf_sample(k1, p_m1, mass.m_grid, n)
    # m2 | m1 through the conditional CDF table (see mass.py design note):
    u = jax.random.uniform(k2, (n,))
    cdf_at_m1 = jnp.interp(m1, mass.m_grid, mass.cdf_m2_conditioned)
    target = u * cdf_at_m1
    m2 = jnp.interp(target, mass.cdf_m2_conditioned, mass.m_grid)
    return {"z": z, "m1": m1, "m2": m2}


def _snr_proxy(m1det: Array, m2det: Array, dgw: Array, dgw_ref: float = 5.0
               ) -> Array:
    """Toy optimal-SNR proxy ~ Mc_det^(5/6) / dGW, scaled so an equal-mass
    30+30 Msun binary at dgw_ref Gpc has SNR 8 (an O5-like horizon)."""
    mc = (m1det * m2det) ** 0.6 / (m1det + m2det) ** 0.2
    mc_ref = (30.0 * 30.0) ** 0.6 / 60.0 ** 0.2
    return 8.0 * (mc / mc_ref) ** (5.0 / 6.0) * (dgw_ref / dgw)


def make_mock_catalog(
    key,
    pop: Population,
    n_events: int = 100,
    n_samples: int = 1000,
    snr_threshold: float = 12.0,
    sigma_dl: float = 0.1,
    sigma_m: float = 0.05,
    sigma_sky_rad: float = 0.05,
    oversample: int = 300,
    return_truths: bool = False,
):
    """Generate a detected GW catalog with PE-sample clouds.

    Detection uses the SNR proxy with Gaussian measurement noise, so the
    returned catalog genuinely carries Malmquist selection (needed for
    end-to-end fiducial-recovery tests).  PE samples are log-normal clouds
    around the true detector-frame values with uncertainties scaled by
    8/SNR; the PE prior is flat (pe_prior = 1).
    """
    keys = jax.random.split(key, 8)
    n_draw = n_events * oversample
    src = sample_source_frame(keys[0], pop, n_draw)
    dgw = cosmo_fns.dl_at_z(pop.cosmo, src["z"])
    m1d = src["m1"] * (1.0 + src["z"])
    m2d = src["m2"] * (1.0 + src["z"])
    snr_true = _snr_proxy(m1d, m2d, dgw)
    snr_obs = snr_true + jax.random.normal(keys[1], snr_true.shape)
    n_det = int(jnp.sum(snr_obs > snr_threshold))
    if n_det < n_events:
        raise ValueError(
            f"only {n_det} of {n_draw} mock draws pass SNR > {snr_threshold}; "
            "raise `oversample` or lower the threshold")
    detected = jnp.nonzero(snr_obs > snr_threshold, size=n_events,
                           fill_value=0)[0]

    m1d, m2d, dgw = m1d[detected], m2d[detected], dgw[detected]
    snr = jnp.maximum(snr_obs[detected], snr_threshold)
    # Per-event fractional uncertainties shrink with SNR.
    s_dl = sigma_dl * (12.0 / snr)[:, None]
    s_m = sigma_m * (12.0 / snr)[:, None]

    eps = jax.random.normal(keys[2], (n_events, n_samples, 3))
    dl_pe = dgw[:, None] * jnp.exp(s_dl * eps[..., 0] - 0.5 * s_dl**2)
    m1_pe = m1d[:, None] * jnp.exp(s_m * eps[..., 1] - 0.5 * s_m**2)
    m2_pe = m2d[:, None] * jnp.exp(s_m * eps[..., 2] - 0.5 * s_m**2)
    m1_pe, m2_pe = (jnp.maximum(m1_pe, m2_pe), jnp.minimum(m1_pe, m2_pe))

    # Sky: random event centers, Gaussian PE scatter around them.
    ra_c = jax.random.uniform(keys[3], (n_events, 1), minval=0.0,
                              maxval=2.0 * jnp.pi)
    dec_c = jnp.arcsin(jax.random.uniform(keys[4], (n_events, 1),
                                          minval=-1.0, maxval=1.0))
    ra = ra_c + sigma_sky_rad * jax.random.normal(keys[5], (n_events, n_samples)) \
        / jnp.maximum(jnp.cos(dec_c), 0.1)
    dec = dec_c + sigma_sky_rad * jax.random.normal(keys[6], (n_events, n_samples))
    ra = jnp.mod(ra, 2.0 * jnp.pi)
    dec = jnp.clip(dec, -0.5 * jnp.pi + 1e-6, 0.5 * jnp.pi - 1e-6)

    theta = ThetaPEDet(
        m1det=m1_pe, m2det=m2_pe, dL=dl_pe, ra=ra, dec=dec,
        theta=0.5 * jnp.pi - dec, phi=ra,
        pe_prior=jnp.ones_like(dl_pe),
    )
    if not return_truths:
        return theta
    truths = {
        "z": src["z"][detected], "m1": src["m1"][detected],
        "m2": src["m2"][detected], "dgw": dgw,
        "ra": ra_c[:, 0], "dec": dec_c[:, 0],
    }
    return theta, truths


def make_mock_galaxies(
    key,
    pop: Population,
    truths: dict,
    n_background: int = 50_000,
    z_max: float = 1.5,
    z_scatter: float = 0.001,
) -> dict:
    """Galaxy catalog containing the events' host galaxies plus a uniform
    comoving-volume background — the dark-siren analog of the reference's
    MICE-based mock catalogs (examples/test1dgalaxies.ipynb).

    Hosts sit at the events' true (ra, dec, z) with a small z scatter;
    background galaxies are isotropic with p(z) ∝ dV_C/dz up to z_max.
    Returns {'ra', 'dec', 'z'} in radians.
    """
    k1, k2, k3, k4 = jax.random.split(key, 4)
    zz = jnp.linspace(1e-4, z_max, 2000)
    pdf = cosmo_fns.differential_comoving_volume(pop.cosmo, zz)
    z_bkg = _inverse_cdf_sample(k1, pdf, zz, n_background)
    ra_bkg = jax.random.uniform(k2, (n_background,), minval=0.0,
                                maxval=2.0 * jnp.pi)
    dec_bkg = jnp.arcsin(jax.random.uniform(k3, (n_background,),
                                            minval=-1.0, maxval=1.0))
    z_host = truths["z"] * (1.0 + z_scatter * jax.random.normal(
        k4, truths["z"].shape))
    return {
        "ra": jnp.concatenate([truths["ra"], ra_bkg]),
        "dec": jnp.concatenate([truths["dec"], dec_bkg]),
        "z": jnp.concatenate([z_host, z_bkg]),
    }


def make_mock_injections(
    key,
    pop: Population,
    n_generated: int = 200_000,
    snr_threshold: float = 12.0,
    m_range: tuple = (2.0, 200.0),
    dgw_max: float | None = None,
) -> tuple[ThetaInjDet, int]:
    """Generate an injection set with analytic draw probabilities.

    Draw distribution (detector frame): log-uniform m1det and m2det on
    ``m_range`` (m2 <= m1 by swap, doubling density off-diagonal), and
    dGW ~ p(d) = 3 d^2 / dgw_max^3 (uniform in Euclidean volume).  Detection
    via the same SNR proxy as the catalog.  Returns (detected injections with
    p_draw, N_generated).
    """
    if dgw_max is None:
        # ~2x the proxy's horizon for the heaviest binaries — covering the
        # full detectable volume without drowning the draw in undetectable
        # far-field injections.
        dgw_max = 16.0
    k1, k2, k3, k4 = jax.random.split(key, 4)
    lo, hi = jnp.log(m_range[0]), jnp.log(m_range[1])
    ma = jnp.exp(jax.random.uniform(k1, (n_generated,), minval=lo, maxval=hi))
    mb = jnp.exp(jax.random.uniform(k2, (n_generated,), minval=lo, maxval=hi))
    m1d, m2d = jnp.maximum(ma, mb), jnp.minimum(ma, mb)
    u = jax.random.uniform(k3, (n_generated,))
    dgw = dgw_max * u ** (1.0 / 3.0)

    # p_draw = p(m1d, m2d) * p(dgw): each of (ma, mb) has density
    # 1/(m log(hi/lo)); the ordered pair (m1 >= m2) has density
    # 2/(m1 m2 log^2) off the diagonal.
    log_span = hi - lo
    p_m = 2.0 / (m1d * m2d * log_span**2)
    p_d = 3.0 * dgw**2 / dgw_max**3
    p_draw = p_m * p_d

    snr = _snr_proxy(m1d, m2d, dgw) + jax.random.normal(k4, (n_generated,))
    keep = snr > snr_threshold
    n_det = int(jnp.sum(keep))
    idx = jnp.nonzero(keep, size=n_det)[0]
    theta_inj = ThetaInjDet(m1det=m1d[idx], m2det=m2d[idx], dL=dgw[idx],
                            p_draw=p_draw[idx])
    return theta_inj, n_generated
