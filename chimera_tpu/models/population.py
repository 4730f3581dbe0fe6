"""Population wrapper: fans hyper-parameter samples to sub-models and hosts
the shared population-level functions.

Capability parity with CHIMERA/population/pop_wrapper.py: the ``population``
module (:14-64), detector<->source transforms (:67-80), the redshift prior
``p_cbc`` (:82-90), detector-frame rates (:92-121), expected counts (:123-129)
and per-event z-grid construction (:133-208).
"""

from __future__ import annotations

from typing import ClassVar

import jax.numpy as jnp
from jax import Array

from chimera_tpu import pytree
from chimera_tpu.catalog.empty import EmptyCatalog
from chimera_tpu.data.structs import ThetaInjDet, ThetaPEDet, ThetaSrc
from chimera_tpu.models import cosmology as cosmo_fns
from chimera_tpu.models.mass import BaseMassModel, p_m1m2
from chimera_tpu.models.rate import BaseRateModel
from chimera_tpu.ops.integrate import trapz


@pytree.dataclass
class Population:
    """(cosmology, mass, rate) hyper-model plus catalog prior and run config.

    ``update(**hyper)`` is the per-MCMC-sample entry point: each sub-model
    picks the keys it owns and rebuilds its tables inside the traced graph
    (pop_wrapper.py:56-64).
    """

    cosmo: object = None
    mass: BaseMassModel = None
    rate: BaseRateModel = None
    R0: Array = 1.0
    gal_cat: object = None
    Tobs: float = pytree.static_field(default=1.0)
    scale_free: bool = pytree.static_field(default=True)

    name: ClassVar[str] = "population"

    @classmethod
    def create(cls, cosmo, mass, rate, R0=1.0, gal_cat=None, Tobs=1.0,
               scale_free=True) -> "Population":
        if gal_cat is None:
            gal_cat = EmptyCatalog()
        return cls(cosmo=cosmo, mass=mass, rate=rate, R0=jnp.asarray(R0, float),
                   gal_cat=gal_cat, Tobs=float(Tobs), scale_free=bool(scale_free))

    def update(self, **hyper) -> "Population":
        return pytree.replace(
            self,
            cosmo=self.cosmo.update(**hyper),
            mass=self.mass.update(**hyper),
            rate=self.rate.update(**hyper),
            R0=hyper.get("R0", self.R0),
        )


# ---------------------------------------------------------------------------
# Frame transforms and weights (pop_wrapper.py:67-80)
# ---------------------------------------------------------------------------

def theta_det_to_src(cosmo, theta_det, include_original_distances: bool = False
                     ) -> ThetaSrc:
    """Map detector-frame (m1det, m2det, dGW) to source frame under a trial
    cosmology: z = z(dGW | lambda_c), m_src = m_det / (1+z)."""
    z = cosmo_fns.z_from_dgw(cosmo, theta_det.dL)
    m1 = theta_det.m1det / (1.0 + z)
    m2 = theta_det.m2det / (1.0 + z)
    return ThetaSrc(
        m1src=m1, m2src=m2, z=z,
        original_distances=theta_det.dL if include_original_distances else None)


def theta_src_and_weights(pop: Population, theta_det: ThetaPEDet
                          ) -> tuple[ThetaSrc, Array]:
    """Source-frame samples + population/PE-prior importance weights."""
    th_src = theta_det_to_src(pop.cosmo, theta_det)
    weights = p_m1m2(pop.mass, th_src.m1src, th_src.m2src) / theta_det.pe_prior
    return th_src, weights


# ---------------------------------------------------------------------------
# Redshift prior and detector-frame rates (pop_wrapper.py:82-121)
# ---------------------------------------------------------------------------

def p_cbc(pop: Population, z: Array) -> Array:
    """p_gal(z) * psi(z) / (1+z) — the CBC redshift prior.

    For a pixelated catalog p_gal has an extra pixel axis; masked pixels are
    zero (mask semantics replace the reference's -100 passthrough at
    pop_wrapper.py:87 — integrals agree because masked slots never
    contribute)."""
    p_gal = pop.gal_cat.p_gal(pop.cosmo, z)
    p_rate = pop.rate.rate(z) / (1.0 + z)
    if p_gal.ndim > p_rate.ndim:
        return p_gal * p_rate[:, None, :]
    return p_gal * p_rate


def pop_rate_det(pop: Population, theta) -> Array:
    """Population rate density in *detector frame*: dN/dtheta_det.

    Three overloads collapsed into one function (pop_wrapper.py:92-121):
    PE samples (ThetaPEDet), injections (ThetaInjDet, which tracks original
    distances for MG de-modification), and already-source-frame samples.
    """
    if isinstance(theta, ThetaSrc):
        th_src = theta
    else:
        th_src = theta_det_to_src(
            pop.cosmo, theta,
            include_original_distances=isinstance(theta, ThetaInjDet))
    p_z = pop.gal_cat.p_bkg(pop.cosmo, th_src)
    p_z = p_z * pop.rate.rate(th_src.z) / (1.0 + th_src.z)
    dn = pop.R0 * p_m1m2(pop.mass, th_src.m1src, th_src.m2src) * p_z
    jac = jnp.abs(
        cosmo_fns.ddl_dz_at_z(pop.cosmo, th_src.z, th_src.original_distances)
    ) * (1.0 + th_src.z) ** 2
    return dn / jac


def n_cbc_1yr(pop: Population) -> Array:
    """Expected number of CBCs per year (pop_wrapper.py:123-129)."""
    zz = jnp.linspace(0.001, pop.cosmo.z_max, 10_000)
    dn_dz = pop.rate.rate(zz) / (1.0 + zz) * pop.gal_cat.p_bkg(pop.cosmo, zz)
    return trapz(pop.R0 * dn_dz, x=zz, axis=-1)


# ---------------------------------------------------------------------------
# Per-event z-grid construction (pop_wrapper.py:133-208)
# ---------------------------------------------------------------------------

def compute_z_grids(
    cosmo,
    theta_det: ThetaPEDet,
    cosmo_prior: dict | None = None,
    z_int_res: int = 300,
    z_conf_range=None,
) -> Array:
    """Static per-event redshift grids covering each event's support under
    *any* cosmology in the prior box.

    The dL range per event comes from percentiles / mean+-c*sigma / a [0.5min,
    2max] envelope; the z bounds are obtained by inverting dGW at the two
    prior-corner cosmologies (with the Xi0/n corner flip for modified
    propagation — pop_wrapper.py:184-201).  Runs at setup time (host), returns
    (Nev, z_int_res).
    """
    d_l = theta_det.dL
    if isinstance(z_conf_range, (list, tuple)):
        dl_min, dl_max = jnp.percentile(d_l, jnp.asarray(z_conf_range), axis=1)
    elif z_conf_range is not None:
        mu = jnp.mean(d_l, axis=1)
        sig = jnp.std(d_l, axis=1)
        dl_min = mu - z_conf_range * sig
        dl_max = mu + z_conf_range * sig
    else:
        dl_max = jnp.max(d_l, axis=1) * 2.0
        dl_min = jnp.min(d_l, axis=1) * 0.5
    dl_min = jnp.maximum(dl_min, 1e-8)

    prior = {k: [v, v] for k, v in cosmo.as_dict.items()
             if k in cosmo.hyper_keys}
    if cosmo_prior is not None:
        prior.update({k: list(v) for k, v in cosmo_prior.items()})

    low = {k: prior[k][0] for k in ("H0", "Om0", "Ok0", "Or0", "w0", "wa")}
    high = {k: prior[k][1] for k in ("H0", "Om0", "Ok0", "Or0", "w0", "wa")}
    if "Xi0" in cosmo.hyper_keys:
        # Larger Xi0 -> larger dGW at fixed z, so the corner that minimizes z
        # uses the high-Xi0 end and vice versa (pop_wrapper.py:184-201).
        low.update(Xi0=prior["Xi0"][1], n=prior["n"][1])
        high.update(Xi0=prior["Xi0"][0], n=prior["n"][1])

    cosmo_lo = cosmo.update(**low, z_grid_res=10_000)
    cosmo_hi = cosmo.update(**high, z_grid_res=10_000)
    z_min = cosmo_fns.z_from_dgw(cosmo_lo, dl_min)
    z_max = cosmo_fns.z_from_dgw(cosmo_hi, dl_max)
    return jnp.linspace(z_min, z_max, z_int_res, axis=1)
