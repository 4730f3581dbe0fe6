"""Cosmology models as functional pytrees.

Capability parity with CHIMERA/population/cosmo.py (flrw at :50, mg_flrw at
:86, function set at :122-279), redesigned TPU-first:

* frozen-dataclass pytrees (no equinox ``__init__`` mutation, no plum
  dispatch) — ``update(**hyper)`` returns a new pytree whose distance tables
  are retraced as part of the jitted graph, so a new MCMC sample is pure XLA;
* the ``cumtrapz(1/E)`` comoving-distance table and the ``dL -> z`` inversion
  are dense interpolations into static-resolution tables (static shapes, no
  data-dependent control flow);
* curvature branches are ``jnp.where`` selects, never Python branches, so a
  single compiled graph covers open/flat/closed cosmologies.

Units: distances in Gpc, H0 in km/s/Mpc (c = 299792.458 km/s).
"""

from __future__ import annotations

from typing import ClassVar

import jax.numpy as jnp
from jax import Array

import numpy as np

from chimera_tpu import pytree
from chimera_tpu.ops.chebyshev import cheb_nodes, chebeval, chebfit_from_values
from chimera_tpu.ops.integrate import cumtrapz

C_LIGHT_KM_S = 299792.458  # km/s
_Z_LO = 1e-6  # lower edge of the log-log Chebyshev fits; queries below clamp


def _resolve(kwargs: dict, defaults: dict) -> dict:
    unknown = set(kwargs) - set(defaults)
    if unknown:
        raise TypeError(f"unknown cosmology parameters: {sorted(unknown)}")
    out = dict(defaults)
    out.update(kwargs)
    return out


@pytree.dataclass
class FLRW:
    """w0waCDM FLRW cosmology with precomputed comoving-distance table.

    Hyper-parameters (pytree leaves, samplable): H0, Om0, Ok0, Or0, w0, wa.
    Static configuration: z_max, z_grid_res (table resolution).
    Derived leaves: z_grid (table nodes), int_invE (cumulative 1/E integral).
    """

    H0: Array = 70.0
    Om0: Array = 0.25
    Ok0: Array = 0.0
    Or0: Array = 0.0
    w0: Array = -1.0
    wa: Array = 0.0
    z_grid: Array | None = None
    int_invE: Array | None = None
    # Chebyshev engine state (f32-conditioned forms — see create()):
    # G(z) = (1/z) int_0^z dz'/E(z')  — O(1) values, so F = z G keeps uniform
    # *relative* accuracy at all z without logs in the forward map;
    # log(z/dgw) vs log dgw          — range ~2.6 (vs ~11 for log z), so the
    # f32 Clenshaw/input-rounding error stays ~1e-7 on z.
    cheb_g: Array | None = None
    cheb_logh: Array | None = None
    dgw_lo: Array | None = None
    dgw_max: Array | None = None
    z_max: float = pytree.static_field(default=10.0)
    z_grid_res: int = pytree.static_field(default=1500)
    # 'chebyshev': gather-free hot-path evaluation (TPU-fast, ~1e-10 vs the
    # dense table); 'table': linear interpolation into the dense grid (the
    # reference's semantics, cosmo.py:132, 260-264).
    interp_method: str = pytree.static_field(default="chebyshev")
    cheb_deg: int = pytree.static_field(default=64)

    name: ClassVar[str] = "flrw"
    hyper_keys: ClassVar[tuple[str, ...]] = ("H0", "Om0", "Ok0", "Or0", "w0", "wa")
    config_keys: ClassVar[tuple[str, ...]] = (
        "z_max", "z_grid_res", "interp_method", "cheb_deg")

    # -- construction -------------------------------------------------------

    @classmethod
    def create(cls, **kwargs) -> "FLRW":
        """Build the model and its distance representations (traceable under
        jit — rebuilt per hyper-sample inside the compiled graph)."""
        defaults = {k: getattr(cls, k) for k in cls.hyper_keys + cls.config_keys}
        params = _resolve(kwargs, defaults)
        obj = cls(**{k: params[k] for k in cls.hyper_keys},
                  **{k: params[k] for k in cls.config_keys})
        # Table grid matches the reference (cosmo.py:44): [0] + logspace.
        zg = jnp.concatenate(
            [jnp.zeros((1,)),
             jnp.logspace(-10.0, jnp.log10(obj.z_max), obj.z_grid_res - 1)]
        )
        table = cumtrapz(1.0 / e_at_z(obj, zg), zg)
        obj = pytree.replace(obj, z_grid=zg, int_invE=table)
        if obj.interp_method == "chebyshev":
            # f32-conditioned Chebyshev engine.  Design constraints (SURVEY
            # 7.3-1, validated by measurement): (a) every fitted function has
            # O(1) values — f32 Clenshaw error is absolute (~deg*eps*|f|), so
            # large-|f| fits (log z spans ~11) cost ~1e-5 while O(1) fits
            # cost ~1e-7; (b) no dense-table quadrature feeds the fits — an
            # f32 cumtrapz carries a ~1e-6 systematic that poisons every
            # downstream weight identically.
            #
            # Forward: F(z) = int_0^z 1/E = z * G(z) with
            # G(z) = int_0^1 1/E(z u) du fitted from Gauss-Legendre
            # quadrature (positive smooth integrand, no cancellation).
            gl_x, gl_w = np.polynomial.legendre.leggauss(48)
            gl_x = jnp.asarray(0.5 * (gl_x + 1.0))     # nodes on (0, 1)
            gl_w = jnp.asarray(0.5 * gl_w)
            z_nodes = cheb_nodes(obj.cheb_deg, 0.0, obj.z_max)
            g_vals = jnp.sum(
                gl_w[None, :] / e_at_z(obj, z_nodes[:, None] * gl_x[None, :]),
                axis=-1)
            cheb_g = chebfit_from_values(g_vals)
            obj = pytree.replace(obj, cheb_g=cheb_g)

            # Inverse: z = dgw * exp(cheb(log dgw)) fitting log(z / dgw) —
            # O(2.6) range.  Node redshifts come from 3 Newton refinements of
            # a table initial guess against the accurate forward map (the
            # table error only perturbs the starting point).
            dgw_table = _dl_from_table(obj, zg)
            dgw_max = dgw_table[-1]
            dgw_lo = jnp.interp(jnp.asarray(_Z_LO), zg, dgw_table)
            d_nodes = jnp.exp(cheb_nodes(obj.cheb_deg, jnp.log(dgw_lo),
                                         jnp.log(dgw_max)))
            z_init = jnp.interp(d_nodes, dgw_table, zg)
            z_n = jnp.clip(z_init, _Z_LO, obj.z_max)
            for _ in range(3):
                resid = dl_at_z(obj, z_n) - d_nodes
                z_n = jnp.clip(z_n - resid / ddl_dz_at_z(obj, z_n),
                               _Z_LO * 0.5, obj.z_max)
            cheb_logh = chebfit_from_values(jnp.log(z_n / d_nodes))
            obj = pytree.replace(obj, cheb_logh=cheb_logh,
                                 dgw_lo=dgw_lo, dgw_max=dgw_max)
        return obj

    @property
    def as_dict(self) -> dict:
        return {k: getattr(self, k) for k in self.hyper_keys + self.config_keys}

    def update(self, **hyper) -> "FLRW":
        """Functional hyper-parameter update; retains table config.

        Irrelevant keys are ignored (the population wrapper fans one hyper-λ
        dict to all sub-models — reference pop_wrapper.py:56-64).
        """
        relevant = {k: v for k, v in hyper.items()
                    if k in self.hyper_keys + self.config_keys}
        if not relevant:
            return self
        merged = self.as_dict
        merged.update(relevant)
        return type(self).create(**merged)

    # -- derived quantities --------------------------------------------------

    @property
    def Ode0(self) -> Array:
        return 1.0 - self.Om0 - self.Or0 - self.Ok0

    @property
    def dH(self) -> Array:
        """Hubble distance in Gpc."""
        return C_LIGHT_KM_S * 1e-3 / self.H0

    def gw_distance_factor(self, z: Array) -> Array:
        """GW/EM distance ratio Xi(z); identity for GR propagation."""
        return jnp.ones_like(z)

    def gw_distance_factor_derivative(self, z: Array) -> Array:
        return jnp.zeros_like(z)


@pytree.dataclass
class MGFLRW(FLRW):
    """FLRW with modified GW propagation d_GW = Xi(z) d_L,
    Xi(z) = Xi0 + (1 - Xi0) (1+z)^-n (reference cosmo.py:86-115, 226-235)."""

    Xi0: Array = 1.0
    n: Array = 0.0

    name: ClassVar[str] = "mg_flrw"
    hyper_keys: ClassVar[tuple[str, ...]] = FLRW.hyper_keys + ("Xi0", "n")

    def gw_distance_factor(self, z: Array) -> Array:
        return self.Xi0 + (1.0 - self.Xi0) * jnp.power(1.0 + z, -self.n)

    def gw_distance_factor_derivative(self, z: Array) -> Array:
        return self.n * (self.Xi0 - 1.0) * jnp.power(1.0 + z, -(self.n + 1.0))


# ---------------------------------------------------------------------------
# Cosmological functions (pure, pytree-polymorphic)
# ---------------------------------------------------------------------------

def e_at_z(cosmo: FLRW, z: Array) -> Array:
    """Dimensionless Hubble parameter E(z) for w0waCDM (cosmo.py:122-130)."""
    zp1 = 1.0 + z
    w_z = cosmo.w0 + cosmo.wa * z / zp1
    return jnp.sqrt(
        cosmo.Om0 * zp1**3
        + cosmo.Or0 * zp1**4
        + cosmo.Ok0 * zp1**2
        + cosmo.Ode0 * jnp.power(zp1, 3.0 * (1.0 + w_z))
    )


def _curvature_transverse(cosmo: FLRW, dcr: Array) -> Array:
    """Apply the curvature map d_C -> d_M as branch-free selects."""
    sqrt_ok = jnp.sqrt(jnp.abs(cosmo.Ok0 + 1e-10))
    dh = cosmo.dH
    x = sqrt_ok * dcr / dh
    return jnp.where(
        cosmo.Ok0 == 0.0,
        dcr,
        jnp.where(cosmo.Ok0 > 0.0,
                  (dh / sqrt_ok) * jnp.sinh(x),
                  (dh / sqrt_ok) * jnp.sin(x)),
    )


def _dl_from_table(cosmo: FLRW, zg: Array) -> Array:
    """GW distance on the table grid itself (no lookup needed)."""
    dct = _curvature_transverse(cosmo, cosmo.dH * cosmo.int_invE)
    return dct * (1.0 + zg) * cosmo.gw_distance_factor(zg)


def int_inv_e_at_z(cosmo: FLRW, z: Array) -> Array:
    """Cumulative integral of 1/E: Chebyshev evaluation (gather-free hot
    path, F(z) = z G(z) with G the fitted running mean of 1/E — uniform
    relative accuracy at all z) or table lookup (reference semantics,
    cosmo.py:132)."""
    if cosmo.interp_method == "chebyshev":
        zc = jnp.clip(z, 0.0, cosmo.z_max)
        return zc * chebeval(cosmo.cheb_g, zc, 0.0, cosmo.z_max)
    return jnp.interp(z, cosmo.z_grid, cosmo.int_invE)


def comoving_distance(cosmo: FLRW, z: Array) -> Array:
    """Radial comoving distance d_C(z) in Gpc."""
    return cosmo.dH * int_inv_e_at_z(cosmo, z)


def transverse_comoving_distance(cosmo: FLRW, z: Array) -> Array:
    """Transverse comoving distance d_M(z) with curvature branches as selects
    (cosmo.py:141-153)."""
    return _curvature_transverse(cosmo, comoving_distance(cosmo, z))


def _dgw_to_dct(cosmo: FLRW, distances: Array, z: Array) -> Array:
    """Invert GW distance -> transverse comoving distance at known z.

    For MG cosmologies the measured GW distance is de-modified by Xi(z)
    first (reference cosmo.py:201-203, 230-235).
    """
    return distances / cosmo.gw_distance_factor(z) / (1.0 + z)


def angular_distance(cosmo: FLRW, z: Array, distances: Array | None = None) -> Array:
    dct = _dgw_to_dct(cosmo, distances, z) if distances is not None \
        else transverse_comoving_distance(cosmo, z)
    return dct / (1.0 + z)


def comoving_volume(cosmo: FLRW, z: Array, distances: Array | None = None) -> Array:
    """Comoving volume V_C(z) in Gpc^3 with curvature branches (cosmo.py:166-186)."""
    dct = _dgw_to_dct(cosmo, distances, z) if distances is not None \
        else transverse_comoving_distance(cosmo, z)
    reg_ok = cosmo.Ok0 + 1e-10
    sqrt_ok = jnp.sqrt(jnp.abs(reg_ok))
    dh = cosmo.dH
    r = dct / dh
    common = r * jnp.sqrt(1.0 + reg_ok * r * r)
    return jnp.where(
        cosmo.Ok0 == 0.0,
        4.0 * jnp.pi * dct**3 / 3.0,
        jnp.where(
            cosmo.Ok0 > 0.0,
            (4.0 * jnp.pi * dh**3 / (2.0 * reg_ok))
            * (common - jnp.arcsinh(sqrt_ok * r) / sqrt_ok),
            (4.0 * jnp.pi * dh**3 / (2.0 * reg_ok))
            * (common - jnp.arcsin(sqrt_ok * r) / sqrt_ok),
        ),
    )


def differential_comoving_volume(
    cosmo: FLRW, z: Array, distances: Array | None = None
) -> Array:
    """dV_C/dz (Gpc^3 per unit z), cosmo.py:189-197."""
    dct = _dgw_to_dct(cosmo, distances, z) if distances is not None \
        else transverse_comoving_distance(cosmo, z)
    return 4.0 * jnp.pi * cosmo.dH * dct**2 / e_at_z(cosmo, z)


def dl_at_z(cosmo: FLRW, z: Array) -> Array:
    """GW luminosity distance d_GW(z) = Xi(z) (1+z) d_M(z) (cosmo.py:206-243)."""
    dct = transverse_comoving_distance(cosmo, z)
    return dct * (1.0 + z) * cosmo.gw_distance_factor(z)


def ddl_dz_at_z(cosmo: FLRW, z: Array, distances: Array | None = None) -> Array:
    """d(d_GW)/dz — the Jacobian of the distance-redshift map
    (cosmo.py:213-221 for GR, :246-257 for MG)."""
    dct = _dgw_to_dct(cosmo, distances, z) if distances is not None \
        else transverse_comoving_distance(cosmo, z)
    ez = e_at_z(cosmo, z)
    ddl_flrw = dct + (cosmo.dH / ez) * (1.0 + z)
    xi = cosmo.gw_distance_factor(z)
    dxi = cosmo.gw_distance_factor_derivative(z)
    return ddl_flrw * xi + dct * (1.0 + z) * dxi


def z_from_dgw(cosmo: FLRW, dgw: Array) -> Array:
    """Invert the GW distance-redshift relation (cosmo.py:260-264).

    Chebyshev mode evaluates a per-cosmology series of the inverse map —
    zero gathers over the (events x samples) axes.  Both modes clamp
    outside [0, d_GW(z_max)] like ``jnp.interp``."""
    if cosmo.interp_method == "chebyshev":
        d = jnp.clip(dgw, cosmo.dgw_lo, cosmo.dgw_max)
        log_d = jnp.log(d)
        return d * jnp.exp(chebeval(
            cosmo.cheb_logh, log_d,
            jnp.log(cosmo.dgw_lo), jnp.log(cosmo.dgw_max), clip=False))
    dgw_table = _dl_from_table(cosmo, cosmo.z_grid)
    return jnp.interp(dgw, dgw_table, cosmo.z_grid)
