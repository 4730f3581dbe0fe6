"""Galaxy-catalog completeness models.

Capability parity with CHIMERA/catalog/completeness.py: the usable
``dVdz_completeness`` (:22-67) is reproduced; ``homogeneous_completeness``
(:73-277, WIP upstream with unset attributes) is completed here as a working
table-based model.

Both models expose the interface the catalogs and likelihood consume:
  * ``P_compl(z_grids)``   — completeness probability on per-event z-grids;
  * ``fR(cosmo)``          — completeness normalization (cosmology-dependent);
  * ``p_bkg(cosmo, theta)``— homogeneous background redshift prior.
"""

from __future__ import annotations

from typing import Callable, ClassVar

import jax
import jax.numpy as jnp
from jax import Array

from chimera_tpu import pytree
from chimera_tpu.data.structs import ThetaSrc
from chimera_tpu.models import cosmology as cosmo_fns
from chimera_tpu.ops.integrate import trapz


def _z_of(theta_or_z) -> tuple[Array, Array | None]:
    if isinstance(theta_or_z, ThetaSrc):
        return theta_or_z.z, theta_or_z.original_distances
    return theta_or_z, None


@pytree.dataclass
class DVdzCompleteness:
    """Step (or smoothed-step) completeness on a complete redshift range
    (reference completeness.py:22-67).

    fR = V_C(z_range[1]) - V_C(z_range[0]); p_bkg = dV_C/dz.
    """

    z_range: Array = (0.073, 1.3)
    z_sig: Array | None = None
    kind: str = pytree.static_field(default="step")

    name: ClassVar[str] = "dVdz_completeness"

    @classmethod
    def create(cls, z_range=(0.073, 1.3), kind="step", z_sig=None):
        if kind not in ("step", "step_smooth"):
            raise ValueError("kind must be 'step' or 'step_smooth'")
        if kind == "step_smooth" and z_sig is None:
            raise ValueError("step_smooth requires z_sig")
        return cls(z_range=jnp.asarray(z_range, dtype=float),
                   z_sig=None if z_sig is None else jnp.asarray(z_sig),
                   kind=kind)

    def P_compl(self, z_grids: Array) -> Array:
        if self.kind == "step":
            return jnp.where(
                (z_grids > self.z_range[0]) & (z_grids < self.z_range[1]), 1.0, 0.0)
        # Smooth box: product of two erf shoulders.  (The reference's
        # step_smooth at completeness.py:47-49 broadcasts incorrectly for
        # per-event grids; this is the corrected equivalent.)
        s = self.z_sig * jnp.sqrt(2.0)
        rise = 0.5 * (1.0 + jax.scipy.special.erf((z_grids - self.z_range[0]) / s))
        fall = 0.5 * (1.0 + jax.scipy.special.erf((self.z_range[1] - z_grids) / s))
        return rise * fall

    def fR(self, cosmo) -> Array:
        vc = cosmo_fns.comoving_volume(cosmo, self.z_range)
        return vc[1] - vc[0]

    def p_bkg(self, cosmo, theta_or_z) -> Array:
        z, distances = _z_of(theta_or_z)
        return cosmo_fns.differential_comoving_volume(cosmo, z, distances)


@pytree.dataclass
class HomogeneousCompleteness:
    """Empirical completeness: observed / theoretical galaxy density on a
    fixed z table (completion of reference completeness.py:73-277).

    Build with :meth:`create` from galaxy redshifts; the completeness table
    is cosmology-fixed (computed at the fiducial cosmology — the same
    approximation the reference makes at completeness.py:173-178).
    """

    z_table: Array = None            # (Nz,)
    completeness: Array = None       # (Nz,) in [0, 1]
    n_theo_table: Array = None       # (Nz,) theoretical density on the table
    z_min: Array = None
    z_max: Array = None

    name: ClassVar[str] = "homogeneous_completeness"

    @classmethod
    def create(
        cls,
        z_gal: Array,
        theory_density_func: Callable[[Array], Array],
        cosmo,
        sky_area_deg2: float = 58.0,
        z_range=None,
        n_bins: int = 50,
        n_interp: int = 1000,
        weights: Array | None = None,
        smooth_sigma_bins: float | None = None,
    ) -> "HomogeneousCompleteness":
        z_gal = jnp.asarray(z_gal)
        if z_range is None:
            z_range = (float(jnp.min(z_gal)), float(jnp.max(z_gal)))
        z_lo, z_hi = float(z_range[0]), float(z_range[1])
        z_table = jnp.linspace(z_lo, z_hi, n_interp + 1)
        sky_area_sr = sky_area_deg2 * (jnp.pi / 180.0) ** 2

        # Observed density: weighted histogram / comoving shell volume.
        edges = jnp.linspace(z_lo, z_hi, n_bins + 1)
        centers = 0.5 * (edges[:-1] + edges[1:])
        dz = edges[1] - edges[0]
        n_obs, _ = jnp.histogram(z_gal, bins=edges, weights=weights)
        dvdz = cosmo_fns.differential_comoving_volume(cosmo, centers)
        # dVdz is in Gpc^3; densities in per-Mpc^3 like the reference
        # (completeness.py:260: the 1e9 Gpc^3 -> Mpc^3 factor).
        shell_mpc3 = dz * 1e9 * dvdz * sky_area_sr / (4.0 * jnp.pi)
        rho_obs = n_obs / shell_mpc3
        rho_obs = jnp.interp(z_table, centers, rho_obs)
        if smooth_sigma_bins:
            # Gaussian smoothing via explicit convolution (precompute path).
            half = int(4 * smooth_sigma_bins) + 1
            x = jnp.arange(-half, half + 1)
            k = jnp.exp(-0.5 * (x / smooth_sigma_bins) ** 2)
            k = k / jnp.sum(k)
            rho_obs = jnp.convolve(rho_obs, k, mode="same")
        rho_theo = jnp.maximum(theory_density_func(z_table), 1e-99)
        compl = jnp.minimum(rho_obs / rho_theo, 1.0)
        compl = jnp.where((z_table >= z_lo) & (z_table <= z_hi), compl, 0.0)

        n_theo = theory_density_func(z_table)
        return cls(z_table=z_table, completeness=compl, n_theo_table=n_theo,
                   z_min=jnp.asarray(z_lo), z_max=jnp.asarray(z_hi))

    def P_compl(self, z_grids: Array) -> Array:
        return jax.vmap(lambda zg: jnp.interp(zg, self.z_table, self.completeness,
                                              left=0.0, right=0.0))(
            jnp.atleast_2d(z_grids)
        ).reshape(z_grids.shape)

    def p_bkg(self, cosmo, theta_or_z) -> Array:
        """n_theo(z) * dV_C/dz at the *trial* cosmology, normalized over the
        table range (reference completeness.py:181-195)."""
        z, _ = _z_of(theta_or_z)
        bkg = jnp.where(
            (self.z_table >= self.z_min) & (self.z_table <= self.z_max),
            self.n_theo_table
            * cosmo_fns.differential_comoving_volume(cosmo, self.z_table),
            0.0,
        )
        norm = trapz(bkg, self.z_table)
        return jnp.interp(z, self.z_table, bkg / norm, left=0.0, right=0.0)

    def fR(self, cosmo) -> Array:
        p_bkg = self.p_bkg(cosmo, self.z_table)
        return trapz(self.completeness * p_bkg, self.z_table)
