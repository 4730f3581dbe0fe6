"""GW selection effects xi(lambda) via importance-sampled injection Monte Carlo.

Capability parity with CHIMERA/selection_function.py:10-53.  The injection
axis (10^5-10^7 detected injections) is the largest reduction in the
hyper-likelihood; it is a dense elementwise map + sum, which
chimera_tpu.parallel shards across the device mesh with an in-program psum
(replacing the reference's MPI allreduce, parallel.py:280-304).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import Array

from chimera_tpu import pytree
from chimera_tpu.data.structs import ThetaInjDet
from chimera_tpu.models.population import Population, pop_rate_det


@pytree.dataclass
class SelectionFunction:
    """Estimates N_exp(lambda) = Tobs * xi(lambda) from detected injections.

    Args mirror selection_function.py:24-32: ``theta_inj`` are the detected
    injections with their draw probabilities, ``n_inj`` the total number of
    *generated* injections, ``n_eff_min`` the Kish-style effective-count
    threshold below which the estimate is zeroed (untrusted).
    """

    theta_inj: ThetaInjDet = None
    n_inj: Array = None
    n_eff_min: float | None = pytree.static_field(default=5.0)

    @classmethod
    def create(cls, theta_inj: ThetaInjDet, n_inj: float,
               n_eff_min: float | None = 5.0) -> "SelectionFunction":
        return cls(theta_inj=theta_inj, n_inj=jnp.asarray(float(n_inj)),
                   n_eff_min=n_eff_min)

    def partial_sums(self, pop: Population) -> tuple[Array, Array]:
        """(sum dN/pdraw, sum (dN/pdraw)^2) over the LOCAL injection shard.

        The two scalars are all a device must contribute to the global
        estimate: ``n_exp_from_sums`` finishes after a psum over the data
        axis (the in-program equivalent of the reference's MPI allreduce of
        partial xi sums, parallel.py:280-304)."""
        dn = pop_rate_det(pop, self.theta_inj) / self.theta_inj.p_draw
        dn = jnp.nan_to_num(dn)  # matches the reference's nansum
        return jnp.sum(dn, axis=-1), jnp.sum(dn * dn, axis=-1)

    def n_exp_from_sums(self, pop: Population, s1: Array, s2: Array) -> Array:
        """Finish N_exp from (globally-summed) partials."""
        xi = s1 / self.n_inj
        n_exp = pop.Tobs * xi
        if self.n_eff_min is not None:
            var = s2 / self.n_inj**2 - xi * xi / self.n_inj
            n_eff = xi * xi / var
            n_exp = jnp.where(n_eff < self.n_eff_min, 0.0, n_exp)
        return n_exp

    def n_exp(self, pop: Population) -> Array:
        """Expected number of detections (selection_function.py:35-48)."""
        s1, s2 = self.partial_sums(pop)
        return self.n_exp_from_sums(pop, s1, s2)

    def __call__(self, pop: Population) -> Array:
        return self.n_exp(pop)
