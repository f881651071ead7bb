"""Self-gravitating spherical collapse (3D, gas self-gravity).

Rebuild of the reference's SphericalCollapse problem
(``src/problems/SphericalCollapse/spherical_collapse.cpp``): a dense cold
sphere (tanh-smoothed edge, rho_max = 10, ambient 1e-5, P = 0.1, G = 1)
in an open-boundary box collapses on roughly its free-fall time
t_ff = sqrt(3 pi / (32 G rho)).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..indices import EGAS, EINT, RHO
from ..registry import (
    BC_OUTFLOW,
    BCSpec,
    EOSTraits,
    PhysicsTraits,
    Problem,
    register_problem,
)

RHO_MAX = 10.0
RHO_MIN = 1.0e-5
P0 = 1.0e-1
R_SPHERE = 0.5
R_SMOOTH = 0.025


@register_problem
class SphericalCollapseProblem(Problem):
    name = "SphericalCollapse"
    physics = PhysicsTraits(hydro_enabled=True, gravity_enabled=True)
    eos_traits = EOSTraits(gamma=5.0 / 3.0, mean_molecular_weight=1.0,
                           boltzmann_constant=1.0)
    bcs = BCSpec(x=(BC_OUTFLOW, BC_OUTFLOW), y=(BC_OUTFLOW, BC_OUTFLOW),
                 z=(BC_OUTFLOW, BC_OUTFLOW))

    def set_initial_conditions(self, grid):
        x, y, z = grid.cell_center_mesh()
        shape = grid.n_cell
        layout = self.physics.layout()
        g = self.eos_traits.gamma
        c = [0.5 * (grid.prob_lo[d] + grid.prob_hi[d]) for d in range(3)]
        r = jnp.sqrt((x - c[0]) ** 2 + (y - c[1]) ** 2 + (z - c[2]) ** 2)
        rho = jnp.maximum(
            RHO_MIN, RHO_MAX * 0.5 * (jnp.tanh((R_SPHERE - r) / R_SMOOTH) + 1.0)
        )
        rho = jnp.broadcast_to(rho, shape)
        eint = jnp.full(shape, P0 / (g - 1.0))
        U = jnp.zeros((layout.nvar, *shape))
        U = U.at[RHO].set(rho)
        U = U.at[EGAS].set(eint)
        U = U.at[EINT].set(eint)
        return U

    def error_est(self, sim, level):
        """Tag cells above the density threshold for refinement (reference
        ``spherical_collapse.cpp:101-118``: q_min = 5.0)."""
        return sim.level_U[level][RHO] > 5.0
