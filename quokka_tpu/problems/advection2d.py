"""2D diagonal advection of a density profile (exactly periodic).

The analog of the reference's Advection2D convergence problem
(``src/problems/Advection2D``): a top-hat-smoothed density blob advected
diagonally across a periodic box returns to its initial state after one
period; the L1 error against the initial condition is the criterion.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..indices import EGAS, EINT, MX1, RHO
from ..registry import (
    BCSpec, EOSTraits, PhysicsTraits, Problem, register_problem,
)

VX, VY = 1.0, 0.5
P0 = 10.0  # high pressure -> nearly passive advection


@register_problem
class Advection2DProblem(Problem):
    name = "Advection2D"
    physics = PhysicsTraits(hydro_enabled=True)
    eos_traits = EOSTraits(gamma=5.0 / 3.0, mean_molecular_weight=1.0,
                           boltzmann_constant=1.0)
    bcs = BCSpec()

    def set_initial_conditions(self, grid):
        x, y, _z = grid.cell_center_mesh()
        shape = grid.n_cell
        layout = self.physics.layout()
        g = self.eos_traits.gamma
        r2 = (x - 0.5) ** 2 + (y - 0.5) ** 2
        rho = 1.0 + jnp.exp(-r2 / 0.01)
        rho = jnp.broadcast_to(rho, shape)
        eint = jnp.full(shape, P0 / (g - 1.0))
        ke = 0.5 * rho * (VX * VX + VY * VY)
        U = jnp.zeros((layout.nvar, *shape))
        U = U.at[RHO].set(rho)
        U = U.at[MX1].set(rho * VX)
        U = U.at[MX1 + 1].set(rho * VY)
        U = U.at[EGAS].set(eint + ke)
        U = U.at[EINT].set(eint)
        return U
