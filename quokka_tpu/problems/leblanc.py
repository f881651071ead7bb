"""Leblanc extreme shocktube (reference
``src/problems/HydroLeblanc/test_hydro_leblanc.cpp`` + ``tests/leblanc.in``).

Density ratio 1e3, pressure ratio 1e9 (rho=1, P=2/3e-1 | rho=1e-3,
P=2/3e-10), gamma=5/3, domain [0,9] with diaphragm at x=3, t=6, outflow
boundaries, 2000 cells, rel. rms-L1 tolerance 0.002. A famous stress test
of a PPM+FOFC pipeline (near-vacuum states, strong rarefaction).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..indices import EGAS, EINT, MX1, RHO
from ..registry import (
    BC_OUTFLOW,
    BC_PERIODIC,
    BCSpec,
    EOSTraits,
    PhysicsTraits,
    Problem,
    register_problem,
)
from ..utils.exact_riemann import shocktube_exact


@register_problem
class LeblancProblem(Problem):
    name = "HydroLeblanc"
    physics = PhysicsTraits(hydro_enabled=True)
    eos_traits = EOSTraits(gamma=5.0 / 3.0)
    bcs = BCSpec(x=(BC_OUTFLOW, BC_OUTFLOW))

    rho_L, P_L = 1.0, (2.0 / 3.0) * 1.0e-1
    rho_R, P_R = 1.0e-3, (2.0 / 3.0) * 1.0e-10
    x_diaphragm = 3.0

    def set_initial_conditions(self, grid):
        x = grid.cell_centers(0)[:, None, None]
        g = self.eos_traits.gamma
        left = x < self.x_diaphragm
        rho = jnp.where(left, self.rho_L, self.rho_R)
        P = jnp.where(left, self.P_L, self.P_R)
        shape = grid.n_cell
        zeros = jnp.zeros(shape)
        eint = P / (g - 1.0)
        return jnp.stack([
            jnp.broadcast_to(rho, shape),
            zeros, zeros, zeros,
            jnp.broadcast_to(eint, shape),
            jnp.broadcast_to(eint, shape),
        ])

    def compute_reference_solution(self, sim):
        x = np.asarray(sim.grid.cell_centers(0))
        g = self.eos_traits.gamma
        rho, u, p = shocktube_exact(
            x, sim.t, self.x_diaphragm,
            (self.rho_L, 0.0, self.P_L), (self.rho_R, 0.0, self.P_R), g,
        )
        eint = p / (g - 1.0)
        ref = np.zeros((sim.layout.nvar, *sim.grid.n_cell))
        ref[RHO, :, 0, 0] = rho
        ref[MX1, :, 0, 0] = rho * u
        ref[EGAS, :, 0, 0] = eint + 0.5 * rho * u * u
        ref[EINT, :, 0, 0] = eint
        return ref
