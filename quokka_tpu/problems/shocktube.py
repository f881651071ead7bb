"""Sod-type shocktube (reference
``src/problems/HydroShocktube/test_hydro_shocktube.cpp:26-383``).

Left state (rho=10, P=100), right state (rho=1, P=1), gamma=1.4, diaphragm
at x=2 in [0,5], Dirichlet (ext_dir) boundaries pinned to the initial
states, run to t=0.4. Pass criterion: relative rms-L1 error vs the exact
Riemann solution < 0.002 (``test_hydro_shocktube.cpp:377-382``).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..indices import EGAS, EINT, MX1, RHO
from ..registry import (
    BC_PERIODIC,
    BC_USER,
    BCSpec,
    EOSTraits,
    PhysicsTraits,
    Problem,
    register_problem,
)
from ..utils.exact_riemann import shocktube_exact


@register_problem
class ShocktubeProblem(Problem):
    name = "HydroShocktube"
    physics = PhysicsTraits(hydro_enabled=True)
    eos_traits = EOSTraits(gamma=1.4)
    bcs = BCSpec(x=(BC_USER, BC_USER), y=(BC_PERIODIC, BC_PERIODIC), z=(BC_PERIODIC, BC_PERIODIC))

    rho_L, P_L = 10.0, 100.0
    rho_R, P_R = 1.0, 1.0
    x_diaphragm = 2.0

    def _state_lr(self, left: bool):
        g = self.eos_traits.gamma
        rho, P = (self.rho_L, self.P_L) if left else (self.rho_R, self.P_R)
        return rho, P / (g - 1.0)

    def set_initial_conditions(self, grid):
        x = grid.cell_centers(0)[:, None, None]
        g = self.eos_traits.gamma
        left = x < self.x_diaphragm
        rho = jnp.where(left, self.rho_L, self.rho_R)
        P = jnp.where(left, self.P_L, self.P_R)
        shape = grid.n_cell
        zeros = jnp.zeros(shape)
        U = jnp.stack([
            jnp.broadcast_to(rho, shape),
            zeros, zeros, zeros,
            jnp.broadcast_to(P / (g - 1.0), shape),
            jnp.broadcast_to(P / (g - 1.0), shape),
        ])
        return U

    def fill_user_boundary(self, Ug, grid, ng, time, axis, side):
        """Dirichlet: pin ghost zones to the constant L/R states."""
        assert axis == 0
        g = ng[0]
        rho, eint = self._state_lr(left=(side == 0))
        vals = jnp.zeros((Ug.shape[0],), dtype=Ug.dtype)
        vals = vals.at[RHO].set(rho).at[EGAS].set(eint).at[EINT].set(eint)
        block = jnp.broadcast_to(
            vals[:, None, None, None], (Ug.shape[0], g, Ug.shape[2], Ug.shape[3])
        )
        if side == 0:
            return Ug.at[:, :g].set(block)
        return Ug.at[:, -g:].set(block)

    def compute_reference_solution(self, sim):
        grid = sim.grid
        x = np.asarray(grid.cell_centers(0))
        gamma = self.eos_traits.gamma
        rho, u, p = shocktube_exact(
            x, sim.t, self.x_diaphragm,
            (self.rho_L, 0.0, self.P_L), (self.rho_R, 0.0, self.P_R), gamma,
        )
        eint = p / (gamma - 1.0)
        etot = eint + 0.5 * rho * u * u
        nx = grid.n_cell[0]
        ref = np.zeros((sim.layout.nvar, nx, 1, 1))
        ref[RHO, :, 0, 0] = rho
        ref[MX1, :, 0, 0] = rho * u
        ref[EGAS, :, 0, 0] = etot
        ref[EINT, :, 0, 0] = eint
        return ref
