"""Linear advection problems (reference ``src/problems/Advection*``):
sawtooth (1D), semi-ellipse (1D), and 2D advection -- the reference's
convergence tests for the reconstruction machinery.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..registry import EOSTraits, PhysicsTraits, Problem, register_problem


@register_problem
class SawtoothAdvection(Problem):
    """Sawtooth profile advected at v=1 over a periodic unit box; after
    t = 1 (one period) the profile returns to the IC. Tolerance 0.015 at
    400 cells (reference ``test_advection.cpp:155``)."""

    name = "Advection"
    physics = PhysicsTraits(hydro_enabled=False)
    advection_velocity = (1.0, 0.0, 0.0)

    @staticmethod
    def _exact(grid):
        x = grid.cell_centers(0)[:, None, None]
        L = grid.prob_hi[0] - grid.prob_lo[0]
        value = jnp.mod(x + 0.5 * L, L)
        return jnp.broadcast_to(value, grid.n_cell)

    def set_initial_conditions(self, grid):
        return self._exact(grid)[None]

    def compute_reference_solution(self, sim):
        # after an integer number of periods the exact solution is the IC
        return self._exact(sim.grid)[None]


@register_problem
class SemiellipseAdvection(Problem):
    """Semi-ellipse pulse (reference AdvectionSemiellipse)."""

    name = "AdvectionSemiellipse"
    physics = PhysicsTraits(hydro_enabled=False)
    advection_velocity = (1.0, 0.0, 0.0)

    @staticmethod
    def _exact(grid):
        x = grid.cell_centers(0)[:, None, None]
        dist = jnp.abs(x - 0.2)
        val = jnp.where(dist <= 0.15, jnp.sqrt(jnp.clip(1.0 - (dist / 0.15) ** 2, 0.0)), 0.0)
        return jnp.broadcast_to(val, grid.n_cell)

    def set_initial_conditions(self, grid):
        return self._exact(grid)[None]

    def compute_reference_solution(self, sim):
        return self._exact(sim.grid)[None]
