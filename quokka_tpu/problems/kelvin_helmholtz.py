"""Kelvin-Helmholtz instability, 2D (reference
``src/problems/HydroKelvinHelmholz/test_hydro2d_kh.cpp:46-88``).

Shear layer with tanh profile (L = 0.01), density contrast 1.5/0.5,
sinusoidal vy perturbation (A = 0.01, sigma = 0.2), P = 2.5, periodic box.
No exact solution -- exercised as a stability/conservation problem.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..indices import EGAS, EINT, MX1, MX2, RHO
from ..registry import EOSTraits, PhysicsTraits, Problem, register_problem


@register_problem
class KelvinHelmholtzProblem(Problem):
    name = "HydroKelvinHelmholz"
    physics = PhysicsTraits(hydro_enabled=True)
    eos_traits = EOSTraits(gamma=1.4)

    def set_initial_conditions(self, grid):
        x, y, _z = grid.cell_center_mesh()
        x0 = grid.prob_lo[0] + 0.5 * (grid.prob_hi[0] - grid.prob_lo[0])
        y0 = grid.prob_lo[1] + 0.5 * (grid.prob_hi[1] - grid.prob_lo[1])
        A, L, sigma = 0.01, 0.01, 0.2
        g = self.eos_traits.gamma

        yy = jnp.abs(y - y0) - 0.25
        rho = 1.5 - 0.5 * jnp.tanh(yy / L)
        vx = 0.5 * jnp.tanh(yy / L)
        vy = A * jnp.cos(4.0 * jnp.pi * (x - x0)) * jnp.exp(-(yy * yy) / (sigma * sigma))
        P = 2.5

        shape = grid.n_cell
        rho = jnp.broadcast_to(rho * jnp.ones_like(x), shape)
        vx = jnp.broadcast_to(vx * jnp.ones_like(x), shape)
        vy = jnp.broadcast_to(vy, shape)
        eint = jnp.full(shape, P / (g - 1.0))
        U = jnp.stack([
            rho,
            rho * vx,
            rho * vy,
            jnp.zeros(shape),
            eint + 0.5 * rho * (vx * vx + vy * vy),
            eint,
        ])
        return U
