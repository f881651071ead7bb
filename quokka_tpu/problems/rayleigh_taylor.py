"""Rayleigh-Taylor instability (2D, constant external gravity).

Rebuild of the reference's RayleighTaylor2D problem
(``src/problems/RayleighTaylor2D/test_hydro2d_rt.cpp``): heavy fluid
(rho = 2) over light (rho = 1) in a constant downward gravity, hydrostatic
pressure profile P = P0 + rho g y, single-mode-ish random velocity
perturbation at the interface; periodic in x, reflecting in y.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..registry import (
    BC_PERIODIC,
    BC_REFLECT,
    BCSpec,
    EOSTraits,
    PhysicsTraits,
    Problem,
    register_problem,
)

RHO_TOP = 2.0
RHO_BOT = 1.0
G_Y = -0.1
P0 = 2.5
AMP = 0.01


@register_problem
class RayleighTaylor2DProblem(Problem):
    name = "RayleighTaylor2D"
    physics = PhysicsTraits(hydro_enabled=True)
    eos_traits = EOSTraits(gamma=1.4, mean_molecular_weight=1.0,
                           boltzmann_constant=1.0)
    bcs = BCSpec(x=(BC_PERIODIC, BC_PERIODIC), y=(BC_REFLECT, BC_REFLECT))

    perturb: bool = True

    def external_acceleration(self, grid):
        g = jnp.zeros((3, *grid.n_cell))
        return g.at[1].set(G_Y)

    def set_initial_conditions(self, grid):
        x, y, _z = grid.cell_center_mesh()
        shape = grid.n_cell
        layout = self.physics.layout()
        gmm = self.eos_traits.gamma

        heavy = y > 0.0
        rho = jnp.where(heavy, RHO_TOP, RHO_BOT)
        P = P0 + rho * G_Y * y
        if self.perturb:
            rng = np.random.default_rng(42)
            amp = AMP * jnp.asarray(rng.random(shape))
            vy = amp * (1.0 + jnp.cos(8.0 * jnp.pi * jnp.broadcast_to(y, shape) / 3.0)) / 2.0
        else:
            vy = jnp.zeros(shape)

        rho = jnp.broadcast_to(rho, shape)
        P = jnp.broadcast_to(P, shape)
        eint = P / (gmm - 1.0)
        U = jnp.zeros((layout.nvar, *shape))
        U = U.at[0].set(rho)
        U = U.at[2].set(rho * vy)
        U = U.at[4].set(eint + 0.5 * rho * vy * vy)
        U = U.at[5].set(eint)
        return U
