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


@register_problem
class RayleighTaylor3DProblem(Problem):
    """3D single-mode-seeded RT (reference
    ``src/problems/RayleighTaylor3D/test_hydro3d_rt.cpp``): heavy over
    light along z with a passive scalar marking the heavy fluid, random
    z-velocity perturbation amp*(1+cos(8 pi z / 3))/2, periodic in x/y,
    reflecting in z; density-gradient AMR tagging above rho_min = 0.1."""

    name = "RayleighTaylor3D"
    physics = PhysicsTraits(hydro_enabled=True, n_scalars=1)
    eos_traits = EOSTraits(gamma=1.4, mean_molecular_weight=1.0,
                           boltzmann_constant=1.0)
    bcs = BCSpec(x=(BC_PERIODIC, BC_PERIODIC), y=(BC_PERIODIC, BC_PERIODIC),
                 z=(BC_REFLECT, BC_REFLECT))

    perturb: bool = True

    def external_acceleration(self, grid):
        g = jnp.zeros((3, *grid.n_cell))
        return g.at[2].set(G_Y)

    def error_est(self, sim, level):
        from ..stencil import sh

        rho = sim.level_U[level][0]
        grad = jnp.zeros_like(rho)
        for d in sim.level_grids[level].active_axes:
            grad = jnp.maximum(
                grad, jnp.abs(0.5 * (sh(rho, 1, d) - sh(rho, -1, d))) / rho
            )
        return (grad > 0.2) & (rho > 0.1)

    def set_initial_conditions(self, grid):
        x, y, z = grid.cell_center_mesh()
        shape = grid.n_cell
        layout = self.physics.layout()
        gmm = self.eos_traits.gamma

        heavy = jnp.broadcast_to(z > 0.0, shape)
        rho = jnp.where(heavy, RHO_TOP, RHO_BOT)
        scalar = jnp.where(heavy, 1.0, 0.0)
        P = jnp.broadcast_to(P0 + rho * G_Y * z, shape)
        if self.perturb:
            rng = np.random.default_rng(42)
            amp = AMP * jnp.asarray(rng.random(shape))
            vz = amp * (1.0 + jnp.cos(8.0 * jnp.pi * jnp.broadcast_to(z, shape) / 3.0)) / 2.0
        else:
            vz = jnp.zeros(shape)

        eint = P / (gmm - 1.0)
        U = jnp.zeros((layout.nvar, *shape))
        U = U.at[0].set(rho)
        U = U.at[3].set(rho * vz)
        U = U.at[4].set(eint + 0.5 * rho * vz * vz)
        U = U.at[5].set(eint)
        U = U.at[6].set(scalar * rho)
        return U
