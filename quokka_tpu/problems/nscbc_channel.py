"""NSCBC channel: subsonic characteristic inflow + outflow (1D/2D).

Rebuild of the reference's NSCBC Channel problem
(``src/problems/NSCBC/channel.cpp``): gas initially at rest between a
characteristic inflow boundary (targets T_t, u_t) and a characteristic
outflow boundary (target pressure P_t). The flow must relax to the uniform
subsonic channel state without reflecting waves at either end.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..registry import (
    BC_NSCBC_INFLOW,
    BC_NSCBC_OUTFLOW,
    BCSpec,
    EOSTraits,
    PhysicsTraits,
    Problem,
    register_problem,
)

RHO0 = 1.0
T0 = 1.0
U_TARGET = 0.3  # subsonic (cs = sqrt(1.4))


@register_problem
class NSCBCChannelProblem(Problem):
    name = "NSCBCChannel"
    physics = PhysicsTraits(hydro_enabled=True)
    eos_traits = EOSTraits(gamma=1.4, mean_molecular_weight=1.0,
                           boltzmann_constant=1.0)
    bcs = BCSpec(x=(BC_NSCBC_INFLOW, BC_NSCBC_OUTFLOW))

    nscbc_outflow_pressure = RHO0 * T0  # P = rho kB T / mu

    def nscbc_inflow_targets(self, grid, time):
        return (T0, U_TARGET, 0.0, 0.0, ())

    def set_initial_conditions(self, grid):
        shape = grid.n_cell
        layout = self.physics.layout()
        eos = self.make_eos()
        eint = eos.eint_from_tgas(RHO0, T0) * jnp.ones(shape)
        U = jnp.zeros((layout.nvar, *shape))
        U = U.at[0].set(RHO0)
        U = U.at[4].set(eint)
        U = U.at[5].set(eint)
        return U
