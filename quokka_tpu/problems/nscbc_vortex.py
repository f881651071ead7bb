"""NSCBC Vortex: subsonic vortex advecting through NSCBC outflow boundaries.

Rebuild of the reference's second NSCBC problem
(``src/problems/NSCBC/vortex.cpp`` + ``tests/NSCBC_Vortex.in``): an
isentropic-style Gaussian vortex superposed on a uniform subsonic flow of
air (mu = 28.96 m_u, T = 300 K, P = 1 atm, u0 = 1e4 cm/s) advects out
through characteristic outflow boundaries on x, periodic in y/z.  A
correct NSCBC implementation (with transverse terms) lets the vortex leave
with minimal acoustic reflection -- the pressure field relaxes back toward
P_ref instead of ringing.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..eos import K_BOLTZMANN_CGS, M_U_CGS
from ..indices import EGAS, EINT, MX1, MX2, RHO, SCALAR0
from ..registry import (
    BC_NSCBC_OUTFLOW,
    BC_PERIODIC,
    BCSpec,
    EOSTraits,
    PhysicsTraits,
    Problem,
    register_problem,
)

GAMMA = 1.4
MU = 28.96 * M_U_CGS  # air
T_REF = 300.0
P_REF = 1.01325e6     # 1 atm in erg/cm^3
G_VORTEX = 1.1e3      # cm^2/s
U0 = 1.0e4            # cm/s inflow
S0 = 0.0


@register_problem
class NSCBCVortexProblem(Problem):
    name = "NSCBCVortex"
    physics = PhysicsTraits(hydro_enabled=True, n_scalars=1)
    eos_traits = EOSTraits(gamma=GAMMA, mean_molecular_weight=MU,
                           boltzmann_constant=K_BOLTZMANN_CGS)
    bcs = BCSpec(x=(BC_NSCBC_OUTFLOW, BC_NSCBC_OUTFLOW),
                 y=(BC_PERIODIC, BC_PERIODIC), z=(BC_PERIODIC, BC_PERIODIC))

    nscbc_outflow_pressure = P_REF

    def set_initial_conditions(self, grid):
        shape = grid.n_cell
        layout = self.physics.layout()
        x, y, _z = grid.cell_center_mesh()
        R = K_BOLTZMANN_CGS / MU
        c = (GAMMA * R * T_REF) ** 0.5
        R_v = 0.1 * (grid.prob_hi[0] - grid.prob_lo[0])

        r2 = jnp.broadcast_to(x**2 + y**2, shape)
        P = P_REF - 0.5 * G_VORTEX**2 * P_REF * GAMMA * jnp.exp(-r2 / R_v**2) \
            / (R_v**2 * c**2)
        rho = P / (R * T_REF)
        envelope = jnp.exp(-0.5 * r2 / R_v**2)
        u = U0 - G_VORTEX * jnp.broadcast_to(y, shape) * envelope / R_v**2
        v = G_VORTEX * jnp.broadcast_to(x, shape) * envelope / R_v**2

        eint = P / (GAMMA - 1.0)
        U = jnp.zeros((layout.nvar, *shape))
        U = U.at[RHO].set(rho)
        U = U.at[MX1].set(rho * u)
        U = U.at[MX2].set(rho * v)
        U = U.at[EGAS].set(eint + 0.5 * rho * (u * u + v * v))
        U = U.at[EINT].set(eint)
        U = U.at[SCALAR0].set(S0)
        return U
