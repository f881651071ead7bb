"""Lowrie & Edwards (2008) nonequilibrium radiative shock (Mach 3, 1D).

Rebuild of the reference's RadhydroShock problem
(``src/problems/RadhydroShock/test_radhydro_shock.cpp``): dimensionless
units with P0 = a_rad = 1e-4, sigma_a = 1e6, c = sqrt(3 sigma_a) c_s0,
gamma = mu = 5/3 so c_s0 = 1 at T0 = 1. The upstream/downstream equilibrium
states are the radiative Rankine-Hugoniot values of Lowrie & Edwards
(T1 = 3.661913, rho1 = 3.002168). Fixed-state boundaries hold the two
equilibria; the shock relaxes to its stationary structure near
x = shock_position.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..indices import EGAS, EINT, MX1, RHO
from ..registry import (
    BC_PERIODIC,
    BC_USER,
    BCSpec,
    EOSTraits,
    PhysicsTraits,
    Problem,
    RadTraits,
    register_problem,
)

A_RAD = 1.0e-4
SIGMA_A = 1.0e6
MACH0 = 3.0
C_S0 = 1.0
C_LIGHT = 1732.0508075688772  # sqrt(3 sigma_a) c_s0
KAPPA = SIGMA_A * (C_S0 / C_LIGHT)
GAMMA = 5.0 / 3.0
MU = GAMMA  # so c_s0 = 1 with kB = 1
K_B = C_S0 * C_S0
C_V = K_B / (MU * (GAMMA - 1.0))

T0, RHO0 = 1.0, 1.0
V0 = MACH0 * C_S0
T1 = 3.661912665809719
RHO1 = 3.0021676971081166
V1 = V0 * (RHO0 / RHO1)
CHAT = 10.0 * (V0 + C_S0)
SHOCK_POS = 0.0130
LX = 0.01578396467532876


def _state(rho, v, T):
    egas = RHO0 * 0.0 + rho * C_V * T
    erad = A_RAD * T**4
    return rho, rho * v, egas, erad


@register_problem
class RadhydroShockProblem(Problem):
    name = "RadhydroShock"
    physics = PhysicsTraits(hydro_enabled=True, radiation_enabled=True)
    eos_traits = EOSTraits(gamma=GAMMA, mean_molecular_weight=MU,
                           boltzmann_constant=K_B)
    rad = RadTraits(c_light=C_LIGHT, c_hat=CHAT, radiation_constant=A_RAD,
                    Erad_floor=0.0, beta_order=1)
    bcs = BCSpec(x=(BC_USER, BC_USER),
                 y=(BC_PERIODIC, BC_PERIODIC),
                 z=(BC_PERIODIC, BC_PERIODIC))

    def compute_planck_opacity(self, rho, T):
        return KAPPA / rho

    def compute_flux_mean_opacity(self, rho, T):
        return KAPPA / rho

    def _fill_slab(self, Ug, sl, rho, v, T):
        layout = self.physics.layout()
        egas = rho * C_V * T
        Ug = Ug.at[RHO, sl].set(rho)
        Ug = Ug.at[MX1, sl].set(rho * v)
        Ug = Ug.at[MX1 + 1, sl].set(0.0)
        Ug = Ug.at[MX1 + 2, sl].set(0.0)
        Ug = Ug.at[EGAS, sl].set(egas + 0.5 * rho * v * v)
        Ug = Ug.at[EINT, sl].set(egas)
        Ug = Ug.at[layout.rad_index(0, 0), sl].set(A_RAD * T**4)
        Ug = Ug.at[layout.rad_index(0, 1), sl].set(0.0)
        Ug = Ug.at[layout.rad_index(0, 2), sl].set(0.0)
        Ug = Ug.at[layout.rad_index(0, 3), sl].set(0.0)
        return Ug

    def fill_user_boundary(self, Ug, grid, ng, time, axis, side):
        if axis != 0:
            return Ug
        g = ng[0]
        if side == 0:
            return self._fill_slab(Ug, slice(0, g), RHO0, V0, T0)
        n = Ug.shape[1]
        return self._fill_slab(Ug, slice(n - g, n), RHO1, V1, T1)

    def set_initial_conditions(self, grid):
        x, _y, _z = grid.cell_center_mesh()
        shape = grid.n_cell
        layout = self.physics.layout()
        pre = x < SHOCK_POS
        rho = jnp.where(pre, RHO0, RHO1)
        v = jnp.where(pre, V0, V1)
        T = jnp.where(pre, T0, T1)
        egas = rho * C_V * T
        U = jnp.zeros((layout.nvar, *shape))
        U = U.at[RHO].set(jnp.broadcast_to(rho, shape))
        U = U.at[MX1].set(jnp.broadcast_to(rho * v, shape))
        U = U.at[EGAS].set(jnp.broadcast_to(egas + 0.5 * rho * v * v, shape))
        U = U.at[EINT].set(jnp.broadcast_to(egas, shape))
        U = U.at[layout.rad_index(0, 0)].set(jnp.broadcast_to(A_RAD * T**4, shape))
        return U
