"""Advecting radiation pulse in the diffusion regime (1D, CGS).

Rebuild of the reference's RadhydroPulse problem
(``src/problems/RadhydroPulse/test_radhydro_pulse.cpp``): a Gaussian
temperature pulse in pressure balance (gas + radiation pressure constant,
rho(x) = rho0 T0/T + (a mu / 3 k_B)(T0^4/T - T^3)) with tau = 2e3 per
pulse width (static diffusion) and optional advection at v0 = 1e6 cm/s
(beta tau = 6e-2). The acceptance criterion is frame invariance: the
advected pulse, shifted back by v0 t, must match the comoving solution
(and Tgas must track Trad) -- the test of the O(beta tau) work terms.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..indices import EGAS, EINT, MX1, RHO
from ..registry import (
    BCSpec, EOSTraits, PhysicsTraits, Problem, RadTraits, register_problem,
)

C_CGS = 2.99792458e10
A_RAD = 7.565731356724124e-15
K_B = 1.380649e-16
M_U = 1.66053906892e-24
MU = 2.33 * M_U
T0 = 1.0e7
T1 = 2.0e7
RHO0 = 1.2
WIDTH = 24.0
KAPPA0 = 100.0
V0_ADV = 1.0e6
ERAD_FLOOR = A_RAD * T0**4 * 1.0e-10


def exact_T(x):
    return T0 + (T1 - T0) * jnp.exp(-x * x / (2.0 * WIDTH**2))


def exact_rho(x):
    T = exact_T(x)
    return RHO0 * T0 / T + (A_RAD * MU / (3.0 * K_B)) * (T0**4 / T - T**3)


@register_problem
class RadhydroPulseProblem(Problem):
    name = "RadhydroPulse"
    physics = PhysicsTraits(hydro_enabled=True, radiation_enabled=True)
    eos_traits = EOSTraits(gamma=5.0 / 3.0, mean_molecular_weight=MU,
                           boltzmann_constant=K_B)
    rad = RadTraits(c_light=C_CGS, c_hat=C_CGS, radiation_constant=A_RAD,
                    Erad_floor=ERAD_FLOOR, beta_order=1)
    bcs = BCSpec()  # periodic

    v0: float = 0.0  # set to V0_ADV for the advecting variant

    def compute_planck_opacity(self, rho, T):
        return jnp.full_like(rho, KAPPA0)

    def compute_flux_mean_opacity(self, rho, T):
        return jnp.full_like(rho, KAPPA0)

    def set_initial_conditions(self, grid):
        x, _y, _z = grid.cell_center_mesh()
        shape = grid.n_cell
        layout = self.physics.layout()
        eos = self.make_eos()
        x0 = 0.5 * (grid.prob_lo[0] + grid.prob_hi[0])
        T = jnp.broadcast_to(exact_T(x - x0), shape)
        rho = jnp.broadcast_to(exact_rho(x - x0), shape)
        Erad = A_RAD * T**4
        eint = eos.eint_from_tgas(rho, T)
        v0 = self.v0
        beta2 = (v0 / C_CGS) ** 2
        U = jnp.zeros((layout.nvar, *shape))
        U = U.at[RHO].set(rho)
        U = U.at[MX1].set(rho * v0)
        U = U.at[EGAS].set(eint + 0.5 * rho * v0 * v0)
        U = U.at[EINT].set(eint)
        # comoving -> lab frame to O(beta^2) (reference :168-176)
        U = U.at[layout.rad_index(0, 0)].set((1.0 + (4.0 / 3.0) * beta2) * Erad)
        U = U.at[layout.rad_index(0, 1)].set((4.0 / 3.0) * v0 * Erad)
        return U
