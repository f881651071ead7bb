"""Radiation pulse in the strong-diffusion regime (reference
``src/problems/RadPulse/test_radiation_pulse.cpp``).

Linear radiation diffusion: opacity ~ T^3 with optical depth per cell
~1e5 at the pulse peak, making this a stringent test of the
asymptotic-preserving property of the IMEX scheme + implicit coupling.
The gas temperature profile must follow the analytic Gaussian diffusion
solution with D = 4 c a T0^3 / (3 kappa0), rel. L1 error < 0.01.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..indices import EGAS, EINT, RHO
from ..registry import (
    BC_OUTFLOW,
    BC_PERIODIC,
    BCSpec,
    EOSTraits,
    PhysicsTraits,
    Problem,
    RadTraits,
    register_problem,
)

KAPPA0 = 1.0e5  # cm^-1 at T0
T0 = 1.0
RHO0 = 1.0
A_RAD = 4.0e-10
C = 1.0e8
CHAT = 1.0e7
ERAD_FLOOR = A_RAD * 1.0e-10
INITIAL_TIME = 1.0e-8
SIGMA = 0.025


def exact_Trad(x, t):
    D = 4.0 * C * A_RAD * T0**3 / (3.0 * KAPPA0)
    width_sq = SIGMA * SIGMA + D * t
    normfac = 1.0 / (2.0 * np.sqrt(np.pi * width_sq))
    return 0.5 * normfac * np.exp(-(x * x) / (4.0 * width_sq))


@register_problem
class RadPulseProblem(Problem):
    name = "RadPulse"
    physics = PhysicsTraits(hydro_enabled=False, radiation_enabled=True)
    eos_traits = EOSTraits(
        gamma=5.0 / 3.0, mean_molecular_weight=1.0, boltzmann_constant=2.0 / 3.0
    )
    rad = RadTraits(
        c_light=C, c_hat=CHAT, radiation_constant=A_RAD,
        Erad_floor=ERAD_FLOOR, beta_order=0,
    )
    bcs = BCSpec(x=(BC_OUTFLOW, BC_OUTFLOW))

    def compute_planck_opacity(self, rho, T):
        return (KAPPA0 / rho) * jnp.maximum((T / T0) ** 3, 1.0)

    def set_initial_conditions(self, grid):
        shape = grid.n_cell
        layout = self.physics.layout()
        eos = self.make_eos()
        x = np.asarray(grid.cell_centers(0))
        x0 = grid.prob_lo[0] + 0.5 * (grid.prob_hi[0] - grid.prob_lo[0])
        Trad = exact_Trad(x - x0, INITIAL_TIME)
        Egas = np.asarray(eos.eint_from_tgas(RHO0, Trad))[:, None, None]

        U = jnp.zeros((layout.nvar, *shape))
        U = U.at[RHO].set(RHO0)
        U = U.at[EGAS].set(jnp.broadcast_to(Egas, shape))
        U = U.at[EINT].set(jnp.broadcast_to(Egas, shape))
        U = U.at[layout.rad_index(0, 0)].set(ERAD_FLOOR)
        return U
