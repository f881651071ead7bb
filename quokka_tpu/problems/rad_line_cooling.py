"""Line cooling + cosmic-ray heating in a transparent medium (0D-ish).

Rebuild of the reference's RadLineCooling problem
(``src/problems/RadLineCooling/test_rad_line_cooling.cpp``): zero opacity,
gas cools by lines at 0.1 T per unit time and is heated by cosmic rays at
0.03; the line-cooling energy appears in the radiation field. Exact:
dT/dt = -0.1 T + 0.03 (with rho c_v = 1), so T -> 0.3 exponentially and
Erad integrates the emitted line energy.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..indices import EGAS, EINT, RHO
from ..registry import (
    BCSpec, EOSTraits, ISMTraits, PhysicsTraits, Problem, RadTraits,
    register_problem,
)

COOLING_RATE = 0.1
CR_HEATING_RATE = 0.03
T0 = 1.0
RHO0 = 2.0 / 3.0  # rho c_v = 1 with gamma = 5/3, mu = kB = 1
C_CODE = 1.0e2


@register_problem
class RadLineCoolingProblem(Problem):
    name = "RadLineCooling"
    physics = PhysicsTraits(hydro_enabled=True, radiation_enabled=True)
    eos_traits = EOSTraits(gamma=5.0 / 3.0, mean_molecular_weight=1.0,
                           boltzmann_constant=1.0)
    rad = RadTraits(c_light=C_CODE, c_hat=C_CODE, radiation_constant=1.0,
                    Erad_floor=1e-14, beta_order=0)
    ism = ISMTraits(
        enable_dust_gas_thermal_coupling_model=True,
        dust_gas_coeff=1.0e-20,  # effectively decoupled dust
        mean_molecular_mass=1.0,
    )
    bcs = BCSpec()  # periodic

    def compute_planck_opacity(self, rho, T):
        return jnp.zeros_like(rho)

    def define_net_cooling_rate(self, T, n_H):
        return (COOLING_RATE * T)[None]

    def define_net_cooling_rate_temp_derivative(self, T, n_H):
        return (COOLING_RATE * jnp.ones_like(T))[None]

    def define_cosmic_ray_heating_rate(self, n_H):
        return CR_HEATING_RATE * jnp.ones_like(n_H)

    def set_initial_conditions(self, grid):
        shape = grid.n_cell
        layout = self.physics.layout()
        eos = self.make_eos()
        eint = eos.eint_from_tgas(RHO0, T0) * jnp.ones(shape)
        U = jnp.zeros((layout.nvar, *shape))
        U = U.at[RHO].set(RHO0)
        U = U.at[EGAS].set(eint)
        U = U.at[EINT].set(eint)
        U = U.at[layout.rad_index(0, 0)].set(1e-14)
        return U
