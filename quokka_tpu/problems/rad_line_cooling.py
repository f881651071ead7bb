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


# -------------------------------------------------------- multigroup variant
# (reference ``src/problems/RadLineCoolingMG/test_rad_line_cooling_MG.cpp``):
# 4 photon groups, zero continuum opacity; the line cools into GROUP 0 at
# 0.1 T per unit time while cosmic rays heat at 0.03 and photoelectric
# heating draws 0.02 x (E_FUV / E_FUV0) from the LAST group (whose energy
# stays at E_FUV0 = 1, so the PE rate is constant).  Closed-form exact
# (reference :225-242, tolerance 5e-4):
#   Egas(t) = e^{-l t} (l T0 - H + H e^{l t}) / l,  l = 0.1, H = 0.03 + 0.02
#   Erad_line(t) = -(Egas - c_v T0 - H t) (chat/c)
PE_RATE = 0.02
MG_EDGES = (1.0e-3, 1.77827941e-2, 3.16227766e-1, 5.62341325, 1.0e2)
ERAD_FUV0 = 1.0


@register_problem
class RadLineCoolingMGProblem(Problem):
    name = "RadLineCoolingMG"
    physics = PhysicsTraits(hydro_enabled=True, radiation_enabled=True,
                            n_groups=4)
    eos_traits = EOSTraits(gamma=5.0 / 3.0, mean_molecular_weight=1.0,
                           boltzmann_constant=1.0)
    rad = RadTraits(c_light=C_CODE, c_hat=C_CODE, radiation_constant=1.0,
                    Erad_floor=1e-20, beta_order=0,
                    group_edges=MG_EDGES, energy_unit=1.0)
    ism = ISMTraits(
        enable_dust_gas_thermal_coupling_model=True,
        enable_photoelectric_heating=True,
        dust_gas_coeff=1.0e-20,  # effectively decoupled dust
        mean_molecular_mass=1.0,
    )
    bcs = BCSpec()  # periodic

    def compute_group_opacities(self, boundaries, rho, T):
        return jnp.zeros((4, *jnp.shape(rho)), rho.dtype)

    def define_net_cooling_rate(self, T, n_H):
        cool = jnp.zeros((4, *jnp.shape(T)))
        return cool.at[0].set(COOLING_RATE * T)

    def define_net_cooling_rate_temp_derivative(self, T, n_H):
        cool = jnp.zeros((4, *jnp.shape(T)))
        return cool.at[0].set(COOLING_RATE)

    def define_cosmic_ray_heating_rate(self, n_H):
        return CR_HEATING_RATE * jnp.ones_like(n_H)

    def define_photoelectric_heating_E1_derivative(self, T, n_H):
        return (PE_RATE / ERAD_FUV0) * jnp.ones_like(T)

    @staticmethod
    def exact_trajectory(t):
        import numpy as np

        t = np.asarray(t)
        lam = COOLING_RATE
        H = CR_HEATING_RATE + PE_RATE
        Egas = np.exp(-lam * t) * (lam * T0 - H + H * np.exp(lam * t)) / lam
        Tgas = Egas  # rho c_v = 1
        Erad_line = -(Egas - T0 - H * t)
        return Tgas, Erad_line

    def set_initial_conditions(self, grid):
        shape = grid.n_cell
        layout = self.physics.layout()
        eos = self.make_eos()
        eint = eos.eint_from_tgas(RHO0, T0) * jnp.ones(shape)
        U = jnp.zeros((layout.nvar, *shape))
        U = U.at[RHO].set(RHO0)
        U = U.at[EGAS].set(eint)
        U = U.at[EINT].set(eint)
        for g in range(4):
            U = U.at[layout.rad_index(g, 0)].set(1e-20)
        U = U.at[layout.rad_index(3, 0)].set(ERAD_FUV0)  # FUV group
        return U
