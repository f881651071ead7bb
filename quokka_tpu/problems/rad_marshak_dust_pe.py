"""Marshak wave with weak dust coupling + photoelectric heating (1D, 2 groups).

Rebuild of the reference's RadMarshakDustPE problem
(``src/problems/RadMarshakDustPE/test_radiation_marshak_dust_and_PE.cpp``):
an optically thin medium (kappa1 = kappa2 = 1e-20) with an FUV streaming
inflow at x-lo (E_FUV = a T_L^4 = 1) and a CONSTANT photoelectric heating
rate derivative (``DefinePhotoelectricHeatingE1Derivative = 1/s``,
reference :77-90).  Because the dust is transparent, the radiation front
simply streams at c and the gas behind it heats photoelectrically at
PE_rate * E_FUV:

    E_FUV(x) = E_L,  E_IR(x) = 0,  T_gas(x) = T0 + PE_rate (t - x/c)

for x < c t (reference :246-252; rel-L1 tolerance 1%).  Run twice by the
reference with the gas-dust interaction coefficient at 1e20 ("coupled",
tests/RadMarshakDustPEcoupled.in) and 1e-20 ("decoupled",
tests/RadMarshakDustPEdecoupled.in) — exercising both regimes of the dust
solver with an identical exact solution.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..indices import EGAS, EINT, MX1, RHO
from ..registry import (
    BC_OUTFLOW,
    BC_PERIODIC,
    BC_USER,
    BCSpec,
    EOSTraits,
    ISMTraits,
    PhysicsTraits,
    Problem,
    RadTraits,
    register_problem,
)

PE_RATE = 1.0  # photoelectric heating rate derivative [1/s]
C_CODE = 1.0
RHO0 = 1.0
CV = 1.0
MU = 1.5 / CV
T_INIT = 1.0
A_RAD = 1.0
ERAD_FLOOR = 1.0e-6
T_RAD_L = 1.0
ERAD_L = A_RAD * T_RAD_L**4
KAPPA_DEFAULT = 1.0e-20  # problem.kappa1/kappa2 in the reference decks
N_GROUPS = 2
EDGES = (1.0e-10, 30.0, 1.0e4)


@register_problem
class RadMarshakDustPEProblem(Problem):
    name = "RadMarshakDustPE"
    physics = PhysicsTraits(hydro_enabled=False, radiation_enabled=True,
                            n_groups=N_GROUPS)
    eos_traits = EOSTraits(gamma=5.0 / 3.0, mean_molecular_weight=MU,
                           boltzmann_constant=1.0)
    rad = RadTraits(c_light=C_CODE, c_hat=C_CODE, radiation_constant=A_RAD,
                    Erad_floor=ERAD_FLOOR, beta_order=1, group_edges=EDGES,
                    energy_unit=1.0)
    ism = ISMTraits(
        enable_dust_gas_thermal_coupling_model=True,
        enable_photoelectric_heating=True,
        gas_dust_coupling_threshold=1.0e-4,
        # reference decks override via radiation.dust_gas_interaction_coeff
        dust_gas_coeff=1.0e20,
        mean_molecular_mass=MU,
    )
    bcs = BCSpec(
        x=(BC_USER, BC_OUTFLOW),
        y=(BC_PERIODIC, BC_PERIODIC),
        z=(BC_PERIODIC, BC_PERIODIC),
    )

    def __init__(self, kappa1: float = KAPPA_DEFAULT,
                 kappa2: float = KAPPA_DEFAULT):
        self.kappa1 = kappa1
        self.kappa2 = kappa2

    def compute_group_opacities(self, boundaries, rho, T):
        return jnp.stack([jnp.full_like(rho, self.kappa1),
                          jnp.full_like(rho, self.kappa2)])

    def define_photoelectric_heating_E1_derivative(self, T, n_H):
        return jnp.full_like(T, PE_RATE)

    def fill_user_boundary(self, Ug, grid, ng, time, axis, side):
        if axis != 0 or side != 0:
            return Ug
        layout = self.physics.layout()
        g = ng[0]
        sl = slice(0, g)
        # streaming inflow: FUV (group 2) at E_L with F = c E; IR at floor
        Erads = (ERAD_FLOOR, ERAD_L)
        for gi in range(N_GROUPS):
            Ug = Ug.at[layout.rad_index(gi, 0), sl].set(Erads[gi])
            Ug = Ug.at[layout.rad_index(gi, 1), sl].set(C_CODE * Erads[gi])
            Ug = Ug.at[layout.rad_index(gi, 2), sl].set(0.0)
            Ug = Ug.at[layout.rad_index(gi, 3), sl].set(0.0)
        Egas = T_INIT * CV
        Ug = Ug.at[RHO, sl].set(RHO0)
        Ug = Ug.at[EGAS, sl].set(Egas)
        Ug = Ug.at[EINT, sl].set(Egas)
        for n in range(3):
            Ug = Ug.at[MX1 + n, sl].set(0.0)
        return Ug

    def set_initial_conditions(self, grid):
        shape = grid.n_cell
        layout = self.physics.layout()
        Egas0 = T_INIT * CV
        U = jnp.zeros((layout.nvar, *shape))
        U = U.at[RHO].set(RHO0)
        U = U.at[EGAS].set(Egas0)
        U = U.at[EINT].set(Egas0)
        for gi in range(N_GROUPS):
            U = U.at[layout.rad_index(gi, 0)].set(ERAD_FLOOR)
        return U

    @staticmethod
    def exact_solution(x, t):
        """(E_IR, E_FUV, T_gas) behind/ahead of the front at time t
        (reference :246-252)."""
        import numpy as np

        front = x < C_CODE * t
        e_ir = np.zeros_like(x)
        e_fuv = np.where(front, ERAD_L, ERAD_FLOOR)
        T = np.where(front, T_INIT + PE_RATE * (t - x / C_CODE), T_INIT)
        return e_ir, e_fuv, T
