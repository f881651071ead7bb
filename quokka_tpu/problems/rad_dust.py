"""Streaming FUV radiation into warm dusty gas (1D, 2 groups).

Rebuild of the reference's RadMarshakDust problem
(``src/problems/RadMarshakDust/test_radiation_marshak_dust.cpp``): gas at
T = 1 with dust coupling, an FUV (group 2) streaming inflow at x-lo with
E_FUV = a T_L^4 = 100, IR opacity kappa1 = 1e10 (trapped), FUV opacity
kappa2 = 1. The exact solution behind the front (x < c t):

    E_FUV(x) = E_L exp(-rho kappa2 x)
    E_IR(x)  = E_L exp(-rho kappa2 x) (t - x)      (re-emitted by dust)
    T_gas    = 1                                   (dust keeps gas fixed)

checked at stop_time with a 1% composite L1 criterion (reference
``:230-270``). Dust-gas interaction coefficient is the runtime key
``radiation.dust_gas_interaction_coeff`` (reference deck: 1e-2).
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

C_CODE = 1.0
CHAT = 1.0
A_RAD = 1.0e10
RHO0 = 1.0
CV = 1.0
MU = 1.5 / CV  # so eint = CV * rho * T with gamma = 5/3, kB = 1
T_INIT = 1.0
T_RAD_INIT = 1.0e-5
T_RAD_L = 1.0e-2
ERAD_L = A_RAD * T_RAD_L**4  # = 100
ERAD_FLOOR = 1.0e-10
KAPPA1 = 1.0e10  # IR
KAPPA2 = 1.0  # FUV
N_GROUPS = 2
EDGES = (1.0e-10, 100.0, 1.0e4)


@register_problem
class RadMarshakDustProblem(Problem):
    name = "RadMarshakDust"
    physics = PhysicsTraits(hydro_enabled=False, radiation_enabled=True,
                            n_groups=N_GROUPS)
    eos_traits = EOSTraits(gamma=5.0 / 3.0, mean_molecular_weight=MU,
                           boltzmann_constant=1.0)
    rad = RadTraits(c_light=C_CODE, c_hat=CHAT, radiation_constant=A_RAD,
                    Erad_floor=ERAD_FLOOR, beta_order=1, group_edges=EDGES)
    ism = ISMTraits(
        enable_dust_gas_thermal_coupling_model=True,
        enable_photoelectric_heating=False,
        dust_gas_coeff=1.0e-2,
        mean_molecular_mass=MU,
    )
    bcs = BCSpec(
        x=(BC_USER, BC_OUTFLOW),
        y=(BC_PERIODIC, BC_PERIODIC),
        z=(BC_PERIODIC, BC_PERIODIC),
    )

    def compute_group_opacities(self, boundaries, rho, T):
        return jnp.stack([jnp.full_like(rho, KAPPA1),
                          jnp.full_like(rho, KAPPA2)])

    def fill_user_boundary(self, Ug, grid, ng, time, axis, side):
        if axis != 0 or side != 0:
            return Ug
        layout = self.physics.layout()
        g = ng[0]
        sl = slice(0, g)
        # streaming inflow: FUV at E_L with F = c E; IR at the floor
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
        from ..radiation.planck import planck_energy_fractions

        shape = grid.n_cell
        layout = self.physics.layout()
        Egas0 = T_INIT * CV
        fr = planck_energy_fractions(EDGES, jnp.full(shape, T_RAD_INIT), 1.0, 1.0)
        U = jnp.zeros((layout.nvar, *shape))
        U = U.at[RHO].set(RHO0)
        U = U.at[EGAS].set(Egas0)
        U = U.at[EINT].set(Egas0)
        for gi in range(N_GROUPS):
            U = U.at[layout.rad_index(gi, 0)].set(
                jnp.maximum(fr[gi] * A_RAD * T_RAD_INIT**4, ERAD_FLOOR / N_GROUPS))
        return U

    @staticmethod
    def exact_solution(x, t):
        """(E_IR, E_FUV, T_gas) behind/ahead of the front at time t."""
        import numpy as np

        front = x < t
        e_fuv = np.where(front, ERAD_L * np.exp(-RHO0 * KAPPA2 * x), ERAD_FLOOR)
        e_ir = np.where(front, ERAD_L * np.exp(-RHO0 * KAPPA2 * x) * (t - x),
                        ERAD_FLOOR)
        T = np.full_like(x, T_INIT)
        return e_ir, e_fuv, T
