"""Radiation-force-driven isothermal wind (RadForce tube, 1D).

Rebuild of the reference's RadForce problem
(``src/problems/RadForce/test_radiation_force.cpp``): an isothermal gas
column accelerated through an optically thin tube (tau = 1e-6) by a
constant radiation flux. The steady wind obeys the exact momentum integral

    (M^2 - M0^2)/2 - ln(M/M0) = g0 x / a0^2,   g0 = kappa0 Frad0 / c

with Lx = a0^2/g0 so the outlet Mach number is M1 = 2.12841029 (the value
hard-coded in the reference). Validates the radiation momentum deposition
(beta_order = 1 flux/momentum update) in the isothermal limit.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..indices import EGAS, EINT, MX1, RHO
from ..registry import (
    BC_OUTFLOW,
    BC_PERIODIC,
    BC_USER,
    BCSpec,
    EOSTraits,
    PhysicsTraits,
    Problem,
    RadTraits,
    register_problem,
)

M_U = 1.66053906892e-24
C_CGS = 2.99792458e10
KAPPA0 = 5.0
MU = 2.33 * M_U
A0 = 0.2e5
TAU = 1.0e-6
RHO0 = 1.0e5 * MU
MACH0 = 1.1
MACH1 = 2.128410288469465339
FRAD0 = RHO0 * A0 * C_CGS / TAU
G0 = KAPPA0 * FRAD0 / C_CGS
LX = A0 * A0 / G0
CHAT = 10.0 * MACH1 * A0


@register_problem
class RadForceProblem(Problem):
    name = "RadForce"
    physics = PhysicsTraits(hydro_enabled=True, radiation_enabled=True)
    eos_traits = EOSTraits(gamma=1.0, mean_molecular_weight=MU,
                           boltzmann_constant=1.380649e-16,
                           cs_isothermal=A0)
    rad = RadTraits(c_light=C_CGS, c_hat=CHAT,
                    radiation_constant=7.565731356724124e-15,
                    Erad_floor=0.0, beta_order=1)
    bcs = BCSpec(x=(BC_USER, BC_OUTFLOW),
                 y=(BC_PERIODIC, BC_PERIODIC),
                 z=(BC_PERIODIC, BC_PERIODIC))

    def compute_planck_opacity(self, rho, T):
        return jnp.full_like(rho, KAPPA0)

    def fill_user_boundary(self, Ug, grid, ng, time, axis, side):
        if axis != 0 or side != 0:
            return Ug
        layout = self.physics.layout()
        g = ng[0]
        sl = slice(0, g)
        Ug = Ug.at[RHO, sl].set(RHO0)
        Ug = Ug.at[MX1, sl].set(RHO0 * MACH0 * A0)
        Ug = Ug.at[MX1 + 1, sl].set(0.0)
        Ug = Ug.at[MX1 + 2, sl].set(0.0)
        Ug = Ug.at[EGAS, sl].set(0.0)
        Ug = Ug.at[EINT, sl].set(0.0)
        Ug = Ug.at[layout.rad_index(0, 0), sl].set(FRAD0 / C_CGS)
        Ug = Ug.at[layout.rad_index(0, 1), sl].set(FRAD0)
        Ug = Ug.at[layout.rad_index(0, 2), sl].set(0.0)
        Ug = Ug.at[layout.rad_index(0, 3), sl].set(0.0)
        return Ug

    def set_initial_conditions(self, grid):
        shape = grid.n_cell
        layout = self.physics.layout()
        U = jnp.zeros((layout.nvar, *shape))
        U = U.at[RHO].set(RHO0)
        U = U.at[layout.rad_index(0, 0)].set(FRAD0 / C_CGS)
        U = U.at[layout.rad_index(0, 1)].set(FRAD0)
        return U

    @staticmethod
    def exact_mach(x):
        """Solve (M^2 - M0^2)/2 - ln(M/M0) = g0 x / a0^2 on the supersonic
        accelerating branch by Newton iteration."""
        x = np.atleast_1d(np.asarray(x, np.float64))
        rhs = G0 * x / (A0 * A0)
        M = np.full_like(x, MACH0 * 1.01)
        for _ in range(60):
            f = 0.5 * (M * M - MACH0**2) - np.log(M / MACH0) - rhs
            df = M - 1.0 / M
            M = np.clip(M - f / np.where(np.abs(df) > 1e-14, df, 1e-14),
                        MACH0, None)
        return M
