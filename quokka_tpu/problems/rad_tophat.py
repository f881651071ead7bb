"""Crooked-pipe ("tophat") radiation flow (2D, Gentile 2001).

Rebuild of the reference's RadTophat problem
(``src/problems/RadTophat/test_radiation_tophat.cpp``): a Marshak source
at the mouth of a low-density pipe (rho = 0.01, kappa = 20) that doglegs
around a dense opaque block (rho = 10, kappa = 200). Radiation must flow
down the pipe and around the bend while the optically thick walls stay
cold. Half-pipe geometry with a reflecting y-lo boundary.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..indices import EGAS, EINT, MX1, RHO
from ..registry import (
    BC_OUTFLOW,
    BC_PERIODIC,
    BC_REFLECT,
    BC_USER,
    BCSpec,
    EOSTraits,
    PhysicsTraits,
    Problem,
    RadTraits,
    register_problem,
)

C_CGS = 2.99792458e10
A_RAD = 7.565731356724124e-15
KELVIN_TO_EV = 8.617385e-5
T_HOHLRAUM = 500.0 / KELVIN_TO_EV
T_INITIAL = 50.0 / KELVIN_TO_EV
KAPPA_WALL, RHO_WALL = 200.0, 10.0
KAPPA_PIPE, RHO_PIPE = 20.0, 0.01
MU = 1.66053906892e-24  # mean molecular weight ~ m_H


def _pipe_mask(x, y):
    r1 = (((x > 0.0) & (x <= 2.5)) | ((x > 4.5) & (x < 7.0))) & (jnp.abs(y) < 0.5)
    r2 = (((x > 2.5) & (x < 3.0)) | ((x > 4.0) & (x <= 4.5))) & (jnp.abs(y) < 1.5)
    r3 = ((x > 3.0) & (x < 4.0)) & ((jnp.abs(y) > 1.0) & (jnp.abs(y) < 1.5))
    return r1 | r2 | r3


@register_problem
class RadTophatProblem(Problem):
    name = "RadTophat"
    physics = PhysicsTraits(hydro_enabled=False, radiation_enabled=True)
    eos_traits = EOSTraits(gamma=5.0 / 3.0, mean_molecular_weight=MU,
                           boltzmann_constant=1.380649e-16)
    rad = RadTraits(c_light=C_CGS, c_hat=C_CGS, radiation_constant=A_RAD,
                    Erad_floor=A_RAD * T_INITIAL**4 * 1e-10, beta_order=0)
    bcs = BCSpec(x=(BC_USER, BC_OUTFLOW), y=(BC_REFLECT, BC_OUTFLOW),
                 z=(BC_PERIODIC, BC_PERIODIC))

    def compute_planck_opacity(self, rho, T):
        # opacity keyed on the local density (pipe vs wall), as the
        # reference does (test_radiation_tophat.cpp:63-72)
        return jnp.where(rho < 1.0, KAPPA_PIPE, KAPPA_WALL)

    def fill_user_boundary(self, Ug, grid, ng, time, axis, side):
        if axis != 0 or side != 0:
            return Ug
        layout = self.physics.layout()
        iE = layout.rad_index(0, 0)
        iFx = layout.rad_index(0, 1)
        g = ng[0]
        sl = slice(0, g)
        y = grid.prob_lo[1] + (jnp.arange(Ug.shape[2]) - ng[1] + 0.5) * grid.dx[1]
        mouth = (jnp.abs(y) < 0.5)[None, :, None]
        E0 = Ug[iE, g][None]
        Fx0 = Ug[iFx, g][None]
        E_inc = A_RAD * T_HOHLRAUM**4
        F_marshak = 0.5 * C_CGS * E_inc - 0.5 * (C_CGS * E0 + 2.0 * Fx0)
        Ug = Ug.at[iE, sl].set(jnp.where(mouth, E_inc, E0))
        Ug = Ug.at[iFx, sl].set(jnp.where(mouth, F_marshak, Fx0))
        Ug = Ug.at[layout.rad_index(0, 2), sl].set(0.0)
        Ug = Ug.at[layout.rad_index(0, 3), sl].set(0.0)
        return Ug

    def set_initial_conditions(self, grid):
        x, y, _z = grid.cell_center_mesh()
        shape = grid.n_cell
        layout = self.physics.layout()
        eos = self.make_eos()
        pipe = _pipe_mask(x, y)
        rho = jnp.where(pipe, RHO_PIPE, RHO_WALL)
        rho = jnp.broadcast_to(rho, shape)
        egas = eos.eint_from_tgas(rho, jnp.full(shape, T_INITIAL))
        U = jnp.zeros((layout.nvar, *shape))
        U = U.at[RHO].set(rho)
        U = U.at[EGAS].set(egas)
        U = U.at[EINT].set(egas)
        U = U.at[layout.rad_index(0, 0)].set(A_RAD * T_INITIAL**4)
        return U
