"""Oblique radiation beam in vacuum (2D, free-streaming M1 test).

Rebuild of the reference's RadBeam problem
(``src/problems/RadBeam/test_radiation_beam.cpp``): a 45-degree beam
injected through a slot on the x-lo boundary (|F| = c E, Fx = Fy =
c E/sqrt(2)) into a transparent box (kappa = 0). The M1 closure must keep
the beam collimated along the diagonal; the classic failure mode is
diffusive spreading.
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
    PhysicsTraits,
    Problem,
    RadTraits,
    register_problem,
)

C_CGS = 2.99792458e10
A_RAD = 7.565731356724124e-15
T_HOHLRAUM = 1000.0
T_INIT = 300.0
RHO0 = 1.0
Y_BEAM = 0.0625  # beam slot: y <= Y_BEAM on the x-lo boundary
E_INC = A_RAD * T_HOHLRAUM**4


@register_problem
class RadBeamProblem(Problem):
    name = "RadBeam"
    physics = PhysicsTraits(hydro_enabled=False, radiation_enabled=True)
    eos_traits = EOSTraits(gamma=5.0 / 3.0, mean_molecular_weight=1.66053906892e-24,
                           boltzmann_constant=1.380649e-16)
    rad = RadTraits(c_light=C_CGS, c_hat=C_CGS, radiation_constant=A_RAD,
                    Erad_floor=A_RAD * T_INIT**4 * 1e-10, beta_order=0)
    bcs = BCSpec(x=(BC_USER, BC_OUTFLOW), y=(BC_USER, BC_OUTFLOW),
                 z=(BC_PERIODIC, BC_PERIODIC))

    def compute_planck_opacity(self, rho, T):
        return jnp.zeros_like(rho)

    def fill_user_boundary(self, Ug, grid, ng, time, axis, side):
        if side != 0 or axis > 1:
            return Ug
        layout = self.physics.layout()
        iE = layout.rad_index(0, 0)
        iFx = layout.rad_index(0, 1)
        iFy = layout.rad_index(0, 2)
        g = ng[axis]
        F_beam = C_CGS * E_INC / jnp.sqrt(2.0)
        if axis == 0:
            # beam slot where y <= Y_BEAM; reflect Fx elsewhere
            y = grid.prob_lo[1] + (jnp.arange(Ug.shape[2]) - ng[1] + 0.5) * grid.dx[1]
            in_beam = (y <= Y_BEAM)[None, :, None]
            sl = slice(0, g)
            E0 = Ug[iE, g][None]
            Fx0 = Ug[iFx, g][None]
            Fy0 = Ug[iFy, g][None]
            Ug = Ug.at[iE, sl].set(jnp.where(in_beam, E_INC, E0))
            Ug = Ug.at[iFx, sl].set(jnp.where(in_beam, F_beam, -Fx0))
            Ug = Ug.at[iFy, sl].set(jnp.where(in_beam, F_beam, Fy0))
        else:
            # y-lo boundary mirrors the same beam condition for x <= Y_BEAM
            x = grid.prob_lo[0] + (jnp.arange(Ug.shape[1]) - ng[0] + 0.5) * grid.dx[0]
            in_beam = (x <= Y_BEAM)[:, None, None]
            sl = slice(0, g)
            E0 = Ug[iE, :, g][:, None]
            Fx0 = Ug[iFx, :, g][:, None]
            Fy0 = Ug[iFy, :, g][:, None]
            Ug = Ug.at[iE, :, sl].set(jnp.where(in_beam, E_INC, E0))
            Ug = Ug.at[iFx, :, sl].set(jnp.where(in_beam, F_beam, Fx0))
            Ug = Ug.at[iFy, :, sl].set(jnp.where(in_beam, F_beam, -Fy0))
        return Ug

    def set_initial_conditions(self, grid):
        shape = grid.n_cell
        layout = self.physics.layout()
        U = jnp.zeros((layout.nvar, *shape))
        U = U.at[RHO].set(RHO0)
        U = U.at[EGAS].set(1.0)
        U = U.at[EINT].set(1.0)
        U = U.at[layout.rad_index(0, 0)].set(A_RAD * T_INIT**4)
        return U
