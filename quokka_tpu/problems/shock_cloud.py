"""Shock-cloud interaction with radiative cooling (3D, dimensionless).

The analog of the reference's ShockCloud science problem
(``src/problems/ShockCloud/cloud.cpp``): a dense cloud (density contrast
chi) embedded in a hot wind, with tabulated radiative cooling; the cloud
is crushed/stripped on the cloud-crushing time
t_cc = sqrt(chi) R_cloud / v_wind. Scaled units here (the reference runs
CGS with Cloudy tables; the physics exercised -- wind BC, tanh-smoothed
contact, Strang-split cooling -- is the same).
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
    register_problem,
)

RHO_BG = 1.0
CHI = 100.0  # density contrast
RHO_CLOUD = CHI * RHO_BG
P0 = 1.0
V_WIND = 5.0  # supersonic wind (cs_bg = sqrt(5/3) ~ 1.29)
R_CLOUD = 0.15


@register_problem
class ShockCloudProblem(Problem):
    name = "ShockCloud"
    physics = PhysicsTraits(hydro_enabled=True)
    eos_traits = EOSTraits(gamma=5.0 / 3.0, mean_molecular_weight=1.0,
                           boltzmann_constant=1.0)
    bcs = BCSpec(x=(BC_USER, BC_OUTFLOW), y=(BC_PERIODIC, BC_PERIODIC),
                 z=(BC_PERIODIC, BC_PERIODIC))

    def fill_user_boundary(self, Ug, grid, ng, time, axis, side):
        if axis != 0 or side != 0:
            return Ug
        g = ng[0]
        sl = slice(0, g)
        gmm = self.eos_traits.gamma
        eint = P0 / (gmm - 1.0)
        Ug = Ug.at[RHO, sl].set(RHO_BG)
        Ug = Ug.at[MX1, sl].set(RHO_BG * V_WIND)
        Ug = Ug.at[MX1 + 1, sl].set(0.0)
        Ug = Ug.at[MX1 + 2, sl].set(0.0)
        Ug = Ug.at[EGAS, sl].set(eint + 0.5 * RHO_BG * V_WIND**2)
        Ug = Ug.at[EINT, sl].set(eint)
        return Ug

    def set_initial_conditions(self, grid):
        x, y, z = grid.cell_center_mesh()
        shape = grid.n_cell
        layout = self.physics.layout()
        gmm = self.eos_traits.gamma
        c = [grid.prob_lo[0] + 0.3 * (grid.prob_hi[0] - grid.prob_lo[0]),
             0.5 * (grid.prob_lo[1] + grid.prob_hi[1]),
             0.5 * (grid.prob_lo[2] + grid.prob_hi[2])]
        R = jnp.sqrt((x - c[0]) ** 2 + (y - c[1]) ** 2 + (z - c[2]) ** 2)
        # tanh-smoothed contact (reference cloud.cpp:113-115)
        ramp = 0.5 * (1.0 - jnp.tanh((R - R_CLOUD) / (R_CLOUD / 20.0)))
        rho = RHO_BG + (RHO_CLOUD - RHO_BG) * ramp
        rho = jnp.broadcast_to(rho, shape)
        # wind everywhere outside the cloud, cloud at rest
        vx = V_WIND * (1.0 - jnp.broadcast_to(ramp, shape))
        eint = jnp.full(shape, P0 / (gmm - 1.0))
        U = jnp.zeros((layout.nvar, *shape))
        U = U.at[RHO].set(rho)
        U = U.at[MX1].set(rho * vx)
        U = U.at[EGAS].set(eint + 0.5 * rho * vx * vx)
        U = U.at[EINT].set(eint)
        return U
