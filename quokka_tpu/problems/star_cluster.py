"""Turbulent self-gravitating cloud (StarCluster-like, 3D).

The analog of the reference's StarCluster problem
(``src/problems/StarCluster/star_cluster.cpp``): a dense cloud seeded with
a solenoidal turbulent velocity field (generated in-process by
`quokka_tpu.utils.turbulence` instead of loaded from the reference's
offline HDF5 cubes) collapsing under self-gravity. Runtime knobs:
``problem.rms_mach`` scales the turbulence relative to the cloud sound
speed.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..indices import EGAS, EINT, MX1, RHO
from ..registry import (
    BC_OUTFLOW,
    BCSpec,
    EOSTraits,
    PhysicsTraits,
    Problem,
    register_problem,
)
from ..utils.turbulence import solenoidal_perturbation

RHO_CLOUD = 10.0
RHO_AMBIENT = 1.0e-2
P0 = 1.0
R_CLOUD = 0.4
RMS_MACH = 1.0


@register_problem
class StarClusterProblem(Problem):
    name = "StarCluster"
    physics = PhysicsTraits(hydro_enabled=True, gravity_enabled=True)
    eos_traits = EOSTraits(gamma=5.0 / 3.0, mean_molecular_weight=1.0,
                           boltzmann_constant=1.0)
    bcs = BCSpec(x=(BC_OUTFLOW, BC_OUTFLOW), y=(BC_OUTFLOW, BC_OUTFLOW),
                 z=(BC_OUTFLOW, BC_OUTFLOW))

    rms_mach: float = RMS_MACH

    def set_initial_conditions(self, grid):
        x, y, z = grid.cell_center_mesh()
        shape = grid.n_cell
        layout = self.physics.layout()
        g = self.eos_traits.gamma
        c = [0.5 * (grid.prob_lo[d] + grid.prob_hi[d]) for d in range(3)]
        r = jnp.sqrt((x - c[0]) ** 2 + (y - c[1]) ** 2 + (z - c[2]) ** 2)
        rho = jnp.where(r < R_CLOUD, RHO_CLOUD, RHO_AMBIENT)
        rho = jnp.broadcast_to(rho, shape)

        cs = float(np.sqrt(g * P0 / RHO_CLOUD))
        v = solenoidal_perturbation(shape[0], rms=self.rms_mach * cs, seed=42)
        v = jnp.asarray(v)
        # turbulence only inside the cloud
        in_cloud = jnp.broadcast_to(r < R_CLOUD, shape)
        v = jnp.where(in_cloud[None], v, 0.0)

        eint = jnp.full(shape, P0 / (g - 1.0))
        ke = 0.5 * rho * jnp.sum(v * v, axis=0)
        U = jnp.zeros((layout.nvar, *shape))
        U = U.at[RHO].set(rho)
        for n in range(3):
            U = U.at[MX1 + n].set(rho * v[n])
        U = U.at[EGAS].set(eint + ke)
        U = U.at[EINT].set(eint)
        return U
