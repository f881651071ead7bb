"""Radiation-hydrodynamics benchmark problem (3D).

The analog of the reference's radiation-driven-shell weak-scaling benchmark
(``tests/radhydro_shell_256.in``; 22.55 Mzones/GPU/s on V100,
``paper/weak_scaling_radhydro.csv``): a full radhydro step -- PPM+HLLC hydro
plus ~10 IMEX radiation substeps with implicit coupling per hydro step.

Setup: periodic box, gas in thermal equilibrium with radiation, a smooth
central radiation/temperature pulse driving outflow. Scaled units (c = 1e3,
a_rad = 1, rho = 1, T ~ 1) keep every intermediate well inside the float32
exponent range, which is also the range of TPU double-double f64.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..indices import EGAS, EINT, RHO
from ..registry import EOSTraits, PhysicsTraits, Problem, RadTraits, register_problem

C_CODE = 1.0e3  # speed of light >> gas signal speeds (~1)
CHAT = 1.0e2  # reduced speed of light: ~10 radiation substeps/hydro step
KAPPA0 = 10.0  # tau per cell ~ rho kappa dx: mixed regime at 256^3
A_RAD = 1.0
T0 = 1.0
RHO0 = 1.0


@register_problem
class RadhydroBenchProblem(Problem):
    name = "RadhydroBench"
    physics = PhysicsTraits(hydro_enabled=True, radiation_enabled=True)
    eos_traits = EOSTraits(gamma=5.0 / 3.0, mean_molecular_weight=1.0, boltzmann_constant=1.0)
    rad = RadTraits(
        c_light=C_CODE, c_hat=CHAT, radiation_constant=A_RAD,
        Erad_floor=1e-10, beta_order=1,
    )

    def compute_planck_opacity(self, rho, T):
        return jnp.full_like(rho, KAPPA0)

    def error_est(self, sim, level):
        # relative radiation-energy gradient tagging (the reference's AMR
        # radhydro setups tag on gradients the same way)
        from ..stencil import sh

        layout = self.physics.layout()
        E = sim.level_U[level][layout.rad_index(0, 0)]
        tags = jnp.zeros(E.shape, bool)
        for d in sim.level_grids[level].active_axes:
            grad = jnp.abs(sh(E, 1, d) - sh(E, -1, d)) / (2.0 * jnp.abs(E) + 1e-30)
            tags = tags | (grad > 0.1)
        return tags

    def set_initial_conditions(self, grid):
        x, y, z = grid.cell_center_mesh()
        shape = grid.n_cell
        layout = self.physics.layout()
        eos = self.make_eos()

        r2 = (x - 0.5) ** 2 + (y - 0.5) ** 2 + (z - 0.5) ** 2
        T = T0 * (1.0 + 0.5 * jnp.exp(-r2 / 0.02))
        T = jnp.broadcast_to(T, shape)
        eint = eos.eint_from_tgas(RHO0, T)
        Erad = A_RAD * T**4

        U = jnp.zeros((layout.nvar, *shape))
        U = U.at[RHO].set(RHO0)
        U = U.at[EGAS].set(eint)
        U = U.at[EINT].set(eint)
        U = U.at[layout.rad_index(0, 0)].set(Erad)
        return U
