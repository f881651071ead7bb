"""Sedov-Taylor point blast (reference
``src/problems/HydroBlast3D/test_hydro3d_blast.cpp``), the hydro
weak-scaling benchmark (``tests/benchmark_unigrid_*.in``).

Octant-symmetry setup (Klein & Bolstad parameters, via Kamm & Timmes
LA-UR-07-2849): domain [0, 1.2]^3, rho=1, E_blast=0.851072/8 deposited in
the corner cell, reflecting boundaries, gamma=1.4, cfl=0.3, PPM,
reconstruct_eint=false.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..indices import EGAS, EINT, RHO
from ..registry import (
    BC_REFLECT,
    BCSpec,
    EOSTraits,
    HydroTraits,
    PhysicsTraits,
    Problem,
    register_problem,
)


@register_problem
class SedovProblem(Problem):
    name = "HydroBlast3D"
    physics = PhysicsTraits(hydro_enabled=True)
    eos_traits = EOSTraits(gamma=1.4)
    hydro = HydroTraits(reconstruct_eint=False)
    bcs = BCSpec(
        x=(BC_REFLECT, BC_REFLECT),
        y=(BC_REFLECT, BC_REFLECT),
        z=(BC_REFLECT, BC_REFLECT),
    )

    rho0 = 1.0
    E_blast_total = 0.851072  # full-sphere blast energy (ergs)

    def set_initial_conditions(self, grid):
        shape = grid.n_cell
        cell_vol = grid.cell_volume()
        E_blast = self.E_blast_total / 8.0  # octant symmetry

        rho_e = jnp.full(shape, 1.0e-10 * E_blast / cell_vol)
        rho_e = rho_e.at[0, 0, 0].set(E_blast / cell_vol)

        zeros = jnp.zeros(shape)
        U = jnp.stack([
            jnp.full(shape, self.rho0),
            zeros, zeros, zeros,
            rho_e,  # all energy internal initially (v = 0)
            rho_e,
        ])
        return U
