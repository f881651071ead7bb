"""Free-streaming radiation front (reference
``src/problems/RadStreaming/test_radiation_streaming.cpp`` +
``tests/RadStreaming.in``).

c = 1, c_hat = 0.2 (reduced speed of light), kappa = 1e-10, beta_order = 0.
A beam (E = 1, F = cE) enters at x = 0; after t = 1 the front must sit at
x = c_hat * t = 0.2 with relative L1 error < 0.01 vs the step function.
Validates the M1 HLL transport in the free-streaming limit and the RSL
scaling.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..indices import EGAS, EINT, RHO
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

INITIAL_ERAD = 1.0e-5
INITIAL_EGAS = 1.0e-5
C_LIGHT = 1.0
CHAT = 0.2
KAPPA0 = 1.0e-10
RHO0 = 1.0


@register_problem
class RadStreamingProblem(Problem):
    name = "RadStreaming"
    physics = PhysicsTraits(hydro_enabled=False, radiation_enabled=True)
    eos_traits = EOSTraits(gamma=5.0 / 3.0, mean_molecular_weight=1.0, boltzmann_constant=1.0)
    rad = RadTraits(
        c_light=C_LIGHT,
        c_hat=CHAT,
        radiation_constant=1.0,
        Erad_floor=INITIAL_ERAD,
        beta_order=0,
    )
    bcs = BCSpec(
        x=(BC_USER, BC_USER),
        y=(BC_PERIODIC, BC_PERIODIC),
        z=(BC_PERIODIC, BC_PERIODIC),
    )

    def compute_planck_opacity(self, rho, T):
        return jnp.full_like(rho, KAPPA0)

    def set_initial_conditions(self, grid):
        shape = grid.n_cell
        layout = self.physics.layout()
        U = jnp.zeros((layout.nvar, *shape))
        U = U.at[RHO].set(RHO0)
        U = U.at[EGAS].set(INITIAL_EGAS)
        U = U.at[EINT].set(INITIAL_EGAS)
        U = U.at[layout.rad_index(0, 0)].set(INITIAL_ERAD)
        return U

    def fill_user_boundary(self, Ug, grid, ng, time, axis, side):
        assert axis == 0
        g = ng[0]
        layout = self.physics.layout()
        iE = layout.rad_index(0, 0)
        iFx = layout.rad_index(0, 1)
        nvar = Ug.shape[0]
        vals = jnp.zeros((nvar,), dtype=Ug.dtype)
        vals = vals.at[RHO].set(RHO0).at[EGAS].set(INITIAL_EGAS).at[EINT].set(INITIAL_EGAS)
        if side == 0:  # inflow beam: E = 1, F = c E
            vals = vals.at[iE].set(1.0).at[iFx].set(C_LIGHT * 1.0)
        else:
            vals = vals.at[iE].set(INITIAL_ERAD)
        block = jnp.broadcast_to(
            vals[:, None, None, None], (nvar, g, Ug.shape[2], Ug.shape[3])
        )
        if side == 0:
            return Ug.at[:, :g].set(block)
        return Ug.at[:, -g:].set(block)

    def compute_reference_solution(self, sim):
        layout = sim.layout
        x = np.asarray(sim.grid.cell_centers(0))
        erad_exact = np.where(x <= CHAT * sim.t, 1.0, 0.0)
        ref = np.zeros((layout.nvar, *sim.grid.n_cell))
        # only the radiation-energy component participates in the norm;
        # replicate the other fields so residuals vanish there
        ref[:] = np.asarray(sim.U)
        ref[layout.rad_index(0, 0)] = erad_exact[:, None, None]
        return ref


@register_problem
class RadStreamingYProblem(Problem):
    """Streaming along the y axis (reference RadStreamingY): identical
    physics to `RadStreamingProblem`, exercising the axis permutation of
    the transport sweep."""

    name = "RadStreamingY"
    physics = PhysicsTraits(hydro_enabled=False, radiation_enabled=True)
    eos_traits = EOSTraits(gamma=5.0 / 3.0, mean_molecular_weight=1.0,
                           boltzmann_constant=1.0)
    rad = RadTraits(
        c_light=C_LIGHT,
        c_hat=CHAT,
        radiation_constant=1.0,
        Erad_floor=INITIAL_ERAD,
        beta_order=0,
    )
    bcs = BCSpec(
        x=(BC_PERIODIC, BC_PERIODIC),
        y=(BC_USER, BC_USER),
        z=(BC_PERIODIC, BC_PERIODIC),
    )

    def compute_planck_opacity(self, rho, T):
        return jnp.full_like(rho, KAPPA0)

    def set_initial_conditions(self, grid):
        shape = grid.n_cell
        layout = self.physics.layout()
        U = jnp.zeros((layout.nvar, *shape))
        U = U.at[RHO].set(RHO0)
        U = U.at[EGAS].set(INITIAL_EGAS)
        U = U.at[EINT].set(INITIAL_EGAS)
        U = U.at[layout.rad_index(0, 0)].set(INITIAL_ERAD)
        return U

    def fill_user_boundary(self, Ug, grid, ng, time, axis, side):
        assert axis == 1
        g = ng[1]
        layout = self.physics.layout()
        iE = layout.rad_index(0, 0)
        iFy = layout.rad_index(0, 2)
        nvar = Ug.shape[0]
        vals = jnp.zeros((nvar,), dtype=Ug.dtype)
        vals = vals.at[RHO].set(RHO0).at[EGAS].set(INITIAL_EGAS).at[EINT].set(INITIAL_EGAS)
        if side == 0:  # inflow beam along +y
            vals = vals.at[iE].set(1.0).at[iFy].set(C_LIGHT * 1.0)
        else:
            vals = vals.at[iE].set(INITIAL_ERAD)
        sl = slice(0, g) if side == 0 else slice(Ug.shape[2] - g, Ug.shape[2])
        return Ug.at[:, :, sl].set(vals[:, None, None, None])
