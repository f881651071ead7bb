"""NSCBC subsonic outflow (reference ``src/problems/NSCBC`` channel test):
a subsonic channel flow with a perturbed interior pressure must relax to
the target outflow pressure without reflections, and a steady uniform flow
must pass through unchanged."""

import jax.numpy as jnp
import numpy as np

from quokka_tpu import ParmParse, Simulation
from quokka_tpu.hydro import euler
from quokka_tpu.indices import EGAS, EINT, MX1, RHO
from quokka_tpu.registry import (
    BC_NSCBC_OUTFLOW,
    BC_PERIODIC,
    BC_USER,
    BCSpec,
    EOSTraits,
    PhysicsTraits,
    Problem,
)

GAMMA = 1.4
RHO0 = 1.0
P0 = 1.0
V0 = 0.3  # Mach ~0.25


class Channel(Problem):
    name = "NSCBC_Channel"
    physics = PhysicsTraits(hydro_enabled=True)
    eos_traits = EOSTraits(gamma=GAMMA)
    bcs = BCSpec(x=(BC_USER, BC_NSCBC_OUTFLOW))
    nscbc_outflow_pressure = P0

    pressure_bump = 0.0

    def set_initial_conditions(self, grid):
        x = grid.cell_centers(0)[:, None, None]
        shape = grid.n_cell
        P = P0 * (1.0 + self.pressure_bump * jnp.exp(-((x - 0.5) ** 2) / 0.01))
        eint = P / (GAMMA - 1.0)
        zeros = jnp.zeros(shape)
        return jnp.stack([
            jnp.full(shape, RHO0),
            jnp.full(shape, RHO0 * V0),
            zeros, zeros,
            jnp.broadcast_to(eint + 0.5 * RHO0 * V0**2, shape),
            jnp.broadcast_to(eint, shape),
        ])

    def fill_user_boundary(self, Ug, grid, ng, time, axis, side):
        # steady subsonic inflow: fixed upstream state
        g = ng[0]
        eint = P0 / (GAMMA - 1.0)
        vals = jnp.zeros((Ug.shape[0],), dtype=Ug.dtype)
        vals = vals.at[RHO].set(RHO0).at[MX1].set(RHO0 * V0)
        vals = vals.at[EGAS].set(eint + 0.5 * RHO0 * V0**2).at[EINT].set(eint)
        block = jnp.broadcast_to(vals[:, None, None, None], (Ug.shape[0], g, *Ug.shape[2:]))
        return Ug.at[:, :g].set(block)


CFG = """
geometry.prob_hi = 1. 1. 1.
amr.n_cell = 128 1 1
cfl = 0.4
stop_time = {t}
max_timesteps = 3000
verbose = 0
"""


def test_nscbc_steady_flow_passes_through():
    prob = Channel()
    sim = Simulation(prob, ParmParse.from_string(CFG.format(t=2.0)))
    sim.set_initial_conditions()
    sim.evolve()
    U = np.asarray(sim.U)
    # uniform subsonic flow is a steady state of the NSCBC channel
    assert np.abs(U[RHO] - RHO0).max() < 1e-3
    assert np.abs(U[MX1] - RHO0 * V0).max() < 1e-3
    P = np.asarray(euler.pressure(sim.U, sim.eos))
    assert np.abs(P - P0).max() < 1e-3


def test_nscbc_pressure_relaxation():
    prob = Channel()
    prob.pressure_bump = 0.05
    sim = Simulation(prob, ParmParse.from_string(CFG.format(t=6.0)))
    sim.set_initial_conditions()
    sim.evolve()
    P = np.asarray(euler.pressure(sim.U, sim.eos))
    # the acoustic bump must leave the domain and pressure relax to P_t
    assert np.abs(P - P0).max() < 0.004  # well below the initial 5% bump
    assert np.all(np.isfinite(np.asarray(sim.U)))


def test_nscbc_inflow_channel_reaches_target():
    """Characteristic inflow + outflow: gas at rest spins up to the target
    subsonic channel state (u = u_t, T = T_t, P = P_t) without reflections
    (reference NSCBC Channel problem)."""
    import numpy as np

    from quokka_tpu import ParmParse, Simulation
    from quokka_tpu.problems.nscbc_channel import (
        NSCBCChannelProblem, RHO0, T0, U_TARGET,
    )

    pp = ParmParse.from_string("""
geometry.prob_hi = 1.0 1.0 1.0
amr.n_cell = 64 1 1
cfl = 0.4
stop_time = 20.0
max_timesteps = 10000
verbose = 0
""")
    sim = Simulation(NSCBCChannelProblem(), pp)
    sim.set_initial_conditions()
    sim.evolve()

    U = np.asarray(sim.U)
    assert np.all(np.isfinite(U))
    vx = U[1][:, 0, 0] / U[0][:, 0, 0]
    T = U[5][:, 0, 0] / U[0][:, 0, 0] * (1.4 - 1.0) * 1.0  # eint = rho T/(mu(g-1))
    np.testing.assert_allclose(vx, U_TARGET, rtol=0.02)
    np.testing.assert_allclose(U[0][:, 0, 0], RHO0, rtol=0.05)
    np.testing.assert_allclose(T, T0, rtol=0.02)
