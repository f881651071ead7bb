"""NSCBC Vortex (reference ``src/problems/NSCBC/vortex.cpp``): a subsonic
vortex advects cleanly out through characteristic outflow boundaries.

The reference test is a smoke test (exit 0); the physics asserted here:
after ~1 domain-crossing time the vortex has left, the pressure field has
relaxed back to P_ref without large acoustic reflections, and mass flux
through the boundary behaved (density near rho_ref)."""

import jax.numpy as jnp
import numpy as np

from quokka_tpu import ParmParse, Simulation
from quokka_tpu.eos import K_BOLTZMANN_CGS
from quokka_tpu.indices import EGAS, EINT, MX1, MX2, MX3, RHO
from quokka_tpu.problems.nscbc_vortex import (
    GAMMA,
    MU,
    P_REF,
    T_REF,
    U0,
    NSCBCVortexProblem,
)

CFG = """
geometry.prob_lo = -0.65 -0.65 -0.5
geometry.prob_hi = 0.65 0.65 0.5
amr.n_cell = 64 64 1
cfl = 0.3
hydro.reconstruction_order = 3
stop_time = 1.3e-4
max_timesteps = 4000
verbose = 0
"""


def test_vortex_exits_without_reflection():
    sim = Simulation(NSCBCVortexProblem(), ParmParse.from_string(CFG))
    sim.set_initial_conditions()

    def pressure(U):
        ke = 0.5 * (U[MX1] ** 2 + U[MX2] ** 2 + U[MX3] ** 2) / U[RHO]
        return (GAMMA - 1.0) * (U[EGAS] - ke)

    P0 = np.asarray(pressure(sim.U))
    dP0 = np.abs(P0 - P_REF).max() / P_REF  # initial vortex core deficit
    assert dP0 > 1e-5  # the vortex is actually there

    sim.evolve()
    U = np.asarray(sim.U)
    assert np.all(np.isfinite(U))

    P1 = np.asarray(pressure(jnp.asarray(U)))
    dP1 = np.abs(P1 - P_REF).max() / P_REF
    # vortex has advected out (u0 * t ~ 1.0 domain length); residual
    # acoustics must be well below the initial vortex amplitude
    assert dP1 < 0.5 * dP0
    # density stays near the reference state everywhere
    rho_ref = P_REF / (K_BOLTZMANN_CGS / MU * T_REF)
    assert np.abs(U[RHO] / rho_ref - 1.0).max() < 0.05
