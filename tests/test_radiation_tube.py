"""RadTube: two-group radiation pressure tube equilibrium.

Reference ``src/problems/RadTube/test_radiation_tube.cpp``: the solver must
hold the static RHD equilibrium -- after one sound-crossing time the gas
temperature profile stays within rel-L1 0.003 of the initial profile
(reference pass criterion at :398-401).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from quokka_tpu import ParmParse, Simulation
from quokka_tpu.indices import EGAS, EINT, MX1, RHO
from quokka_tpu.problems.rad_tube import (
    A0,
    LX,
    RHO1,
    RadTubeProblem,
    equilibrium_tube_profile,
)

CFG = f"""
geometry.prob_lo = 0.0 0.0 0.0
geometry.prob_hi = {LX} 1.0 1.0
amr.n_cell = 128 1 1
cfl = 0.4
radiation.cfl = 0.4
radiation.opacity_model = piecewise_constant
hydro.reconstruction_order = 3
radiation.reconstruction_order = 3
stop_time = {LX / A0}
max_timesteps = 2000
verbose = 0
"""


def test_profile_reproduces_reference_endpoint():
    """The in-process shooting solution must land on the reference's
    tabulated right-end density (rho1 = 2.19405, test_radiation_tube.cpp:37)."""
    x, rho, T = equilibrium_tube_profile()
    assert rho[-1] == pytest.approx(RHO1, rel=5e-3)


def test_tube_holds_equilibrium():
    prob = RadTubeProblem()
    sim = Simulation(prob, ParmParse.from_string(CFG))
    sim.set_initial_conditions()

    eos = sim.eos

    def tgas(U):
        ke = 0.5 * U[MX1] ** 2 / U[RHO]
        return np.asarray(eos.tgas_from_eint(U[RHO], U[EGAS] - ke))[:, 0, 0]

    T_initial = tgas(np.asarray(sim.U))
    sim.evolve()
    T_final = tgas(np.asarray(sim.U))

    rel_l1 = np.sum(np.abs(T_final - T_initial)) / np.sum(np.abs(T_initial))
    # reference tolerance (test_radiation_tube.cpp:399)
    assert rel_l1 < 0.003
    # both groups stay positive and finite
    U = np.asarray(sim.U)
    layout = prob.physics.layout()
    for g in range(2):
        Eg = U[layout.rad_index(g, 0)]
        assert np.all(np.isfinite(Eg)) and np.all(Eg > 0)
