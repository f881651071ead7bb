"""Free-streaming radiation front vs step-function solution.

Reference: RadStreaming (``test_radiation_streaming.cpp``): c=1, chat=0.2,
t=1, front at x=0.2, relative L1 error tol 0.01 at 1000 cells with CFL 0.8.
"""

import numpy as np
import pytest

from quokka_tpu import ParmParse, Simulation
from quokka_tpu.problems.rad_streaming import CHAT, RadStreamingProblem


def test_rad_streaming_front():
    # faithful reference deck: radiationCflNumber_ = 0.8 but cflNumber_ is
    # left at its 0.3 default, and for radiation-only problems the COARSE dt
    # comes from cflNumber_ * dx / chat (QuokkaSimulation.hpp:408-430) while
    # the radiation CFL only sets the subcycle count (= 1 here). Measured
    # rel err 0.0071 at this operating point.
    pp = ParmParse.from_string(
        """
        geometry.prob_lo = 0. 0. 0.
        geometry.prob_hi = 1. 1. 1.
        amr.n_cell = 1000 1 1
        radiation.cfl = 0.8
        max_dt = 1e-2
        stop_time = 1.0
        max_timesteps = 5000
        verbose = 0
        """
    )
    prob = RadStreamingProblem()
    sim = Simulation(prob, pp)
    sim.set_initial_conditions()
    sim.evolve()

    iE = sim.layout.rad_index(0, 0)
    erad = np.asarray(sim.U[iE][:, 0, 0])
    x = np.asarray(sim.grid.cell_centers(0))
    exact = np.where(x <= CHAT * sim.t, 1.0, 0.0)
    rel_err = np.sum(np.abs(erad - exact)) / np.sum(np.abs(exact))
    print(f"streaming rel L1 err = {rel_err:.4f}")
    assert rel_err < 0.01


def test_streaming_y_matches_x():
    """Streaming along y reproduces the x-axis front (axis-permutation
    parity of the transport sweep, reference RadStreamingY)."""
    import numpy as np

    from quokka_tpu import ParmParse, Simulation
    from quokka_tpu.problems.rad_streaming import (
        C_LIGHT, RadStreamingProblem, RadStreamingYProblem,
    )

    def run(prob, n_cell, axis):
        pp = ParmParse.from_string(f"""
geometry.prob_hi = 1.0 1.0 1.0
amr.n_cell = {n_cell}
radiation.cfl = 0.4
constant_dt = {0.4 / 128 / C_LIGHT}
stop_time = {0.2 / C_LIGHT}
max_timesteps = 200
verbose = 0
""")
        sim = Simulation(prob, pp)
        sim.set_initial_conditions()
        sim.evolve()
        U = np.asarray(sim.U)
        rs = sim._radiation.rad_start
        if axis == 0:
            return U[rs][:, 0, 0]
        return U[rs][0, :, 0]

    Ex = run(RadStreamingProblem(), "128 1 1", 0)
    Ey = run(RadStreamingYProblem(), "1 128 1", 1)
    np.testing.assert_allclose(Ey, Ex, rtol=1e-10)
