"""Leblanc extreme shocktube vs the exact Riemann solution.

Reference pass criterion: rel. rms-L1 error < 0.002 at 2000 cells, t=6
(``test_hydro_leblanc.cpp:372``)."""

import pytest

from quokka_tpu import ParmParse, Simulation
from quokka_tpu.problems.leblanc import LeblancProblem


@pytest.mark.slow
def test_leblanc():
    pp = ParmParse.from_string(
        """
        geometry.prob_lo = 0.0 0.0 0.0
        geometry.prob_hi = 9.0 1.0 1.0
        amr.n_cell = 2000 1 1
        cfl = 0.3
        stop_time = 6.0
        max_timesteps = 50000
        verbose = 0
        """
    )
    sim = Simulation(LeblancProblem(), pp)
    sim.set_initial_conditions()
    sim.evolve()
    assert sim.error_norm < 0.002
