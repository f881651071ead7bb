"""2D hydro: Kelvin-Helmholtz stability/conservation smoke test."""

import numpy as np

from quokka_tpu import ParmParse, Simulation
from quokka_tpu.problems.kelvin_helmholtz import KelvinHelmholtzProblem


def test_kh_2d_conservation():
    pp = ParmParse.from_string(
        """
        geometry.prob_lo = 0. 0. 0.
        geometry.prob_hi = 1. 1. 1.
        amr.n_cell = 64 64 1
        cfl = 0.4
        stop_time = 0.1
        max_timesteps = 200
        verbose = 0
        """
    )
    sim = Simulation(KelvinHelmholtzProblem(), pp)
    sim.set_initial_conditions()
    sim.evolve()
    U = np.asarray(sim.U)
    assert np.all(np.isfinite(U))
    assert np.all(U[0] > 0)
    # periodic box: mass, momentum, energy conserved to roundoff
    assert abs(sim.conservation_rel_err[0]) < 1e-12
    assert abs(sim.conservation_rel_err[4]) < 1e-12
