"""Radiation-force-driven isothermal wind: the steady Mach profile must
match the exact momentum integral (reference RadForce test; it compares to
the same solution with a ~5% tolerance after 10 crossing times)."""

import numpy as np
import pytest

from quokka_tpu import ParmParse, Simulation
from quokka_tpu.problems.rad_force import (
    A0, LX, MACH0, MACH1, RadForceProblem,
)


@pytest.mark.slow
def test_radiation_driven_wind():
    pp = ParmParse.from_string(f"""
geometry.prob_lo = 0.0 0.0 0.0
geometry.prob_hi = {LX} 1.0 1.0
amr.n_cell = 64 1 1
cfl = 0.4
radiation.cfl = 0.4
stop_time = {6.0 * LX / A0}
max_timesteps = 40000
verbose = 0
""")
    prob = RadForceProblem()
    sim = Simulation(prob, pp)
    sim.set_initial_conditions()
    sim.evolve()

    U = np.asarray(sim.U)
    assert np.all(np.isfinite(U))
    x = np.asarray(sim.grid.cell_centers(0))
    mach = (U[1][:, 0, 0] / U[0][:, 0, 0]) / A0
    mach_exact = prob.exact_mach(x)

    rel_l1 = np.sum(np.abs(mach - mach_exact)) / np.sum(np.abs(mach_exact))
    assert rel_l1 < 0.05, rel_l1
    # outlet Mach number reaches the analytic value
    np.testing.assert_allclose(mach[-1], MACH1, rtol=0.03)
