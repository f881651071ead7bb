"""Self-gravitating spherical collapse: central density runs away on
roughly the free-fall time (gas self-gravity through the open-boundary
FFT Poisson solver)."""

import numpy as np
import pytest

from quokka_tpu import ParmParse, Simulation
from quokka_tpu.problems.spherical_collapse import (
    RHO_MAX, SphericalCollapseProblem,
)


@pytest.mark.slow
def test_collapse_on_free_fall_time():
    t_ff = np.sqrt(3.0 * np.pi / (32.0 * 1.0 * RHO_MAX))
    pp = ParmParse.from_string(f"""
geometry.prob_lo = 0.0 0.0 0.0
geometry.prob_hi = 2.0 2.0 2.0
amr.n_cell = 32 32 32
cfl = 0.3
gravity.Gconst = 1.0
gravity.bc = open
stop_time = {0.85 * t_ff}
max_timesteps = 4000
verbose = 0
""")
    sim = Simulation(SphericalCollapseProblem(), pp)
    sim.set_initial_conditions()
    rho0_max = float(np.asarray(sim.U)[0].max())
    sim.evolve()
    U = np.asarray(sim.U)
    assert np.all(np.isfinite(U))
    # central density has run away (collapse well underway by 0.85 t_ff)
    assert U[0].max() > 3.0 * rho0_max, U[0].max() / rho0_max
    # collapse is centrally concentrated: peak at the box center
    idx = np.unravel_index(np.argmax(U[0]), U[0].shape)
    assert all(abs(i - 16) <= 2 for i in idx), idx
