"""Line cooling + CR heating: exact exponential relaxation
dT/dt = -0.1 T + 0.03 and line energy accounting into the radiation field
(reference RadLineCooling)."""

import numpy as np
import pytest

from quokka_tpu import ParmParse, Simulation
from quokka_tpu.problems.rad_line_cooling import (
    COOLING_RATE, CR_HEATING_RATE, RHO0, RadLineCoolingProblem, T0,
)


def test_line_cooling_exact():
    pp = ParmParse.from_string("""
geometry.prob_hi = 1.0 1.0 1.0
amr.n_cell = 4 1 1
constant_dt = 1e-2
stop_time = 10.0
max_timesteps = 2000
verbose = 0
""")
    sim = Simulation(RadLineCoolingProblem(), pp)
    sim.set_initial_conditions()
    sim.evolve()
    U = np.asarray(sim.U)
    assert np.all(np.isfinite(U))
    T = U[5][0, 0, 0] / (RHO0 * 1.5)  # eint = rho c_v T, c_v = 1.5
    t = sim.t
    Teq = CR_HEATING_RATE / COOLING_RATE
    T_exact = Teq + (T0 - Teq) * np.exp(-COOLING_RATE * t)
    np.testing.assert_allclose(T, T_exact, rtol=2e-3)
    # line energy went into the radiation field: Erad integrates
    # 0.1 T(t') dt' (rho c_v = 1; cscale = 1 since chat = c)
    rs = sim._radiation.rad_start
    Erad = U[rs][0, 0, 0]
    Erad_exact = (T0 - Teq) * (1.0 - np.exp(-COOLING_RATE * t)) + 0.0
    # integral of 0.1*T dt = (T0-Teq)(1-e^{-kt}) + Teq*k*t
    Erad_exact = (T0 - Teq) * (1.0 - np.exp(-COOLING_RATE * t)) \
        + Teq * COOLING_RATE * t
    np.testing.assert_allclose(Erad, Erad_exact, rtol=5e-3)
