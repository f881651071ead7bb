"""Streaming FUV into warm dusty gas: the reference's RadMarshakDust
acceptance test (composite 1% L1 on [T_gas, E_IR, E_FUV] against the
analytic attenuation/re-emission solution,
``src/problems/RadMarshakDust/test_radiation_marshak_dust.cpp:230-270``).

Timestep note: the reference sets only ``radiationCflNumber_ = 0.8``, but
for hydro-disabled problems that number is never used — the coarse step is
``cflNumber_ (default 0.3) * dx / chat`` and radiation takes exactly one
substep of that size (``subcycleRadiationAtLevel``,
``QuokkaSimulation.hpp:1585-1592``; ``simulation.hpp:154``).  So the
reference's actual operating point is CFL 0.3, which we mirror here.  (At
CFL 0.8 the IMEX front smears to ~2% composite error; at 0.4 it is already
back under the 1% criterion.)
"""

import numpy as np
import pytest

from quokka_tpu import ParmParse, Simulation
from quokka_tpu.problems.rad_dust import RadMarshakDustProblem


@pytest.mark.slow
def test_marshak_dust_attenuation():
    pp = ParmParse.from_string("""
geometry.prob_lo = 0.0 0.0 0.0
geometry.prob_hi = 1.0 1.0 1.0
amr.n_cell = 256 1 1
cfl = 0.3
radiation.cfl = 0.3
radiation.dust_gas_interaction_coeff = 1e-2
max_dt = 1.0
stop_time = 0.5
max_timesteps = 5000
verbose = 0
""")
    prob = RadMarshakDustProblem()
    sim = Simulation(prob, pp)
    sim.set_initial_conditions()
    sim.evolve()

    U = np.asarray(sim.U)
    layout = sim.layout
    x = np.asarray(sim.grid.cell_centers(0))
    erad1 = U[layout.rad_index(0, 0)][:, 0, 0]  # IR
    erad2 = U[layout.rad_index(1, 0)][:, 0, 0]  # FUV
    T = U[5][:, 0, 0] / 1.0  # eint = CV rho T with CV = rho = 1

    e_ir, e_fuv, T_exact = prob.exact_solution(x, sim.t)

    # composite L1 (skip the first cell like the reference)
    err = (np.sum(np.abs(T[1:] - T_exact[1:]))
           + np.sum(np.abs(erad1[1:] - e_ir[1:]))
           + np.sum(np.abs(erad2[1:] - e_fuv[1:])))
    sol = (np.sum(np.abs(T_exact[1:])) + np.sum(np.abs(e_ir[1:]))
           + np.sum(np.abs(e_fuv[1:])))
    rel = err / sol
    assert rel < 0.01, rel
