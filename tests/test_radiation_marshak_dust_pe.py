"""Marshak wave with transparent dust + photoelectric heating: the
reference's RadMarshakDustPE acceptance test, run in BOTH dust regimes
(coupled: dust_gas_interaction_coeff = 1e20, decoupled: 1e-20 — the two
reference decks tests/RadMarshakDustPE{coupled,decoupled}.in) against the
same streaming + linear-PE-heating exact solution (composite 1% L1,
``src/problems/RadMarshakDustPE/test_radiation_marshak_dust_and_PE.cpp``
:246-271)."""

import numpy as np
import pytest

from quokka_tpu import ParmParse, Simulation
from quokka_tpu.problems.rad_marshak_dust_pe import RadMarshakDustPEProblem

CFG = """
geometry.prob_lo = 0.0 0.0 0.0
geometry.prob_hi = 1.0 1.0 1.0
amr.n_cell = 256 1 1
cfl = 0.8
radiation.cfl = 0.8
radiation.dust_gas_interaction_coeff = {coeff}
max_dt = 1.0
stop_time = 0.5
max_timesteps = 5000
verbose = 0
"""


@pytest.mark.slow
@pytest.mark.parametrize("coeff", [1.0e20, 1.0e-20],
                         ids=["coupled", "decoupled"])
def test_marshak_dust_pe(coeff):
    pp = ParmParse.from_string(CFG.format(coeff=coeff))
    prob = RadMarshakDustPEProblem()
    sim = Simulation(prob, pp)
    sim.set_initial_conditions()
    sim.evolve()

    U = np.asarray(sim.U)
    layout = sim.layout
    x = np.asarray(sim.grid.cell_centers(0))
    erad1 = U[layout.rad_index(0, 0)][:, 0, 0]  # IR
    erad2 = U[layout.rad_index(1, 0)][:, 0, 0]  # FUV
    T = U[5][:, 0, 0]  # eint = CV rho T with CV = rho = 1

    e_ir, e_fuv, T_exact = prob.exact_solution(x, sim.t)

    # composite L1 (skip the first cell like the reference)
    err = (np.sum(np.abs(T[1:] - T_exact[1:]))
           + np.sum(np.abs(erad1[1:] - e_ir[1:]))
           + np.sum(np.abs(erad2[1:] - e_fuv[1:])))
    sol = (np.sum(np.abs(T_exact[1:])) + np.sum(np.abs(e_ir[1:]))
           + np.sum(np.abs(e_fuv[1:])))
    rel = err / sol
    assert rel < 0.01, rel
