"""Oblique M1 beam: stays collimated along the 45-degree diagonal
(reference RadBeam; the criterion is beam localization -- energy off the
diagonal stripe stays at the floor level)."""

import numpy as np
import pytest

from quokka_tpu import ParmParse, Simulation
from quokka_tpu.problems.rad_beam import C_CGS, E_INC, RadBeamProblem


@pytest.mark.slow
def test_beam_stays_collimated():
    L = 2.0
    pp = ParmParse.from_string(f"""
geometry.prob_lo = 0.0 0.0 0.0
geometry.prob_hi = {L} {L} 1.0
amr.n_cell = 64 64 1
radiation.cfl = 0.4
constant_dt = {0.4 * (L / 64) / C_CGS}
stop_time = {1.5 * L / C_CGS}
max_timesteps = 500
verbose = 0
""")
    sim = Simulation(RadBeamProblem(), pp)
    sim.set_initial_conditions()
    sim.evolve()
    U = np.asarray(sim.U)
    assert np.all(np.isfinite(U))
    rs = sim._radiation.rad_start
    E = U[rs][:, :, 0]
    x = np.asarray(sim.grid.cell_centers(0))
    y = np.asarray(sim.grid.cell_centers(1))
    X, Y = np.meshgrid(x, y, indexing="ij")

    # beam axis: y = x (enters at the corner slot); measure energy inside
    # vs outside a diagonal stripe of half-width 0.25
    on_beam = np.abs(Y - X) < 0.25
    frac_on = E[on_beam].sum() / E.sum()
    assert frac_on > 0.9, frac_on
    # beam has propagated: significant energy beyond one box-third
    far = (X > L / 3) & on_beam
    assert E[far].max() > 0.1 * E_INC
