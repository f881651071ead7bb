"""Crooked-pipe radiation flow: the Marshak-driven front advances down the
low-density pipe while the opaque walls stay cold (reference RadTophat)."""

import numpy as np
import pytest

from quokka_tpu import ParmParse, Simulation
from quokka_tpu.problems.rad_tophat import (
    A_RAD, C_CGS, RadTophatProblem, T_INITIAL,
)


@pytest.mark.slow
def test_tophat_pipe_flow():
    pp = ParmParse.from_string("""
geometry.prob_lo = 0.0 0.0 0.0
geometry.prob_hi = 7.0 2.0 1.0
amr.n_cell = 96 32 1
radiation.cfl = 0.4
stop_time = 5.0e-10
max_timesteps = 2000
verbose = 0
""")
    sim = Simulation(RadTophatProblem(), pp)
    sim.set_initial_conditions()
    sim.evolve()
    U = np.asarray(sim.U)
    assert np.all(np.isfinite(U))
    rs = sim._radiation.rad_start
    E = U[rs][:, :, 0]
    x = np.asarray(sim.grid.cell_centers(0))
    y = np.asarray(sim.grid.cell_centers(1))
    X, Y = np.meshgrid(x, y, indexing="ij")
    E_floor = A_RAD * T_INITIAL**4

    # front has advanced down the first pipe segment (x ~ 2, on-axis)
    seg1 = (X > 1.5) & (X < 2.4) & (np.abs(Y) < 0.4)
    assert E[seg1].max() > 100.0 * E_floor
    # deep wall interior stays cold (shielded by ~ tau >> 1)
    wall = (X > 3.2) & (X < 3.8) & (np.abs(Y) < 0.8)
    assert E[wall].max() < 5.0 * E_floor, E[wall].max() / E_floor
