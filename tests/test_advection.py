"""Linear advection: sawtooth + semi-ellipse convergence tests.

Reference pass criteria: sawtooth rel L1 error < 0.015 after one period at
400 cells (``test_advection.cpp:155``); semi-ellipse < 0.015
(``test_advection_semiellipse.cpp``).
"""

import numpy as np

from quokka_tpu import ParmParse
from quokka_tpu.advection import AdvectionSimulation
from quokka_tpu.problems.advection import SawtoothAdvection, SemiellipseAdvection

CFG = """
geometry.prob_lo = 0. 0. 0.
geometry.prob_hi = 1. 1. 1.
amr.n_cell = 400 1 1
cfl = 0.4
stop_time = 1.0
max_timesteps = 10000
verbose = 0
"""


def test_sawtooth_advection():
    # the reference caps max_dt = 1e-4 (test_advection.cpp:126), i.e. it
    # takes 10^4 fixed steps, not CFL-limited ones; measured 0.00912 here
    pp = ParmParse.from_string(CFG)
    pp.set("max_dt", 1.0e-4)
    sim = AdvectionSimulation(SawtoothAdvection(), pp)
    sim.set_initial_conditions()
    sim.evolve()
    assert sim.error_norm < 0.015


def test_semiellipse_advection():
    # the reference runs this at the default CFL 0.3
    pp = ParmParse.from_string(CFG)
    pp.set("cfl", 0.3)
    sim = AdvectionSimulation(SemiellipseAdvection(), pp)
    sim.set_initial_conditions()
    sim.evolve()
    assert sim.error_norm < 0.015
