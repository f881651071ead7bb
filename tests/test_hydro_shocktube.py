"""Sod shocktube: full-solver validation against the exact Riemann solution.

Reference: ``src/problems/HydroShocktube/test_hydro_shocktube.cpp`` run via
``tests/shocktube.in`` (1024 cells, cfl=0.6, PPM, t=0.4, rel. rms-L1 error
tolerance 0.002).
"""

import pytest

from quokka_tpu import ParmParse, Simulation
from quokka_tpu.problems.shocktube import ShocktubeProblem

SHOCKTUBE_IN = """
geometry.prob_lo = 0.0 0.0 0.0
geometry.prob_hi = 5.0 1.0 1.0
amr.n_cell = 1024 1 1
cfl = 0.6
stop_time = 0.4
max_timesteps = 8000
hydro.reconstruction_order = 3
verbose = 0
"""


def test_shocktube_ppm():
    pp = ParmParse.from_string(SHOCKTUBE_IN)
    sim = Simulation(ShocktubeProblem(), pp)
    sim.set_initial_conditions()
    sim.evolve()
    assert sim.t == pytest.approx(0.4, rel=1e-10)
    # reference pass criterion (test_hydro_shocktube.cpp:377-382)
    assert sim.error_norm < 0.002


def test_shocktube_plm_coarse():
    """PLM at lower resolution still converges to the exact solution."""
    pp = ParmParse.from_string(SHOCKTUBE_IN)
    pp.set("amr.n_cell", [256, 1, 1])
    pp.set("hydro.reconstruction_order", 2)
    sim = Simulation(ShocktubeProblem(), pp)
    sim.set_initial_conditions()
    sim.evolve()
    assert sim.error_norm < 0.01
