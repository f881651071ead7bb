"""Face-centered quantities: init, evolve, checkpoint/restart round-trip.

Mirrors the reference's FCQuantities infrastructure test
(``src/problems/FCQuantities/test_fc_quantities.cpp``): with MHD traits
enabled, face-centered state (one velocity + one B per dimension) is
initialized on staggered grids, survives a hydro evolve (the induction
update is stub-level in the reference too), and round-trips bitwise
through checkpoint/restart.
"""

import os

import jax.numpy as jnp
import numpy as np

from quokka_tpu import ParmParse, Simulation
from quokka_tpu.registry import EOSTraits, PhysicsTraits, Problem

GAMMA = 5.0 / 3.0
RHO0 = 1.0
P0 = 1.0 / GAMMA
AMP = 1.0e-6


from quokka_tpu.problems.infrastructure import (
    FCQuantitiesProblem as FCQuantities,
)


CFG = """
amr.n_cell = 32 4 4
geometry.prob_hi = 1.0 0.125 0.125
cfl = 0.3
stop_time = 0.05
max_timesteps = 10
verbose = 0
"""


def test_fc_init_and_restart_roundtrip(tmp_path):
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        sim = Simulation(FCQuantities(), ParmParse.from_string(CFG))
        sim.set_initial_conditions()
        assert sim.U_fc is not None
        assert sim.U_fc[0].shape == (2, 33, 4, 4)
        assert sim.U_fc[1].shape == (2, 32, 5, 4)
        assert sim.U_fc[2].shape == (2, 32, 4, 5)
        sim.evolve()
        sim.write_checkpoint()

        sim2 = Simulation(FCQuantities(), ParmParse.from_string(
            CFG + f"restartfile = {tmp_path / 'last_chk'}\n"))
        sim2.set_initial_conditions()
        for d in range(3):
            np.testing.assert_array_equal(
                np.asarray(sim2.U_fc[d]), np.asarray(sim.U_fc[d])
            )
        np.testing.assert_array_equal(np.asarray(sim2.U), np.asarray(sim.U))
    finally:
        os.chdir(cwd)


def test_fc_shape_validation():
    class BadFC(FCQuantities):
        name = "BadFC"

        def set_initial_conditions_fc(self, grid):
            return [jnp.zeros((2, *grid.n_cell))] * 3  # not staggered

    sim = Simulation(BadFC(), ParmParse.from_string(CFG))
    import pytest

    with pytest.raises(ValueError, match="staggered"):
        sim.set_initial_conditions()
