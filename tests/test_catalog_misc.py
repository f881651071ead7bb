"""Catalog problems: 2D diagonal advection period-return and the turbulent
self-gravitating cloud smoke test."""

import numpy as np
import pytest

from quokka_tpu import ParmParse, Simulation


def test_advection2d_period_return():
    from quokka_tpu.problems.advection2d import Advection2DProblem, VX

    pp = ParmParse.from_string("""
geometry.prob_hi = 1.0 1.0 1.0
amr.n_cell = 64 64 1
cfl = 0.4
stop_time = 1.0
max_timesteps = 4000
verbose = 0
""")
    sim = Simulation(Advection2DProblem(), pp)
    sim.set_initial_conditions()
    U0 = np.asarray(sim.U)
    sim.evolve()
    U = np.asarray(sim.U)
    # after one x-period (vx = 1, t = 1) and half a y-period the blob is at
    # (0.5, 0.0) -- compare against the initial condition rolled by half the
    # box in y
    rho_expect = np.roll(U0[0], U0[0].shape[1] // 2, axis=1)
    err = np.sum(np.abs(U[0] - rho_expect)) / np.sum(np.abs(rho_expect))
    assert err < 0.015, err


@pytest.mark.slow
def test_star_cluster_smoke():
    from quokka_tpu.problems.star_cluster import StarClusterProblem

    pp = ParmParse.from_string("""
geometry.prob_hi = 2.0 2.0 2.0
amr.n_cell = 32 32 32
cfl = 0.3
gravity.Gconst = 0.05
stop_time = 0.2
max_timesteps = 200
verbose = 0
""")
    sim = Simulation(StarClusterProblem(), pp)
    sim.set_initial_conditions()
    ke0 = float((np.asarray(sim.U)[1:4] ** 2).sum())
    assert ke0 > 0.0  # turbulence seeded
    sim.evolve()
    U = np.asarray(sim.U)
    assert np.all(np.isfinite(U))
    assert np.all(U[0] > 0.0)
