"""Rayleigh-Taylor: hydrostatic balance preservation and instability growth
under the constant external-gravity hook."""

import dataclasses

import numpy as np
import pytest

from quokka_tpu import ParmParse, Simulation
from quokka_tpu.problems.rayleigh_taylor import RayleighTaylor2DProblem


def _make(perturb, n=(32, 96), stop=2.0):
    pp = ParmParse.from_string(f"""
geometry.prob_lo = -0.25 -0.75 0.0
geometry.prob_hi = 0.25 0.75 1.0
amr.n_cell = {n[0]} {n[1]} 1
cfl = 0.4
stop_time = {stop}
max_timesteps = 20000
verbose = 0
""")
    prob = RayleighTaylor2DProblem()
    prob.perturb = perturb
    sim = Simulation(prob, pp)
    sim.set_initial_conditions()
    return sim


def test_hydrostatic_balance_preserved():
    """Without the perturbation the stratified state must stay static (the
    external-gravity kick balances the pressure gradient)."""
    sim = _make(perturb=False, stop=1.0)
    sim.evolve()
    U = np.asarray(sim.U)
    vmax = np.abs(U[1:4] / U[0]).max()
    # velocities stay at the discretization-error level (the interface
    # pressure kink is not discretely well-balanced, so ~1e-2 startup noise
    # is expected), far below the instability growth scale
    assert vmax < 2e-2, vmax


@pytest.mark.slow
def test_instability_grows():
    sim = _make(perturb=True, stop=4.0)
    sim.evolve()
    U = np.asarray(sim.U)
    assert np.all(np.isfinite(U))
    rho = U[0][:, :, 0]
    # interface has deformed: heavy fluid found below the initial interface
    y = np.asarray(sim.grid.cell_centers(1))
    below = y < -0.05
    assert rho[:, below].max() > 1.5
    # kinetic energy grew well above the seed level
    ke = 0.5 * (U[1] ** 2 + U[2] ** 2).sum() / U[0].mean()
    assert ke > 1e-3
