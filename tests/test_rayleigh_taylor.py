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


def test_rt3d_growth():
    """RayleighTaylor3D (reference src/problems/RayleighTaylor3D): the
    interface is unstable -- perturbation kinetic energy grows -- and the
    heavy-fluid scalar stays bounded in [0, rho_top]."""
    import numpy as np
    from quokka_tpu.problems.rayleigh_taylor import RayleighTaylor3DProblem

    pp = ParmParse.from_string("""
geometry.prob_lo = -0.25 -0.25 -0.375
geometry.prob_hi = 0.25 0.25 0.375
amr.n_cell = 16 16 24
cfl = 0.3
stop_time = 2.0
max_timesteps = 120
verbose = 0
""")
    sim = Simulation(RayleighTaylor3DProblem(), pp)
    sim.set_initial_conditions()
    U0 = np.asarray(sim.U)
    ke_z0 = float((U0[3] ** 2 / U0[0]).sum())
    sim.evolve()
    U = np.asarray(sim.U)
    assert np.all(np.isfinite(U))
    ke_z1 = float((U[3] ** 2 / U[0]).sum())
    assert ke_z1 > 2.0 * ke_z0  # instability grows
    s = U[6] / U[0]
    # reconstruction can overshoot the fraction by O(1e-4) at the interface
    assert s.min() > -1e-4 and s.max() < 1.0 + 1e-4
