"""Classic hydro problems: SMS exact criterion, Shu-Osher self-convergence,
HighMach positivity, Quirk planarity (carbuncle suppression)."""

import jax.numpy as jnp
import numpy as np
import pytest

from quokka_tpu import ParmParse, Simulation
from quokka_tpu.problems.hydro_suite import (
    HighMachProblem,
    QuirkProblem,
    ShuOsherProblem,
    SlowMovingShockProblem,
)


def _run(prob, n, stop, cfl=0.4, ny=1, extra=""):
    pp = ParmParse.from_string(f"""
geometry.prob_lo = 0.0 0.0 0.0
geometry.prob_hi = {prob_hi_for(prob)} {0.125 if ny > 1 else 1.0} 1.0
amr.n_cell = {n} {ny} 1
cfl = {cfl}
stop_time = {stop}
max_timesteps = 20000
verbose = 0
{extra}
""")
    sim = Simulation(prob, pp)
    sim.set_initial_conditions()
    sim.evolve()
    return sim


def prob_hi_for(prob):
    return 10.0 if isinstance(prob, ShuOsherProblem) else 1.0


@pytest.mark.slow
def test_sms_exact():
    """Slow-moving shock vs the exact translated jump (reference tolerance
    0.005, test_hydro_sms.cpp:294)."""
    prob = SlowMovingShockProblem()
    sim = _run(prob, 256, 1.0)
    U = np.asarray(sim.U)
    x = np.asarray(sim.grid.cell_centers(0))
    rho_e, vx_e, P_e = prob.exact_solution(x, sim.t)
    rho = U[0][:, 0, 0]
    # rms-of-L1 over (rho, mom, E) like the reference error norm; dominant
    # component check on density
    err = np.sum(np.abs(rho - rho_e)) / np.sum(np.abs(rho_e))
    assert err < 0.005, err


@pytest.mark.slow
def test_shuosher_self_convergence():
    """Shu-Osher at 200 cells tracks the 800-cell solution (the reference
    compares to a stored fine-grid profile with 1% tolerance)."""
    sims = {}
    for n in (200, 800):
        sims[n] = _run(ShuOsherProblem(), n, 1.8)
    rho_c = np.asarray(sims[200].U)[0][:, 0, 0]
    rho_f = np.asarray(sims[800].U)[0][:, 0, 0]
    rho_f_avg = rho_f.reshape(200, 4).mean(axis=1)
    err = np.sum(np.abs(rho_c - rho_f_avg)) / np.sum(np.abs(rho_f_avg))
    assert err < 0.05, err
    assert np.all(np.isfinite(rho_c))


def test_highmach_positivity():
    """Pressureless collapse at Mach ~ 1e5: density and internal energy
    stay positive through shock formation (dual-energy + floors)."""
    sim = _run(HighMachProblem(), 128, 1.0)
    U = np.asarray(sim.U)
    assert np.all(np.isfinite(U))
    assert np.all(U[0] > 0.0)
    assert np.all(U[5] > 0.0)
    # collapse happened: strong density contrast formed
    assert U[0].max() / U[0].min() > 5.0


@pytest.mark.slow
def test_quirk_planarity():
    """Quirk's odd-even test: the shock must stay planar -- the y-variation
    of the density behind the shock stays at the perturbation level instead
    of growing into a carbuncle (Minoshima & Miyoshi 2021 fix)."""
    prob = QuirkProblem()
    sim = _run(prob, 128, 0.4, ny=16,
               extra="hydro.reconstruction_order = 2")
    U = np.asarray(sim.U)
    assert np.all(np.isfinite(U))
    rho = U[0][:, :, 0]
    # y-spread of density, normalized per x-column
    spread = (rho.max(axis=1) - rho.min(axis=1)) / rho.mean(axis=1)
    # a single-cell variation AT the captured shock front is the expected
    # odd-even remnant; a carbuncle grows a multi-cell bulge -- require
    # planarity everywhere except the immediate front (2 cells)
    front = int(np.argmax(spread))
    mask = np.ones_like(spread, bool)
    mask[max(0, front - 2):front + 3] = False
    assert spread[mask].max() < 0.02, spread[mask].max()
    assert spread.max() < 0.2, spread.max()


@pytest.mark.slow
def test_richtmeyer_meshkov_growth():
    """After the shock crosses the perturbed contact, the interface
    perturbation grows (RM instability) while the solution stays finite."""
    from quokka_tpu.problems.hydro_suite import RichtmeyerMeshkovProblem

    pp = ParmParse.from_string("""
geometry.prob_hi = 1.0 1.0 1.0
amr.n_cell = 128 64 1
cfl = 0.4
stop_time = 0.4
max_timesteps = 5000
verbose = 0
""")
    sim = Simulation(RichtmeyerMeshkovProblem(), pp)
    sim.set_initial_conditions()
    sim.evolve()
    U = np.asarray(sim.U)
    assert np.all(np.isfinite(U))
    rho = U[0][:, :, 0]
    # interface corrugation: per-row upstream edge of the shocked heavy
    # fluid (rho > 5; shocked light stays < 3) stays corrugated at or
    # above the initial 0.04 peak-to-peak amplitude, and the RM vorticity
    # deposition shows up as transverse velocity at the interface
    x = np.asarray(sim.grid.cell_centers(0))
    idx = np.argmax(rho > 5.0, axis=0)
    spread = x[idx].max() - x[idx].min()
    assert spread > 0.04, spread
    vy = U[2][:, :, 0] / rho
    assert np.abs(vy).max() > 0.02, np.abs(vy).max()


def test_blast2d_symmetry():
    from quokka_tpu.problems.hydro_suite import Blast2DProblem

    pp = ParmParse.from_string("""
geometry.prob_hi = 1.0 1.0 1.0
amr.n_cell = 64 64 1
cfl = 0.4
stop_time = 0.1
max_timesteps = 2000
verbose = 0
""")
    sim = Simulation(Blast2DProblem(), pp)
    sim.set_initial_conditions()
    sim.evolve()
    U = np.asarray(sim.U)
    assert np.all(np.isfinite(U))
    rho = U[0][:, :, 0]
    # quadrant symmetry of the cylindrical blast
    np.testing.assert_allclose(rho, rho[::-1, :], rtol=1e-10)
    np.testing.assert_allclose(rho, rho[:, ::-1], rtol=1e-10)
    np.testing.assert_allclose(rho, rho.T, rtol=1e-10)
