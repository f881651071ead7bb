"""PopIII: turbulent rotating primordial cloud with gravity + chemistry.

Reference ``src/problems/PopIII/popiii.cpp`` + ``tests/PopIII.in`` (CI runs
10 coarse steps unigrid as a smoke test).  Acceptance here: the run stays
finite with chemistry burning in the Strang slot and gravity kicking, the
nuclei totals are conserved through advection + burn, the cloud keeps
rotating (angular momentum nonzero), and the Jeans ErrorEst tags the
overdense core once the density threshold is crossed.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from quokka_tpu import ParmParse, Simulation
from quokka_tpu.indices import RHO, SCALAR0
from quokka_tpu.microphysics.chem_coupling import (
    partial_densities_to_number_densities,
)
from quokka_tpu.problems.popiii import JEANS_RHO_THRESH, PopIIIProblem

CFG = """
geometry.prob_lo = -3.703e18 -3.703e18 -3.703e18
geometry.prob_hi = 3.703e18 3.703e18 3.703e18
amr.n_cell = 32 32 32
hydro.reconstruction_order = 3
cfl = 0.15
max_timesteps = 10
stop_time = 1e16
do_subcycle = 0
density_floor = 1e-25
chemistry.enabled = 1
chemistry.min_density_allowed = 5e-21
verbose = 0
"""


@pytest.fixture(scope="module")
def evolved():
    prob = PopIIIProblem()
    sim = Simulation(prob, ParmParse.from_string(CFG))
    sim.set_initial_conditions()
    U0 = np.asarray(sim.U).copy()
    sim.evolve()
    return prob, sim, U0


def test_popiii_runs_finite(evolved):
    prob, sim, U0 = evolved
    assert sim.istep == 10
    U = np.asarray(sim.U)
    assert np.all(np.isfinite(U))
    assert np.all(U[RHO] > 0)


def test_popiii_nuclei_conserved(evolved):
    prob, sim, U0 = evolved
    net = prob.chemistry_network

    def totals(U):
        nden = partial_densities_to_number_densities(
            jnp.asarray(U[SCALAR0:SCALAR0 + 12]), net)
        n = jnp.moveaxis(nden, 0, -1)
        return [float(jnp.sum(t)) for t in net.conserved_totals(n)[:3]]

    t0 = totals(U0)
    t1 = totals(np.asarray(sim.U))
    for a, b in zip(t0, t1):
        # outflow boundaries: conserved up to the (tiny) boundary flux
        assert b == pytest.approx(a, rel=1e-3)


def test_popiii_rotation_and_turbulence(evolved):
    prob, sim, U0 = evolved
    U = np.asarray(sim.U)
    # angular momentum about z (cloud rotation persists)
    g = sim.grid
    x, y, _z = g.cell_center_mesh()
    xx = np.broadcast_to(np.asarray(x), g.n_cell)
    yy = np.broadcast_to(np.asarray(y), g.n_cell)
    Lz = float((xx * U[2] - yy * U[1]).sum())
    Lz0 = float((xx * U0[2] - yy * U0[1]).sum())
    assert Lz != 0.0
    assert Lz == pytest.approx(Lz0, rel=0.05)


def test_popiii_code_units_matches_cgs(evolved):
    """The code-units formulation (the one that can run on TPU hardware,
    where raw-CGS magnitudes overflow the f64 emulation's f32 exponent
    range) must reproduce the CGS run: state_code * unit_factor ==
    state_cgs to rounding accumulation over 10 steps."""
    from quokka_tpu.indices import EGAS, EINT, MX1
    from quokka_tpu.problems.popiii import PopIIICodeUnitsProblem

    _prob_cgs, sim_cgs, _U0 = evolved
    prob = PopIIICodeUnitsProblem()
    u_rho, u_len, u_t = prob.units
    u_v = u_len / u_t

    def r(x):
        return repr(float(x))

    cfg = f"""
    geometry.prob_lo = {r(-3.703e18 / u_len)} {r(-3.703e18 / u_len)} {r(-3.703e18 / u_len)}
    geometry.prob_hi = {r(3.703e18 / u_len)} {r(3.703e18 / u_len)} {r(3.703e18 / u_len)}
    amr.n_cell = 32 32 32
    hydro.reconstruction_order = 3
    cfl = 0.15
    max_timesteps = 10
    stop_time = {r(1e16 / u_t)}
    do_subcycle = 0
    density_floor = {r(1e-25 / u_rho)}
    chemistry.enabled = 1
    chemistry.min_density_allowed = 5e-21
    verbose = 0
    """
    sim = Simulation(prob, ParmParse.from_string(cfg))
    assert sim.Gconst == pytest.approx(1.0, rel=1e-12)  # G_code = 1
    sim.set_initial_conditions()
    sim.evolve()
    assert sim.istep == sim_cgs.istep

    fac = np.ones(sim.layout.nvar)
    fac[RHO] = u_rho
    fac[MX1:MX1 + 3] = u_rho * u_v
    fac[EGAS] = fac[EINT] = u_rho * u_v * u_v
    fac[SCALAR0:] = u_rho
    U_code = np.asarray(sim.U) * fac.reshape(-1, 1, 1, 1)
    U_cgs = np.asarray(sim_cgs.U)
    for comp in range(U_cgs.shape[0]):
        scale = np.abs(U_cgs[comp]).max()
        err = np.abs(U_code[comp] - U_cgs[comp]).max() / scale
        assert err < 2e-5, (comp, err)


def test_popiii_jeans_tagging(evolved):
    """The Jeans criterion tags the collapsing core once rho crosses the
    threshold (reference jeansRefine.* machinery)."""
    prob, sim, _ = evolved

    class _FakeAMR:
        level_U = [sim.U]
        level_grids = [sim.grid]

    tags = np.asarray(prob.error_est(_FakeAMR(), 0))
    rho = np.asarray(sim.U[RHO])
    # no tagging below the density threshold
    assert not np.any(tags & (rho <= JEANS_RHO_THRESH))
    # raise the density artificially: the core must tag
    U_dense = sim.U.at[RHO].multiply(1e3)
    U_dense = U_dense.at[5].multiply(1e3)

    class _FakeAMR2:
        level_U = [U_dense]
        level_grids = [sim.grid]

    tags2 = np.asarray(prob.error_est(_FakeAMR2(), 0))
    assert tags2.sum() > 0
