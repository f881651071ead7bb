"""Multi-device correctness: the shard_mapped step must reproduce the
single-device solver (same math, halos via ppermute instead of wrap/pad).

Runs on the virtual 8-device CPU mesh (see conftest.py), mirroring the
reference's strategy of exercising domain decomposition even in single-rank
CI (SURVEY.md §4 item 2).
"""

import jax
import numpy as np
import pytest

from quokka_tpu import ParmParse, Simulation
from quokka_tpu.parallel.decomp import make_decomposition
from quokka_tpu.problems.shocktube import ShocktubeProblem

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)

SHOCKTUBE_IN = """
geometry.prob_lo = 0.0 0.0 0.0
geometry.prob_hi = 5.0 1.0 1.0
amr.n_cell = 256 1 1
cfl = 0.6
stop_time = 0.05
max_timesteps = 100
hydro.reconstruction_order = 3
verbose = 0
"""


def _run(decomp):
    pp = ParmParse.from_string(SHOCKTUBE_IN)
    sim = Simulation(ShocktubeProblem(), pp, decomp=decomp)
    sim.set_initial_conditions()
    sim.evolve()
    return np.asarray(sim.U), sim.t


def test_sharded_matches_single_device():
    U1, t1 = _run(None)
    decomp = make_decomposition((256, 1, 1), tiles=(8, 1, 1))
    U8, t8 = _run(decomp)
    assert t1 == t8
    # identical numerics up to FP reassociation in XLA partitioning
    np.testing.assert_allclose(U8, U1, rtol=1e-12, atol=1e-12)


def test_sharded_periodic_3d():
    """3D periodic blast on a 2x2x2 mesh: finite, conservative."""
    pp = ParmParse.from_string(
        """
        geometry.prob_lo = 0. 0. 0.
        geometry.prob_hi = 1. 1. 1.
        amr.n_cell = 32 32 32
        cfl = 0.3
        stop_time = 0.02
        max_timesteps = 10
        verbose = 0
        """
    )
    from quokka_tpu.problems.sedov import SedovProblem

    decomp = make_decomposition((32, 32, 32), tiles=(2, 2, 2))
    sim = Simulation(SedovProblem(), pp, decomp=decomp)
    sim.set_initial_conditions()
    sim.evolve()
    U = np.asarray(sim.U)
    assert np.all(np.isfinite(U))
    # mass and energy conservation (periodic box)
    assert abs(sim.conservation_rel_err[0]) < 1e-12
    assert abs(sim.conservation_rel_err[4]) < 1e-12


def test_sharded_radhydro_matches_single_device():
    """Coupled radhydro (transport halos + local implicit coupling) sharded
    over 4 devices must match the single-device run."""
    from quokka_tpu.problems.radhydro_bench import RadhydroBenchProblem

    cfg = """
    geometry.prob_hi = 1. 1. 1.
    amr.n_cell = 32 32 32
    cfl = 0.3
    radiation.cfl = 0.3
    stop_time = 1.0e-1
    max_timesteps = 4
    verbose = 0
    """

    def run(decomp):
        sim = Simulation(RadhydroBenchProblem(), ParmParse.from_string(cfg), decomp=decomp)
        sim.set_initial_conditions()
        sim.evolve()
        return np.asarray(sim.U), sim.istep

    U1, n1 = run(None)
    decomp = make_decomposition((32, 32, 32), devices=jax.devices()[:4], tiles=(2, 2, 1))
    U4, n4 = run(decomp)
    assert n1 == n4 and n1 >= 4
    np.testing.assert_allclose(U4, U1, rtol=5e-11, atol=1e-13)


def test_sharded_sourced_radiation_matches_single_device():
    """User radiation energy sources (Su & Olson volume source) must be
    identical under domain decomposition: the source hook is evaluated on the
    global grid outside shard_map and block-sharded into the substep
    (round-1 regression: the sharded path silently zeroed rad_src)."""
    from quokka_tpu.problems.rad_suolson import RadSuOlsonProblem

    cfg = """
    geometry.prob_lo = 0.0 0.0 0.0
    geometry.prob_hi = 30.0 1.0 1.0
    amr.n_cell = 64 1 1
    cfl = 0.4
    max_dt = 1e-2
    init_dt = 1e-4
    stop_time = 0.05
    max_timesteps = 12
    verbose = 0
    """

    def run(decomp):
        sim = Simulation(RadSuOlsonProblem(), ParmParse.from_string(cfg), decomp=decomp)
        sim.set_initial_conditions()
        sim.evolve()
        return np.asarray(sim.U), sim.istep

    U1, n1 = run(None)
    assert n1 > 0
    decomp = make_decomposition((64, 1, 1), devices=jax.devices()[:4], tiles=(4, 1, 1))
    U4, n4 = run(decomp)
    assert n1 == n4
    assert np.any(U1[-4] != 0.0)  # the source actually did something
    np.testing.assert_allclose(U4, U1, rtol=5e-12, atol=0)


def test_sharded_wavespeed_correction_matches_single_device():
    """The Skinner-Ostriker optical-depth wavespeed correction reads gas
    density/energy during transport, so the sharded path must halo-exchange
    the full state (round-1 regression: the rad-slice fill fed radiation
    components to the optical-depth stencil)."""
    from quokka_tpu.problems.rad_marshak_asymptotic import RadMarshakAsymptoticProblem

    cfg = """
    geometry.prob_lo = 0.0 0.0 0.0
    geometry.prob_hi = 0.66 1.0 1.0
    amr.n_cell = 60 1 1
    radiation.cfl = 0.8
    radiation.wavespeed_correction = 1
    stop_time = 10.0e-9
    max_timesteps = 15
    verbose = 0
    """

    def run(decomp):
        sim = Simulation(
            RadMarshakAsymptoticProblem(), ParmParse.from_string(cfg), decomp=decomp
        )
        sim.set_initial_conditions()
        sim.evolve()
        return np.asarray(sim.U), sim.istep

    U1, n1 = run(None)
    assert n1 > 0
    decomp = make_decomposition((60, 1, 1), devices=jax.devices()[:4], tiles=(4, 1, 1))
    U4, n4 = run(decomp)
    assert n1 == n4
    np.testing.assert_allclose(U4, U1, rtol=5e-12, atol=0)


def test_sharded_gravity_and_particles_match_single_device():
    """Self-gravity (open-BC FFT Poisson) + CIC particles under the device
    mesh: the FFT solve and the particle scatter/gather are global ops on
    sharded arrays (GSPMD inserts the collectives), and must reproduce the
    single-device orbit exactly (the reference redistributes particles
    across MPI ranks instead, src/simulation.hpp + AMReX ParticleContainer)."""
    from quokka_tpu.problems.infrastructure import (
        BinaryOrbitCICProblem as BinaryOrbit,
    )

    prob0 = BinaryOrbit()
    d = prob0.sep
    v = np.sqrt(prob0.G * prob0.M / (2 * d))
    period = 2 * np.pi * (d / 2) / v
    cfg = f"""
    geometry.prob_lo = 0. 0. 0.
    geometry.prob_hi = 1. 1. 1.
    amr.n_cell = 32 32 32
    gravity.Gconst = 1.0
    gravity.bc = open
    constant_dt = {period / 200:.8e}
    stop_time = {period / 8:.8e}
    max_timesteps = 30
    verbose = 0
    """

    def run(decomp):
        sim = Simulation(BinaryOrbit(), ParmParse.from_string(cfg), decomp=decomp)
        sim.set_initial_conditions()
        sim.evolve()
        return np.asarray(sim.particles.x), np.asarray(sim.U)

    x1, U1 = run(None)
    x8, U8 = run(make_decomposition((32, 32, 32), tiles=(4, 2, 1)))
    np.testing.assert_array_equal(x1, x8)
    np.testing.assert_array_equal(U1, U8)
