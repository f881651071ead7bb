"""Gravity: open-BC Poisson solver accuracy + CIC two-body orbit.

Mirrors the reference's gravity validation problems (BinaryOrbitCIC,
SphericalCollapse; SURVEY.md §2.5): the free-space solver must reproduce
the point-mass potential, and two CIC particles on a circular orbit must
conserve their separation over an orbital period (reference
``src/problems/BinaryOrbitCIC``).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from quokka_tpu import Grid, ParmParse, Simulation
from quokka_tpu.gravity import poisson as pg
from quokka_tpu.indices import EGAS, EINT, RHO
from quokka_tpu.particles.cic import ParticleData
from quokka_tpu.registry import EOSTraits, PhysicsTraits, Problem


def test_poisson_point_mass():
    """phi of a single massive cell ~ -GM/r away from the source."""
    n = 64
    grid = Grid((n, n, n), (0, 0, 0), (1, 1, 1))
    G = 1.0
    M = 3.0
    rho = jnp.zeros(grid.n_cell).at[n // 2, n // 2, n // 2].set(M / grid.cell_volume())
    rhs = 4 * jnp.pi * G * rho
    phi = pg.solve_poisson_open(rhs, grid.dx)
    phi = np.asarray(phi)

    x = np.asarray(grid.cell_centers(0))
    c = x[n // 2]
    for off in (5, 10, 20):
        r = off * grid.dx[0]
        val = phi[n // 2 + off, n // 2, n // 2]
        exact = -G * M / r
        assert abs(val - exact) / abs(exact) < 0.01, (off, val, exact)


def test_poisson_periodic_consistency():
    """Periodic spectral solve: discrete Laplacian of phi reproduces rhs."""
    n = 32
    grid = Grid((n, n, n), (0, 0, 0), (1, 1, 1))
    key = jnp.arange(n * n * n, dtype=jnp.float64).reshape(n, n, n)
    rhs = jnp.sin(2 * jnp.pi * key / key.size * 37.0)
    rhs = rhs - jnp.mean(rhs)
    phi = pg.solve_poisson_periodic(rhs, grid.dx)
    lap = jnp.zeros_like(phi)
    for d in range(3):
        lap = lap + (jnp.roll(phi, 1, d) + jnp.roll(phi, -1, d) - 2 * phi) / grid.dx[d] ** 2
    np.testing.assert_allclose(np.asarray(lap), np.asarray(rhs), atol=1e-8)


from quokka_tpu.problems.infrastructure import (
    BinaryOrbitCICProblem as BinaryOrbit,
)


def test_binary_orbit():
    prob = BinaryOrbit()
    d = prob.sep
    v = np.sqrt(prob.G * prob.M / (2 * d))
    period = 2 * np.pi * (d / 2) / v

    # quarter orbit at 32^3 (full-orbit at higher resolution is the
    # reference's long-running CI variant)
    t_end = period / 4
    pp = ParmParse.from_string(
        f"""
        geometry.prob_lo = 0. 0. 0.
        geometry.prob_hi = 1. 1. 1.
        amr.n_cell = 32 32 32
        gravity.Gconst = 1.0
        gravity.bc = open
        constant_dt = {period / 200:.8e}
        stop_time = {t_end:.8e}
        max_timesteps = 100
        verbose = 0
        """
    )
    sim = Simulation(prob, pp)
    sim.set_initial_conditions()
    sim.evolve()

    xp = np.asarray(sim.particles.x)
    sep_final = np.linalg.norm(xp[0] - xp[1])
    # separation conserved to a few percent over the quarter orbit
    # (reference BinaryOrbitCIC checks orbital stability similarly)
    assert abs(sep_final - d) / d < 0.05
    # particles stayed in the orbital plane
    assert abs(xp[0][2] - 0.5) < 1e-6
    # and actually moved along the orbit
    assert np.linalg.norm(xp[0] - np.array([0.5 - d / 2, 0.5, 0.5])) > 0.3 * d
