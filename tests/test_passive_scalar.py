"""Passive scalar advection through the full hydro solver (reference
``src/problems/PassiveScalar``): a scalar blob in a uniform flow translates
with the flow, stays bounded, and is conserved."""

import jax.numpy as jnp
import numpy as np

from quokka_tpu import ParmParse, Simulation
from quokka_tpu.indices import EGAS, EINT, MX1, RHO, SCALAR0
from quokka_tpu.registry import EOSTraits, PhysicsTraits, Problem


from quokka_tpu.problems.infrastructure import (
    PassiveScalarProblem as ScalarAdvection,
)


def test_passive_scalar_advection():
    prob = ScalarAdvection()
    pp = ParmParse.from_string(
        """
        geometry.prob_hi = 1. 1. 1.
        amr.n_cell = 256 1 1
        cfl = 0.4
        stop_time = 0.4
        max_timesteps = 2000
        verbose = 0
        """
    )
    sim = Simulation(prob, pp)
    sim.set_initial_conditions()
    U0 = np.asarray(sim.U)
    sim.evolve()
    U1 = np.asarray(sim.U)

    # scalar conserved exactly (periodic)
    assert abs(sim.conservation_rel_err[SCALAR0]) < 1e-12
    # bounded (no new extrema beyond limiter tolerance)
    assert U1[SCALAR0].max() <= U0[SCALAR0].max() * (1 + 1e-10)
    assert U1[SCALAR0].min() >= -1e-12

    # translated by v0 * t = 0.4: peak near x = 0.7
    x = np.asarray(sim.grid.cell_centers(0))
    peak_x = x[np.argmax(U1[SCALAR0][:, 0, 0])]
    assert abs(peak_x - 0.7) < 0.02
    # profile matches the translated initial profile
    exact = np.exp(-((np.mod(x - 0.4 - 0.3, 1.0) + 0.0 - 0.0) ** 2) / 0.005)
    exact = np.exp(-((np.minimum(np.abs(x - 0.7), 1 - np.abs(x - 0.7))) ** 2) / 0.005)
    err = np.abs(U1[SCALAR0][:, 0, 0] - exact).sum() / exact.sum()
    assert err < 0.05


class ScalarAdvectionTracers(ScalarAdvection):
    def create_initial_tracer_particles(self, grid):
        import numpy as np

        x = np.linspace(0.1, 0.5, 5)
        pos = np.stack([x, np.full(5, 0.5), np.full(5, 0.5)], axis=-1)
        return pos


def test_tracer_particles_uniform_flow():
    """Tracers in a uniform v=1 flow translate exactly by v*t."""
    pp = ParmParse.from_string(
        """
        geometry.prob_hi = 1. 1. 1.
        amr.n_cell = 64 1 1
        cfl = 0.4
        stop_time = 0.25
        max_timesteps = 200
        verbose = 0
        """
    )
    sim = Simulation(ScalarAdvectionTracers(), pp)
    sim.set_initial_conditions()
    x0 = np.asarray(sim.tracers.x).copy()
    sim.evolve()
    x1 = np.asarray(sim.tracers.x)
    expect = np.mod(x0[:, 0] + 1.0 * sim.t, 1.0)
    np.testing.assert_allclose(x1[:, 0], expect, atol=1e-10)
    np.testing.assert_allclose(x1[:, 1:], x0[:, 1:], atol=1e-12)
