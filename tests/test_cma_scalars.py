"""Consistent multi-species advection (CMA) through a shock.

Reference: HydroShocktubeCMA (``src/problems/HydroShocktubeCMA``): mass
scalars (partial densities) advected with the Plewa & Muller 1999 flux
rescaling must sum to the total density everywhere, including across the
shock."""

import jax.numpy as jnp
import numpy as np

from quokka_tpu import ParmParse, Simulation
from quokka_tpu.indices import EGAS, EINT, RHO, SCALAR0
from quokka_tpu.problems.shocktube import ShocktubeProblem
from quokka_tpu.registry import PhysicsTraits


from quokka_tpu.problems.infrastructure import (
    ShocktubeCMAProblem as ShocktubeCMA,
)


def test_cma_species_sum_to_density():
    pp = ParmParse.from_string(
        """
        geometry.prob_lo = 0.0 0.0 0.0
        geometry.prob_hi = 5.0 1.0 1.0
        amr.n_cell = 256 1 1
        cfl = 0.6
        stop_time = 0.2
        max_timesteps = 2000
        verbose = 0
        """
    )
    sim = Simulation(ShocktubeCMA(), pp)
    sim.set_initial_conditions()
    sim.evolve()
    U = np.asarray(sim.U)
    rho = U[RHO]
    s_sum = U[SCALAR0] + U[SCALAR0 + 1]
    # CMA: species sum tracks total density to roundoff-ish accuracy
    rel = np.abs(s_sum - rho) / rho
    assert rel.max() < 1e-10
    # species fractions preserved (pure advection of uniform fractions)
    frac = U[SCALAR0] / rho
    assert np.abs(frac - 0.6).max() < 1e-10
