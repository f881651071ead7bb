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


class ShocktubeCMA(ShocktubeProblem):
    name = "HydroShocktubeCMA"
    physics = PhysicsTraits(hydro_enabled=True, n_scalars=2, n_mscalars=2)

    def set_initial_conditions(self, grid):
        U = super().set_initial_conditions(grid)
        # pad to the larger layout and split rho into two species 60/40
        nvar = self.physics.layout().nvar
        full = jnp.zeros((nvar, *grid.n_cell))
        full = full.at[:U.shape[0]].set(U)
        full = full.at[SCALAR0].set(0.6 * U[RHO])
        full = full.at[SCALAR0 + 1].set(0.4 * U[RHO])
        return full

    def fill_user_boundary(self, Ug, grid, ng, time, axis, side):
        Ug = super().fill_user_boundary(Ug, grid, ng, time, axis, side)
        g = ng[0]
        rho, _ = self._state_lr(left=(side == 0))
        sl = slice(0, g) if side == 0 else slice(-g, None)
        Ug = Ug.at[SCALAR0, sl].set(0.6 * rho)
        Ug = Ug.at[SCALAR0 + 1, sl].set(0.4 * rho)
        return Ug

    def compute_reference_solution(self, sim):
        return None  # CMA consistency is the check here


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
