"""Contact preservation + vacuum robustness (reference HydroContact /
HydroVacuum problems).

HLLC resolves a stationary contact discontinuity exactly (reference
HydroContact checks the profile is preserved); the double-rarefaction
vacuum problem stresses the positivity machinery (FOFC + floors +
retries)."""

import jax.numpy as jnp
import numpy as np

from quokka_tpu import ParmParse, Simulation
from quokka_tpu.indices import EGAS, EINT, MX1, RHO
from quokka_tpu.registry import EOSTraits, PhysicsTraits, Problem


class Contact(Problem):
    name = "HydroContact"
    physics = PhysicsTraits(hydro_enabled=True)
    eos_traits = EOSTraits(gamma=1.4)

    v0 = 0.0  # stationary contact

    def set_initial_conditions(self, grid):
        x = grid.cell_centers(0)[:, None, None]
        shape = grid.n_cell
        rho = jnp.where(x < 0.5, 1.4, 1.0)
        P = 1.0
        eint = P / 0.4
        zeros = jnp.zeros(shape)
        rho = jnp.broadcast_to(rho, shape)
        return jnp.stack([
            rho, rho * self.v0, zeros, zeros,
            jnp.full(shape, eint) + 0.5 * rho * self.v0**2,
            jnp.full(shape, eint),
        ])


class Vacuum(Problem):
    """Double rarefaction: opposed velocities evacuate the center."""

    name = "HydroVacuum"
    physics = PhysicsTraits(hydro_enabled=True)
    eos_traits = EOSTraits(gamma=1.4)

    def set_initial_conditions(self, grid):
        x = grid.cell_centers(0)[:, None, None]
        shape = grid.n_cell
        v = jnp.where(x < 0.5, -2.0, 2.0)
        rho = 1.0
        P = 0.4
        eint = P / 0.4
        zeros = jnp.zeros(shape)
        v = jnp.broadcast_to(v, shape)
        return jnp.stack([
            jnp.full(shape, rho), rho * v, zeros, zeros,
            jnp.full(shape, eint) + 0.5 * rho * v * v,
            jnp.full(shape, eint),
        ])


def test_stationary_contact_exact():
    pp = ParmParse.from_string(
        """
        geometry.prob_hi = 1. 1. 1.
        amr.n_cell = 128 1 1
        cfl = 0.4
        stop_time = 2.0
        max_timesteps = 2000
        verbose = 0
        """
    )
    sim = Simulation(Contact(), pp)
    sim.set_initial_conditions()
    U0 = np.asarray(sim.U)
    sim.evolve()
    U1 = np.asarray(sim.U)
    # HLLC keeps a stationary contact exactly (to roundoff)
    np.testing.assert_allclose(U1[RHO], U0[RHO], atol=1e-12)
    np.testing.assert_allclose(U1[MX1], 0.0, atol=1e-12)


def test_vacuum_double_rarefaction():
    pp = ParmParse.from_string(
        """
        geometry.prob_hi = 1. 1. 1.
        amr.n_cell = 256 1 1
        cfl = 0.3
        stop_time = 0.1
        max_timesteps = 5000
        verbose = 0
        """
    )
    sim = Simulation(Vacuum(), pp)
    sim.set_initial_conditions()
    sim.evolve()
    U = np.asarray(sim.U)
    assert np.all(np.isfinite(U))
    assert U[RHO].min() > 0.0
    # center evacuated symmetrically
    rho_line = U[RHO][:, 0, 0]
    assert rho_line[128] < 0.1
    np.testing.assert_allclose(rho_line, rho_line[::-1], rtol=1e-6)
