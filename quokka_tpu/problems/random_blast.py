"""Stochastic blast-driven box ("RandomBlast", 3D periodic).

The analog of the reference's RandomBlast science problem
(``src/problems/RandomBlast/blast.cpp``): supernova-like thermal energy
injections at Poisson-random times and positions drive turbulence in a
periodic box (the reference adds Grackle-like cooling). Injections happen
through the per-step hook `compute_before_timestep`, depositing E_blast
over a spherical kernel.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..indices import EGAS, EINT, RHO
from ..registry import (
    BCSpec, EOSTraits, PhysicsTraits, Problem, register_problem,
)

RHO0 = 1.0
P0 = 0.1
E_BLAST = 10.0
R_BLAST = 0.08
RATE = 20.0  # expected blasts per unit time (domain-integrated)


@register_problem
class RandomBlastProblem(Problem):
    name = "RandomBlast"
    physics = PhysicsTraits(hydro_enabled=True)
    eos_traits = EOSTraits(gamma=5.0 / 3.0, mean_molecular_weight=1.0,
                           boltzmann_constant=1.0)
    bcs = BCSpec()  # periodic

    def __init__(self, seed: int = 7):
        self._rng = np.random.default_rng(seed)
        self.n_injected = 0

    def set_initial_conditions(self, grid):
        shape = grid.n_cell
        layout = self.physics.layout()
        g = self.eos_traits.gamma
        eint = jnp.full(shape, P0 / (g - 1.0))
        U = jnp.zeros((layout.nvar, *shape))
        U = U.at[RHO].set(RHO0)
        U = U.at[EGAS].set(eint)
        U = U.at[EINT].set(eint)
        return U

    def compute_before_timestep(self, sim):
        """Poisson-sample blasts for the upcoming step and deposit their
        thermal energy (reference blast.cpp:150-200)."""
        dt = sim.dt_prev
        if not (0.0 < dt < 1.0e30):  # first step: dt_prev not yet set
            dt = sim.init_dt
        n_events = self._rng.poisson(RATE * dt)
        if n_events == 0:
            return
        x, y, z = sim.grid.cell_center_mesh()
        U = sim.U
        for _ in range(int(n_events)):
            c = self._rng.uniform(size=3)
            lo = np.asarray(sim.grid.prob_lo)
            hi = np.asarray(sim.grid.prob_hi)
            pos = lo + c * (hi - lo)
            # periodic minimum-image distance
            L = hi - lo
            dxs = [jnp.abs(q - p) for q, p in zip((x, y, z), pos)]
            dxs = [jnp.minimum(d, Li - d) for d, Li in zip(dxs, L)]
            R2 = dxs[0] ** 2 + dxs[1] ** 2 + dxs[2] ** 2
            kern = jnp.exp(-R2 / (2.0 * R_BLAST**2))
            kern = kern / (jnp.sum(kern) * sim.grid.cell_volume())
            dE = E_BLAST * jnp.broadcast_to(kern, U.shape[1:])
            U = U.at[EGAS].add(dE)
            U = U.at[EINT].add(dE)
            self.n_injected += 1
        sim.U = U
