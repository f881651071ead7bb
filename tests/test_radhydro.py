"""Coupled radiation-hydrodynamics: uniform advecting equilibrium.

Reference: RadhydroUniformAdvecting
(``test_radhydro_uniform_advecting.cpp``, beta_order=1 configuration): an
optically-thick gas+radiation mixture in thermal equilibrium advecting at
v0 = 1e-4 c must remain exactly uniform -- transport, IMEX subcycling, the
velocity-dependent work terms, and the implicit coupling must all cancel.
"""

import jax.numpy as jnp
import numpy as np

from quokka_tpu import ParmParse, Simulation
from quokka_tpu.indices import EGAS, EINT, MX1, RHO
from quokka_tpu.registry import EOSTraits, PhysicsTraits, Problem, RadTraits

C = 1.0e8
CHAT = 1.0e7
V0 = 1.0e-4 * C
KAPPA0 = 1.0e4
T0 = 1.0
RHO0 = 1.0
A_RAD = 1.0


from quokka_tpu.problems.infrastructure import (
    RadhydroUniformAdvectingProblem as UniformAdvecting,
)


def test_uniform_advecting_stays_uniform():
    pp = ParmParse.from_string(
        """
        geometry.prob_lo = 0. 0. 0.
        geometry.prob_hi = 32. 1. 1.
        amr.n_cell = 32 1 1
        cfl = 0.3
        radiation.cfl = 0.3
        stop_time = 1.0e-4
        max_timesteps = 2000
        verbose = 0
        """
    )
    prob = UniformAdvecting()
    sim = Simulation(prob, pp)
    sim.set_initial_conditions()
    U0 = np.asarray(sim.U)
    sim.evolve()
    U1 = np.asarray(sim.U)

    assert sim.istep > 20
    # uniformity: every field must stay spatially constant
    for comp in range(U1.shape[0]):
        field = U1[comp][:, 0, 0]
        spread = np.max(field) - np.min(field)
        scale = max(abs(field).max(), 1e-30)
        assert spread / scale < 1e-8, (comp, spread, scale)

    # equilibrium values preserved (gas T and Erad)
    eos = sim.eos
    eint = U1[EINT][0, 0, 0]
    Tg = float(eos.tgas_from_eint(RHO0, eint))
    iE = sim.layout.rad_index(0, 0)
    assert abs(Tg - T0) < 1e-4
    assert abs(U1[iE][0, 0, 0] - A_RAD * T0**4) / (A_RAD * T0**4) < 1e-3
    # momentum conserved
    assert abs(U1[MX1].mean() - RHO0 * V0) / (RHO0 * V0) < 1e-6


def test_multigroup_radhydro_smoke():
    """Coupled multigroup radhydro: uniform equilibrium stays finite and
    near-uniform over a few steps (2 groups)."""
    from quokka_tpu.problems.radhydro_bench import RadhydroBenchProblem
    from quokka_tpu.registry import PhysicsTraits, RadTraits

    class MG(RadhydroBenchProblem):
        name = "RadhydroBenchMG"
        physics = PhysicsTraits(hydro_enabled=True, radiation_enabled=True, n_groups=2)
        rad = RadTraits(
            c_light=1.0e3, c_hat=1.0e2, radiation_constant=1.0,
            Erad_floor=1e-10, beta_order=1, group_edges=(1e-3, 1.0, 1e3),
        )

        def set_initial_conditions(self, grid):
            import jax.numpy as jnp

            from quokka_tpu.radiation.planck import planck_energy_fractions

            U = super().set_initial_conditions(grid)
            layout = self.physics.layout()
            # split the single-group IC into 2 groups by Planck fractions
            iE0 = layout.rad_index(0, 0)
            E_tot = U[iE0]
            from quokka_tpu.indices import EGAS, RHO

            eos = self.make_eos()
            T = eos.tgas_from_eint(U[RHO], U[EGAS])
            fr = planck_energy_fractions(self.rad.group_edges, T, 1.0)
            U = U.at[layout.rad_index(0, 0)].set(E_tot * fr[0])
            U = U.at[layout.rad_index(1, 0)].set(E_tot * fr[1])
            return U

    pp = ParmParse.from_string(
        """
        geometry.prob_hi = 1. 1. 1.
        amr.n_cell = 16 16 16
        cfl = 0.3
        radiation.cfl = 0.3
        stop_time = 1.0
        max_timesteps = 4
        verbose = 0
        """
    )
    sim = Simulation(MG(), pp)
    sim.set_initial_conditions()
    sim.evolve()
    U = np.asarray(sim.U)
    assert sim.istep == 4
    assert np.all(np.isfinite(U))
    for g in range(2):
        assert np.all(U[sim.layout.rad_index(g, 0)] > 0)
