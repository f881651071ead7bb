"""Multigroup radiation: group-resolved Newton coupling.

With frequency-independent opacity, the 4-group solve must reproduce the
gray (single-group) exact matter-coupling solution for the *total*
radiation energy and gas temperature (the group decomposition is exactly
degenerate), while the per-group energies track the Planck fractions.
Mirrors the role of the reference's RadMatterCouplingRSLA/Vaytet variants
for the multigroup machinery (``src/radiation/source_terms_multi_group.hpp``).
"""

import jax.numpy as jnp
import numpy as np

from quokka_tpu import ParmParse, Simulation
from quokka_tpu.eos import A_RAD_CGS, C_LIGHT_CGS, K_BOLTZMANN_CGS
from quokka_tpu.indices import EGAS, EINT, RHO
from quokka_tpu.problems.rad_matter_coupling import (
    EGAS0,
    ERAD0,
    RHO0,
    RadMatterCouplingProblem,
)
from quokka_tpu.radiation.planck import planck_energy_fractions
from quokka_tpu.registry import PhysicsTraits, RadTraits


class MultigroupCoupling(RadMatterCouplingProblem):
    name = "RadMatterCouplingMG"
    physics = PhysicsTraits(hydro_enabled=False, radiation_enabled=True, n_groups=4)

    # group edges bracket kT at the relevant temperatures (~1e6..1e7 K)
    _kT = K_BOLTZMANN_CGS * 3.0e6
    rad = RadTraits(
        c_light=C_LIGHT_CGS,
        c_hat=C_LIGHT_CGS,
        radiation_constant=A_RAD_CGS,
        Erad_floor=0.0,
        beta_order=1,
        group_edges=(1e-3 * _kT, 0.3 * _kT, 1.0 * _kT, 3.0 * _kT, 100.0 * _kT),
    )

    def set_initial_conditions(self, grid):
        shape = grid.n_cell
        layout = self.physics.layout()
        U = jnp.zeros((layout.nvar, *shape))
        U = U.at[RHO].set(RHO0)
        U = U.at[EGAS].set(EGAS0)
        U = U.at[EINT].set(EGAS0)
        # distribute Erad0 over groups by the Planck fractions at T_rad
        T_rad = (ERAD0 / A_RAD_CGS) ** 0.25
        fr = np.asarray(
            planck_energy_fractions(
                self.rad.group_edges, jnp.asarray(T_rad), K_BOLTZMANN_CGS
            )
        )
        for g in range(4):
            U = U.at[layout.rad_index(g, 0)].set(ERAD0 * float(fr[g]))
        return U


def test_multigroup_coupling_matches_gray():
    pp = ParmParse.from_string(
        """
        geometry.prob_hi = 1e5 1e5 1e5
        amr.n_cell = 4 1 1
        constant_dt = 1.0e-8
        stop_time = 1.0e-2
        verbose = 0
        """
    )
    prob = MultigroupCoupling()
    sim = Simulation(prob, pp)
    sim.set_initial_conditions()
    eos = sim.eos
    rad = sim._radiation

    # integrate to t = 5e-4 (3 e-foldings of the coupling) in scan chunks
    dt = 1.0e-8
    n = 50000
    U = rad.run_steps(sim.U, 0.0, dt, 500)
    for i in range(1, n // 500):
        U = rad.run_steps(U, i * 500 * dt, dt, 500)
    sim.U = U
    t = n * dt

    Egas = float(U[EGAS][0, 0, 0])
    Tgas = float(eos.tgas_from_eint(np.nan, Egas))
    Texact = float(prob.exact_Tgas(np.array([t]))[0])
    rel = abs(Tgas - Texact) / Texact
    print(f"multigroup Tgas={Tgas:.6e} exact={Texact:.6e} rel={rel:.2e}")
    assert rel < 1e-4

    # group energies positive and total consistent with a T_rad^4
    layout = sim.layout
    Erads = np.array([float(U[layout.rad_index(g, 0)][0, 0, 0]) for g in range(4)])
    assert np.all(Erads > 0)
    Trad = (Erads.sum() / A_RAD_CGS) ** 0.25
    assert abs(Trad - Tgas) / Tgas < 0.05  # near equilibrium by 3 e-foldings


def test_multigroup_mixed_precision_coupling():
    """radiation.mixed_precision_coupling with a 4-group f32 state: the
    promoted-f64 group-resolved Newton must land within 1e-4 of the gray
    exact solution, matching the f64 run's accuracy class from an f32
    production state."""
    pp = ParmParse.from_string(
        """
        geometry.prob_hi = 1e5 1e5 1e5
        amr.n_cell = 4 1 1
        constant_dt = 1.0e-8
        stop_time = 1.0e-2
        radiation.mixed_precision_coupling = 1
        verbose = 0
        """
    )
    prob = MultigroupCoupling()
    sim = Simulation(prob, pp, precision="single")
    sim.set_initial_conditions()
    eos = sim.eos
    rad = sim._radiation

    dt = 1.0e-8
    n = 10000
    U = sim.U
    for i in range(n // 500):
        U = rad.run_steps(U, i * 500 * dt, dt, 500)
    t = n * dt
    Egas = float(U[EGAS][0, 0, 0])
    Tgas = float(eos.tgas_from_eint(np.nan, Egas))
    Texact = float(prob.exact_Tgas(np.array([t]))[0])
    rel = abs(Tgas - Texact) / Texact
    print(f"MG mixed f32-state Tgas rel err = {rel:.2e}")
    assert rel < 1e-4
    assert np.all(np.isfinite(np.asarray(U)))
