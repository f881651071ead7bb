"""AMR + radiation: per-level radiation subcycling, space-time-interpolated
coarse-fine fills, and radiation refluxing.

Mirrors the reference's coupled AMR radhydro usage
(`QuokkaSimulation::advanceSingleTimestepAtLevel` doing hydro then the
radiation subcycle at every level, with radiation components in the flux
registers, ``src/QuokkaSimulation.hpp:886-990, 1577-1650``).

Key invariance check: a gas-radiation equilibrium uniform state must stay
exactly uniform under a refined level -- any inconsistency in the fine-level
transport fill, prolongation, refluxing, or average-down breaks uniformity.
"""

import jax.numpy as jnp
import numpy as np

from quokka_tpu import ParmParse
from quokka_tpu.amr import AMRSimulation
from quokka_tpu.indices import EGAS, EINT, RHO
from quokka_tpu.registry import EOSTraits, PhysicsTraits, Problem, RadTraits

C_CODE = 1.0e3
CHAT = 1.0e2
KAPPA = 10.0
A_RAD = 1.0
T0 = 1.0


class _RadhydroAMRBase(Problem):
    physics = PhysicsTraits(hydro_enabled=True, radiation_enabled=True)
    eos_traits = EOSTraits(gamma=5.0 / 3.0, mean_molecular_weight=1.0,
                           boltzmann_constant=1.0)
    rad = RadTraits(c_light=C_CODE, c_hat=CHAT, radiation_constant=A_RAD,
                    Erad_floor=1e-12, beta_order=1)

    def compute_planck_opacity(self, rho, T):
        return jnp.full_like(rho, KAPPA)

    def error_est(self, sim, level):
        # static refined patch in the domain center
        g = sim.level_grids[level]
        x, y, z = g.cell_center_mesh()
        r2 = (x - 0.5) ** 2 + (y - 0.5) ** 2
        return jnp.broadcast_to(r2 < 0.06, g.n_cell)


class UniformEquilibrium(_RadhydroAMRBase):
    name = "RadAMR_Uniform"

    def set_initial_conditions(self, grid):
        shape = grid.n_cell
        layout = self.physics.layout()
        eos = self.make_eos()
        eint = eos.eint_from_tgas(1.0, T0) * jnp.ones(shape)
        U = jnp.zeros((layout.nvar, *shape))
        U = U.at[RHO].set(1.0)
        U = U.at[EGAS].set(eint)
        U = U.at[EINT].set(eint)
        U = U.at[layout.rad_index(0, 0)].set(A_RAD * T0**4)
        return U


class RadPulseAMR(_RadhydroAMRBase):
    name = "RadAMR_Pulse"

    def set_initial_conditions(self, grid):
        x, y, _z = grid.cell_center_mesh()
        shape = grid.n_cell
        layout = self.physics.layout()
        eos = self.make_eos()
        r2 = (x - 0.5) ** 2 + (y - 0.5) ** 2
        T = T0 * (1.0 + 0.5 * jnp.exp(-r2 / 0.01))
        T = jnp.broadcast_to(T, shape)
        eint = eos.eint_from_tgas(1.0, T)
        U = jnp.zeros((layout.nvar, *shape))
        U = U.at[RHO].set(1.0)
        U = U.at[EGAS].set(eint)
        U = U.at[EINT].set(eint)
        U = U.at[layout.rad_index(0, 0)].set(A_RAD * T**4)
        return U


def _make_sim(problem, n=16, max_level=1, **extra):
    lines = [
        "geometry.prob_hi = 1.0 1.0 1.0",
        f"amr.n_cell = {n} {n} 1",
        f"amr.max_level = {max_level}",
        "cfl = 0.3",
        "radiation.cfl = 0.3",
        "verbose = 0",
    ] + [f"{k} = {v}" for k, v in extra.items()]
    sim = AMRSimulation(problem, ParmParse.from_string("\n".join(lines)))
    sim.set_initial_conditions()
    return sim


def test_amr_radhydro_uniform_equilibrium():
    """Uniform gas-radiation equilibrium stays uniform with a refined level."""
    sim = _make_sim(UniformEquilibrium())
    assert sim.finest_level == 1
    U0 = np.asarray(sim.level_U[0])
    for _ in range(4):
        dt = sim.compute_timestep()
        assert sim.advance_single_step(dt)
        sim.t += dt
    for l in range(sim.finest_level + 1):
        U = np.asarray(sim.level_U[l])
        assert np.all(np.isfinite(U))
        for comp in (RHO, EGAS, EINT):
            spread = np.ptp(U[comp])
            assert spread < 1e-10 * np.max(np.abs(U[comp])), (l, comp, spread)
        erad = U[6]
        assert np.ptp(erad) < 1e-10 * np.max(erad)
    # and nothing drifted
    Uend = np.asarray(sim.level_U[0])
    np.testing.assert_allclose(Uend[RHO], U0[RHO], rtol=1e-12)
    np.testing.assert_allclose(Uend[EGAS], U0[EGAS], rtol=1e-8)


def test_amr_radhydro_pulse_tracks_unigrid():
    """A central radiation/temperature pulse evolved with a static refined
    patch must stay close to the same problem run unigrid at the COARSE
    resolution (the AMR solution should be at least as accurate; here we
    check consistency, finiteness, and that refluxing keeps the composite
    conservation of gas energy exchange bounded)."""
    from quokka_tpu.simulation import Simulation

    prob = RadPulseAMR()
    sim = _make_sim(prob, n=16, max_level=1)
    assert sim.finest_level == 1
    nsteps = 3
    for _ in range(nsteps):
        dt = sim.compute_timestep()
        assert sim.advance_single_step(dt)
        sim.t += dt
    t_end = sim.t

    # unigrid reference at the coarse resolution
    pp = ParmParse.from_string("""
geometry.prob_hi = 1.0 1.0 1.0
amr.n_cell = 16 16 1
cfl = 0.3
radiation.cfl = 0.3
verbose = 0
""")
    ref = Simulation(RadPulseAMR(), pp)
    ref.set_initial_conditions()
    while ref.t < t_end - 1e-12:
        dt = min(ref.compute_timestep(), t_end - ref.t)
        assert ref.advance_single_step(dt)
        ref.t += dt

    Uc = np.asarray(sim.level_U[0])
    Ur = np.asarray(ref.U)
    assert np.all(np.isfinite(Uc))
    # coarse level of the AMR run tracks the unigrid run (they differ only
    # by the averaged-down fine solution + refluxing in the patch)
    for comp in (RHO, EGAS, 6):
        denom = np.max(np.abs(Ur[comp]))
        err = np.max(np.abs(Uc[comp] - Ur[comp])) / denom
        assert err < 0.05, (comp, err)


def test_amr_level_radiation_pallas_matches_xla():
    """AMR per-level radiation rides the Pallas transport kernels (they
    emit the flux dict the reflux register needs); 3D pulse with
    radiation.use_pallas on/off must agree to f32 roundoff on every
    level (kernels run interpreted off-TPU)."""

    class RadPulse3D(_RadhydroAMRBase):
        name = "RadAMR_Pulse3D_PallasParity"

        def set_initial_conditions(self, grid):
            x, y, z = grid.cell_center_mesh()
            shape = grid.n_cell
            layout = self.physics.layout()
            eos = self.make_eos()
            r2 = (x - 0.5) ** 2 + (y - 0.5) ** 2 + (z - 0.5) ** 2
            T = T0 * (1.0 + 0.5 * jnp.exp(-r2 / 0.01))
            T = jnp.broadcast_to(T, shape)
            eint = eos.eint_from_tgas(1.0, T)
            U = jnp.zeros((layout.nvar, *shape))
            U = U.at[RHO].set(1.0)
            U = U.at[EGAS].set(eint)
            U = U.at[EINT].set(eint)
            U = U.at[layout.rad_index(0, 0)].set(A_RAD * T**4)
            return U

    def run(pallas):
        lines = [
            "geometry.prob_hi = 1.0 1.0 1.0",
            "amr.n_cell = 16 16 16",
            "amr.max_level = 1",
            "cfl = 0.3",
            "radiation.cfl = 0.3",
            "max_timesteps = 3",
            f"radiation.use_pallas = {pallas}",
            "verbose = 0",
        ]
        sim = AMRSimulation(RadPulse3D(),
                            ParmParse.from_string("\n".join(lines)))
        sim.set_initial_conditions()
        sim.evolve()
        return [np.asarray(u) for u in sim.level_U[: sim.finest_level + 1]]

    U_p = run(1)
    U_x = run(0)
    assert len(U_p) == len(U_x)
    for a, b in zip(U_p, U_x):
        scale = np.max(np.abs(b))
        np.testing.assert_allclose(a, b, atol=2e-5 * scale, rtol=2e-5)
