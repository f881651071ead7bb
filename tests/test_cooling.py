"""Microphysics: adaptive RK12 ODE integrator + Strang-split cooling.

Mirrors the reference's ODEIntegration and Cooling tests (SURVEY.md §4):
the integrator must reproduce an analytic cooling solution, and the
Strang-split source must drive a uniform box to the expected temperature.
"""

import jax.numpy as jnp
import numpy as np

from quokka_tpu import ParmParse, Simulation
from quokka_tpu.eos import IdealGasEOS, K_BOLTZMANN_CGS, M_U_CGS
from quokka_tpu.indices import EGAS, RHO
from quokka_tpu.microphysics.cooling import CoolingTable, strang_cooling_step
from quokka_tpu.microphysics.ode import rk_adaptive_integrate
from quokka_tpu.registry import EOSTraits, PhysicsTraits, Problem


def test_rk12_exponential_decay():
    """y' = -y/tau has exact solution y0 exp(-t/tau)."""
    tau = 2.0
    y0 = jnp.full((8, 8), 5.0)
    y1, ok = rk_adaptive_integrate(lambda y, p: -y / tau, y0, 0.0, 3.0, rtol=1e-6)
    assert bool(jnp.all(ok))
    exact = 5.0 * np.exp(-3.0 / tau)
    np.testing.assert_allclose(np.asarray(y1), exact, rtol=1e-5)


def test_rk12_stiff_relaxation():
    """y' = (a - y)/eps relaxes to a; adaptive stepping must handle
    eps << integration interval."""
    a, eps = 7.0, 1e-4
    y0 = jnp.array([0.0, 100.0])
    y1, ok = rk_adaptive_integrate(lambda y, p: (a - y) / eps, y0, 0.0, 1.0, rtol=1e-6, max_steps=20000)
    assert bool(jnp.all(ok))
    np.testing.assert_allclose(np.asarray(y1), a, rtol=1e-4)


def _power_law_table():
    """Lambda(T) = 1e-22 * (T/1e4 K) erg cm^3/s (linear in T) -- gives an
    analytically solvable exponential approach to the floor."""
    logT = np.linspace(1.0, 9.0, 50)
    logL = -22.0 + (logT - 4.0)
    return CoolingTable(tuple(logT), tuple(logL))


def test_strang_cooling_analytic():
    """With Lambda ~ T and ideal gas, e' = -C e, so T decays exponentially."""
    eos = IdealGasEOS(gamma=5.0 / 3.0)
    table = _power_law_table()
    rho = 1.0e-24  # g/cm^3 -> n_H = 0.6/cm^3-ish with mu = m_u
    T0 = 1.0e6

    shape = (4, 4, 4)
    eint0 = float(eos.eint_from_tgas(rho, T0))
    U = jnp.zeros((6, *shape))
    U = U.at[RHO].set(rho).at[EGAS].set(eint0).at[5].set(eint0)

    # analytic: de/dt = -Lam0/1e4 * T(e) * nH^2, T = e/(rho c_v)
    c_v = K_BOLTZMANN_CGS / (M_U_CGS * (eos.gamma - 1.0))
    n_H = rho / M_U_CGS
    C = 1.0e-22 / 1.0e4 / (rho * c_v) * n_H * n_H
    dt = 0.1 / C  # a fraction of the cooling time

    U1, ok = strang_cooling_step(U, dt, eos, table, T_floor=2.73)
    assert bool(ok)
    eint1 = float(U1[EGAS][0, 0, 0])
    exact = eint0 * np.exp(-C * dt)
    np.testing.assert_allclose(eint1, exact, rtol=1e-3)


from quokka_tpu.problems.infrastructure import (
    CoolingProblem as CoolingBox,
)


def test_cooling_in_evolve_loop():
    """End-to-end: uniform box cools through the Strang-split source."""
    eos = CoolingBox.eos_traits.make_eos()
    c_v = K_BOLTZMANN_CGS / (M_U_CGS * (eos.gamma - 1.0))
    n_H = CoolingBox.rho0 / M_U_CGS
    C = 1.0e-22 / 1.0e4 / (CoolingBox.rho0 * c_v) * n_H * n_H
    t_end = 0.5 / C

    pp = ParmParse.from_string(
        f"""
        geometry.prob_hi = 3.0e18 3.0e18 3.0e18
        amr.n_cell = 8 8 8
        cooling.enabled = 1
        constant_dt = {t_end/20:.6e}
        stop_time = {t_end:.6e}
        max_timesteps = 50
        verbose = 0
        """
    )
    sim = Simulation(CoolingBox(), pp)
    sim.set_initial_conditions()
    sim.evolve()
    eint_final = float(sim.U[EGAS][0, 0, 0])
    eint0 = float(eos.eint_from_tgas(CoolingBox.rho0, CoolingBox.T0))
    exact = eint0 * np.exp(-C * t_end)
    np.testing.assert_allclose(eint_final, exact, rtol=5e-3)
