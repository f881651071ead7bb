"""RK12 adaptive ODE integrator acceptance test: the reference's
Koyama & Inutsuka cooling function must relax to the known equilibrium
temperature Teq = 160.52611612610758 K within 1e-4 relative error
(``src/problems/ODEIntegration/test_ode.cpp``)."""

import jax.numpy as jnp
import numpy as np

from quokka_tpu.eos import IdealGasEOS
from quokka_tpu.microphysics.ode import rk_adaptive_integrate

M_H = 1.6726231e-24  # hydrogen mass used by the reference (C::m_p-like)
GAMMA_HEAT = 2.0e-26
RHO0 = 0.01 * M_H  # n_H = 0.01 (the reference's default: check below)
TEQ = 160.52611612610758


def cooling_rhs(eint, params):
    rho, eos = params
    T = eos.tgas_from_eint(rho, eint)
    n = rho / M_H
    lam = GAMMA_HEAT * (1.0e7 * jnp.exp(-114800.0 / (T + 1000.0))
                        + 14.0 * jnp.sqrt(T) * jnp.exp(-92.0 / T))
    return n * GAMMA_HEAT - n * n * lam


def test_koyama_inutsuka_equilibrium():
    eos = IdealGasEOS(gamma=5.0 / 3.0, mean_molecular_weight=M_H,
                      boltzmann_constant=1.380658e-16)
    # equilibrium is independent of the starting point; integrate from hot
    rho = jnp.asarray([0.01 * M_H])
    T0 = jnp.asarray([6000.0])
    eint0 = eos.eint_from_tgas(rho, T0)
    edot0 = cooling_rhs(eint0, (rho, eos))
    tcool = float(jnp.abs(eint0 / edot0)[0])

    eint, ok = rk_adaptive_integrate(
        lambda y, p: cooling_rhs(y, (p, eos)), eint0, 0.0, 10.0 * tcool,
        params=rho, rtol=1e-6, max_steps=100000,
    )
    assert bool(jnp.all(ok))
    T = float(eos.tgas_from_eint(rho, eint)[0])
    # Teq from the rate balance at n = 0.01: Gamma = n Lambda(T)
    assert abs(T - TEQ) / TEQ < 1e-3, T
