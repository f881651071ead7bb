"""Piecewise power-law (PPL) multigroup opacity models.

Validates the PPL machinery against closed-form integrals and checks that
the full source-term solve with PPL opacities (a) reduces to the
piecewise-constant result for a flat opacity spectrum and (b) preserves
gas-radiation equilibrium. Mirrors the reference's PPL code paths
(`OpacityModel::PPL_opacity_fixed_slope_spectrum` / `PPL_opacity_full_spectrum`,
``src/radiation/source_terms_multi_group.hpp:7-100``).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from quokka_tpu.radiation.opacity import (
    boundary_ratios,
    group_mean_opacity,
    planck_function,
    rad_quantity_exponents,
)


def test_group_mean_opacity_matches_quadrature():
    """kappa_g from the closed form == numerical quadrature of the
    piecewise power-law integrand."""
    nu_L, nu_R = 2.0, 7.0
    kappa0, alpha_k = 3.0, 1.7
    for alpha_q in (-2.3, -1.0, 0.0, 0.9):
        nu = np.linspace(nu_L, nu_R, 200001)
        q = nu**alpha_q
        k = kappa0 * (nu / nu_L) ** alpha_k
        expected = np.trapezoid(q * k, nu) / np.trapezoid(q, nu)
        got = group_mean_opacity(
            jnp.asarray([alpha_k]), jnp.asarray([kappa0]),
            jnp.asarray([nu_R / nu_L]), jnp.asarray([alpha_q]),
        )
        np.testing.assert_allclose(float(got[0]), expected, rtol=1e-6)


def test_rad_quantity_exponents_recover_power_law():
    """Group-integrated samples of q(nu) = nu^p give interior exponents ~ p."""
    p = -1.7
    edges = [1.0, 2.0, 4.0, 8.0, 16.0, 32.0]
    quant = []
    for g in range(len(edges) - 1):
        nu = np.linspace(edges[g], edges[g + 1], 20001)
        quant.append(np.trapezoid(nu**p, nu))
    exps = np.asarray(rad_quantity_exponents(jnp.asarray(quant)[:, None, None, None],
                                             edges))[:, 0, 0, 0]
    # edge bins are fixed at -1; interior bins recover the slope
    assert exps[0] == -1.0 and exps[-1] == -1.0
    np.testing.assert_allclose(exps[1:-1], p, atol=0.05)


def test_planck_function_integrates_to_aT4():
    """integral of 4 pi B(nu)/c over nu = a T^4."""
    T = 2.0
    kB, arad = 1.0, 1.0
    nu = np.linspace(1e-3, 60.0 * T, 400001)
    B = np.asarray(planck_function(jnp.asarray(nu), T, kB, arad))
    total = np.trapezoid(B, nu)
    np.testing.assert_allclose(total, arad * T**4, rtol=1e-3)


def _coupling_setup(opacity_model):
    from quokka_tpu.eos import IdealGasEOS
    from quokka_tpu.radiation.multigroup import add_source_terms_multi_group
    from quokka_tpu.radiation.system import RadOptions
    from quokka_tpu.registry import Problem, PhysicsTraits, EOSTraits, RadTraits

    G = 4
    edges = (0.1, 1.0, 3.0, 10.0, 100.0)

    class P(Problem):
        name = f"PPLTest_{opacity_model}"
        physics = PhysicsTraits(hydro_enabled=True, radiation_enabled=True,
                                n_groups=G)
        eos_traits = EOSTraits(gamma=5.0 / 3.0, mean_molecular_weight=1.0,
                               boltzmann_constant=1.0)
        rad = RadTraits(c_light=1e3, c_hat=1e2, radiation_constant=1.0,
                        Erad_floor=1e-14, beta_order=1, group_edges=edges)

        def compute_group_opacities(self, boundaries, rho, T):
            return 10.0 * jnp.ones((G, *rho.shape), rho.dtype)

        def define_opacity_exponents_and_lower_values(self, boundaries, rho, T):
            # flat opacity spectrum: alpha = 0, kappa = 10 everywhere
            k = 10.0 * jnp.ones((G, *rho.shape), rho.dtype)
            return jnp.zeros_like(k), k

    prob = P()
    eos = IdealGasEOS(gamma=5.0 / 3.0, mean_molecular_weight=1.0,
                      boltzmann_constant=1.0)
    opts = RadOptions(c=1e3, chat=1e2, arad=1.0, erad_floor=1e-14,
                      beta_order=1, n_groups=G, opacity_model=opacity_model)

    from quokka_tpu.radiation.planck import planck_energy_fractions

    shape = (4, 4, 4)
    T0 = 1.0
    rho0 = 1.0
    eint = float(eos.eint_from_tgas(jnp.asarray(rho0), jnp.asarray(T0)))
    fr = np.asarray(planck_energy_fractions(edges, jnp.full(shape, T0), 1.0, 1.0))
    nvar = 7 + 4 * G
    U = np.zeros((nvar, *shape))
    U[0] = rho0
    U[4] = eint
    U[5] = eint
    for g in range(G):
        U[7 + 4 * g] = fr[g] * T0**4  # a T^4 B_g fractions: equilibrium
    return prob, eos, opts, jnp.asarray(U), edges


@pytest.mark.parametrize("model", ["ppl_fixed_slope", "ppl_full_spectrum"])
def test_ppl_flat_spectrum_reduces_to_piecewise_constant(model):
    """With a flat (alpha=0) opacity spectrum, the PPL group means equal the
    piecewise-constant opacities, so the coupled update must agree."""
    from quokka_tpu.radiation.multigroup import add_source_terms_multi_group
    import dataclasses

    prob, eos, opts, U, edges = _coupling_setup(model)
    # knock the gas out of equilibrium so the solve does real work
    U = U.at[4].mul(1.3).at[5].mul(1.3)
    rad_src = jnp.zeros((opts.n_groups, *U.shape[1:]))
    dt = 1e-3

    out_ppl, _ = add_source_terms_multi_group(
        U, rad_src, dt, 1, opts, eos, prob, 7, edges, 1.0)
    opts_pc = dataclasses.replace(opts, opacity_model="piecewise_constant")
    out_pc, _ = add_source_terms_multi_group(
        U, rad_src, dt, 1, opts_pc, eos, prob, 7, edges, 1.0)

    np.testing.assert_allclose(np.asarray(out_ppl), np.asarray(out_pc),
                               rtol=2e-5, atol=1e-12)


@pytest.mark.parametrize("model", ["ppl_fixed_slope", "ppl_full_spectrum"])
def test_ppl_equilibrium_preserved(model):
    """A gas-radiation equilibrium state stays in equilibrium under the PPL
    coupled solve (emission balances absorption group by group)."""
    from quokka_tpu.radiation.multigroup import add_source_terms_multi_group

    prob, eos, opts, U, edges = _coupling_setup(model)
    rad_src = jnp.zeros((opts.n_groups, *U.shape[1:]))
    out, _ = add_source_terms_multi_group(
        U, rad_src, 1e-3, 1, opts, eos, prob, 7, edges, 1.0)
    out = np.asarray(out)
    U0 = np.asarray(U)
    assert np.all(np.isfinite(out))
    np.testing.assert_allclose(out[4], U0[4], rtol=1e-6)
    for g in range(opts.n_groups):
        np.testing.assert_allclose(out[7 + 4 * g], U0[7 + 4 * g], rtol=1e-5)
