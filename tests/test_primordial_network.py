"""Full 12-species primordial chemistry network.

Validation strategy (the reference burns the external Microphysics
`primordial_chem` VODE network; the rates here are the published fits --
AAZN97 ionization, Hui & Gnedin / Cen recombination, Galli & Palla H2/HD,
Savin deuterium charge exchange):

  1. exact conservation of H/D/He nuclei and charge by the RHS,
  2. coronal ionization equilibrium of H and He against the closed-form
     rate balance,
  3. H2 formation in cold dense gas via the H- channel,
  4. stiff-burn positivity and stability over large dt.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from quokka_tpu.microphysics.chemistry import (
    PrimordialNetwork,
    backward_euler_newton,
)

NET = PrimordialNetwork()


def _state(nH_tot=1.0, x_ion=0.5, fD=2.6e-5, fHe=0.0789, T=1e4):
    """Number densities with H split into H/H+ by x_ion."""
    y = np.zeros(12)
    y[1] = nH_tot * (1 - x_ion)  # H
    y[2] = nH_tot * x_ion        # H+
    y[6] = fD * nH_tot * (1 - x_ion)
    y[7] = fD * nH_tot * x_ion
    y[9] = fHe * nH_tot
    y[0] = y[2] + y[7]           # e-
    return jnp.asarray(y)


def test_rhs_conserves_nuclei_and_charge():
    rng = np.random.default_rng(0)
    for _ in range(5):
        y = jnp.asarray(rng.random(12) * [1e-3, 1, 1e-1, 1e-8, 1e-2, 1e-9,
                                          1e-4, 1e-5, 1e-6, 1e-1, 1e-2, 1e-3])
        for T in (3e2, 1e4, 3e5):
            dy = np.asarray(NET.rhs(y, jnp.asarray(T)))
            # apply the same linear combinations to the derivative
            d = NET.conserved_totals(jnp.asarray(dy)[None, :].T.reshape(1, 12))
            dH, dD, dHe, dq = (float(v[0]) for v in d)
            scale = float(np.abs(dy).max()) + 1e-300
            assert abs(dH) < 1e-10 * scale
            assert abs(dD) < 1e-10 * scale
            assert abs(dHe) < 1e-10 * scale
            assert abs(dq) < 1e-10 * scale


def test_hydrogen_coronal_equilibrium():
    """Burn to equilibrium at fixed T: n_H+/n_H -> k_ion/k_rec."""
    T = jnp.asarray(2.0e4)
    y0 = _state(nH_tot=1.0, x_ion=0.5, fD=0.0, fHe=0.0, T=float(T))
    # long burn (recombination time ~ 1/(alpha n_e) ~ 1e13 s)
    y = y0
    for _ in range(8):
        y = backward_euler_newton(lambda yy, TT: NET.rhs(yy, TT), y[None, :],
                                  1.0e14, params=T, n_subcycles=16)[0]
    k = NET.rates(T)
    ratio_eq = float(k["H_ion"] / k["H_rec"])
    got = float(y[2] / y[1])
    np.testing.assert_allclose(got, ratio_eq, rtol=0.05)


def test_h2_formation_cold_gas():
    """Cold dense slightly-ionized gas forms H2 through the H- channel."""
    T = jnp.asarray(300.0)
    y0 = _state(nH_tot=1.0e4, x_ion=1.0e-4, fD=0.0, fHe=0.0)
    y = backward_euler_newton(lambda yy, TT: NET.rhs(yy, TT), y0[None, :],
                              1.0e13, params=T, n_subcycles=32)[0]
    y = np.asarray(y)
    assert np.all(np.isfinite(y))
    assert np.all(y >= 0.0)
    assert y[4] > 1e-6 * 1e4  # H2 fraction > 1e-6
    # nuclei conserved through the burn
    nucH0 = float(NET.conserved_totals(y0[None, :])[0][0])
    nucH1 = float(NET.conserved_totals(jnp.asarray(y)[None, :])[0][0])
    np.testing.assert_allclose(nucH1, nucH0, rtol=1e-6)


def test_helium_ionization_states():
    """At T = 1e5 K helium is mostly He+/He++; at 1e4 K mostly neutral."""
    for T_val, check in ((1.0e4, "neutral"), (2.0e5, "ionized")):
        T = jnp.asarray(T_val)
        y0 = _state(nH_tot=1.0, x_ion=0.9, fD=0.0, fHe=0.1)
        y = y0
        for _ in range(8):
            y = backward_euler_newton(lambda yy, TT: NET.rhs(yy, TT),
                                      y[None, :], 1.0e15, params=T,
                                      n_subcycles=16)[0]
        y = np.asarray(y)
        he_neutral = y[9] / (y[9] + y[10] + y[11])
        if check == "neutral":
            assert he_neutral > 0.9, he_neutral
        else:
            assert he_neutral < 0.1, he_neutral
