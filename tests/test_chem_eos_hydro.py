"""Chemistry-coupled EOS in the HYDRO solve.

The reference routes every hydro EOS call through the chemistry EOS when
the network is on (``src/hydro/EOS.hpp:82-112``); round-2 confined the
mixture EOS to the Strang burn, leaving the hydro at fixed gamma = 5/3.
These tests pin the new coupling:

- a UNIFORM H2 composition must reproduce a fixed-gamma(=1.4) run exactly
  (the mixture gamma field is constant, so every kernel sees the same
  physics), while the gamma=5/3 trait run differs materially;
- a composition GRADIENT produces per-cell/per-face gammas (sound speed
  tracks composition);
- with `hydro.chem_eos = 0` (or chemistry off) the fixed-gamma path is
  selected at trace time, structurally unchanged.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from quokka_tpu.eos import IdealGasEOS
from quokka_tpu.hydro import advance as hydro_advance
from quokka_tpu.hydro import euler
from quokka_tpu.indices import EGAS, EINT, MX1, RHO, SCALAR0
from quokka_tpu.microphysics.chem_coupling import MixtureHydroEOS
from quokka_tpu.microphysics.chemistry import PrimordialNetwork

NET = PrimordialNetwork()
NSPEC = NET.n_species
IH2 = list(NET.species).index("H2")
IH = list(NET.species).index("H")


def _state(n, h2_frac):
    """Sod-like shock with species partial densities: h2_frac of the mass
    in H2, the rest in H (h2_frac may be a field)."""
    rng = np.random.default_rng(0)
    x = (np.arange(n) + 0.5) / n
    rho = np.where(x < 0.5, 1.0, 0.125)[:, None, None] * np.ones((n, n, n))
    P = np.where(x < 0.5, 1.0, 0.1)[:, None, None] * np.ones((n, n, n))
    U = np.zeros((6 + NSPEC, n, n, n))
    U[RHO] = rho
    f = np.broadcast_to(h2_frac, rho.shape)
    gamma_eff = mix_gamma_scalar(f)
    eint = P / (gamma_eff - 1.0)
    U[EGAS] = eint
    U[EINT] = eint
    U[SCALAR0 + IH2] = f * rho
    U[SCALAR0 + IH] = (1.0 - f) * rho
    return jnp.asarray(U, jnp.float64)


def mix_gamma_scalar(f_h2):
    """Exact two-species mixture gamma for H2 mass fraction f (H2 mass 2,
    H mass 1): gamma = 1 + n_tot / (n_H2/0.4 + n_H/(2/3))."""
    mH2 = NET.masses[IH2]
    mH = NET.masses[IH]
    n_h2 = np.asarray(f_h2) / mH2
    n_h = (1.0 - np.asarray(f_h2)) / mH
    ntot = n_h2 + n_h
    cv = n_h2 / (7.0 / 5.0 - 1.0) + n_h / (5.0 / 3.0 - 1.0)
    return 1.0 + ntot / cv


def _opts(n, eos):
    return hydro_advance.HydroOptions(
        dx=(1.0 / n,) * 3,
        eos=eos,
        active_axes=(0, 1, 2),
        reconstruction_order=3,
        n_scalars=NSPEC,
        n_mscalars=NSPEC,
        use_pallas=False,
        fuse_update=False,
    )


def _run_steps(U, opts, n_steps=4, dt=2e-3):
    ng = (4, 4, 4)
    periodic = (True, True, True)

    def fill(X):
        return jnp.pad(X, [(0, 0)] + [(4, 4)] * 3, mode="wrap")

    for _ in range(n_steps):
        U, _ = hydro_advance.advance_hydro_rk2(U, dt, opts, fill, ng, periodic)
    return U


def test_uniform_h2_matches_fixed_gamma():
    """Pure-H2 composition == fixed gamma(=1.4) run; and both differ
    materially from the gamma=5/3 trait run the old code used."""
    n = 16
    U0 = _state(n, 1.0)
    g_eff = float(mix_gamma_scalar(1.0))
    assert abs(g_eff - 1.4) < 1e-12

    mix_eos = MixtureHydroEOS(gamma=5.0 / 3.0, network=NET)
    U_mix = _run_steps(U0, _opts(n, mix_eos))
    U_fix = _run_steps(U0, _opts(n, IdealGasEOS(gamma=1.4)))
    U_wrong = _run_steps(U0, _opts(n, IdealGasEOS(gamma=5.0 / 3.0)))

    np.testing.assert_allclose(
        np.asarray(U_mix), np.asarray(U_fix), rtol=1e-12, atol=1e-14,
        err_msg="mixture EOS with uniform H2 must equal gamma=1.4",
    )
    # the old fixed-trait behavior is materially different physics
    dmax = float(jnp.max(jnp.abs(U_mix[RHO] - U_wrong[RHO])))
    assert dmax > 1e-3, f"gamma=5/3 run unexpectedly close ({dmax})"


def test_composition_gradient_sound_speed():
    """Per-cell gamma/sound speed track a composition gradient."""
    n = 16
    x = (np.arange(n) + 0.5) / n
    f = np.broadcast_to(x[:, None, None], (n, n, n))  # H2 fraction 0 -> 1
    U = np.zeros((6 + NSPEC, n, n, n))
    U[RHO] = 1.0
    U[EGAS] = U[EINT] = 1.0
    U[SCALAR0 + IH2] = f
    U[SCALAR0 + IH] = 1.0 - f
    U = jnp.asarray(U, jnp.float64)
    eos = MixtureHydroEOS(gamma=5.0 / 3.0, network=NET)

    sig = np.asarray(euler.max_signal_speed(U, eos))
    want_gamma = mix_gamma_scalar(f)
    want_cs = np.sqrt(want_gamma * (want_gamma - 1.0) * 1.0 / 1.0)
    np.testing.assert_allclose(sig, want_cs, rtol=1e-12)

    # pressure through the mixture
    P = np.asarray(euler.pressure(U, eos))
    np.testing.assert_allclose(P, want_gamma - 1.0, rtol=1e-12)


def test_fixed_gamma_dispatch_untouched():
    """Without gamma_of_scalars the kernels take the fixed-gamma branch:
    IdealGasEOS runs are unaffected by the dispatch plumbing."""
    n = 8
    U = _state(n, 0.0)
    eos = IdealGasEOS(gamma=1.4)
    assert euler.mixture_gamma(eos, U, SCALAR0) is None
    # MixtureHydroEOS without the species block present also falls back
    mix = MixtureHydroEOS(gamma=1.4, network=NET)
    assert euler.mixture_gamma(mix, U[:6], SCALAR0) is None
