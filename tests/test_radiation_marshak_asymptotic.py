"""Asymptotic-diffusion Marshak wave with the Skinner-Ostriker wavespeed
correction: T_mat must track the self-similar solution within the
reference's 9% L1 tolerance at t = 10 ns
(``src/problems/RadMarshakAsymptotic``, tests/MarshakAsymptoticCorr.in)."""

import numpy as np
import pytest

from quokka_tpu import ParmParse, Simulation
from quokka_tpu.problems.rad_marshak_asymptotic import (
    RHO0, RadMarshakAsymptoticProblem, T_HOHLRAUM,
)


def _run(correction):
    pp = ParmParse.from_string(f"""
geometry.prob_lo = 0.0 0.0 0.0
geometry.prob_hi = 0.66 1.0 1.0
amr.n_cell = 60 1 1
radiation.cfl = 0.8
radiation.wavespeed_correction = {int(correction)}
stop_time = 10.0e-9
max_timesteps = 200000
verbose = 0
""")
    prob = RadMarshakAsymptoticProblem()
    sim = Simulation(prob, pp)
    sim.set_initial_conditions()
    sim.evolve()
    U = np.asarray(sim.U)
    x = np.asarray(sim.grid.cell_centers(0))
    rho = U[0][:, 0, 0]
    import jax.numpy as jnp

    Tmat = np.asarray(sim.eos.tgas_from_eint(
        jnp.asarray(rho), jnp.asarray(U[5][:, 0, 0]))) / T_HOHLRAUM
    T_exact = RadMarshakAsymptoticProblem.exact_Tmat(x)
    # L1 over the wave region (x within the tabulated range)
    m = x < 0.1474
    err = np.sum(np.abs(Tmat[m] - T_exact[m])) / np.sum(np.abs(T_exact[m]))
    return err, np.all(np.isfinite(U))


@pytest.mark.slow
def test_asymptotic_marshak_with_correction():
    err, finite = _run(correction=True)
    assert finite
    assert err < 0.09, err
