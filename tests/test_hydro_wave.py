"""Linear sound-wave convergence (reference ``src/problems/HydroWave``):
a small-amplitude right-going sound wave returns to its initial state after
one period; the L1 error must converge at better than 2nd order as the
PPM truncation error dominates.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from quokka_tpu import ParmParse, Simulation
from quokka_tpu.indices import EGAS, EINT, MX1, RHO
from quokka_tpu.registry import EOSTraits, PhysicsTraits, Problem

GAMMA = 5.0 / 3.0
RHO0 = 1.0
P0 = 1.0 / GAMMA  # so cs = 1
AMP = 1.0e-6


from quokka_tpu.problems.infrastructure import (
    HydroWaveProblem as SoundWave,
)


def _wave_error(nx: int, cfl: float) -> float:
    """rms of component-wise L1 errors after one period (the reference's
    epsilon, ``test_hydro_wave.cpp:127-143``)."""
    pp = ParmParse.from_string(
        f"""
        geometry.prob_hi = 1.0 1.0 1.0
        amr.n_cell = {nx} 1 1
        cfl = {cfl}
        stop_time = 1.0
        max_timesteps = 5000
        hydro.use_flattening = 0
        verbose = 0
        """
    )
    sim = Simulation(SoundWave(), pp)
    sim.set_initial_conditions()
    U0 = np.asarray(sim.U)
    sim.evolve()
    U1 = np.asarray(sim.U)
    err_sq = 0.0
    for comp in [0, 1, 2, 3, 4]:  # skip the aux internal energy, as the ref does
        err_sq += np.abs(U1[comp] - U0[comp]).mean() ** 2
    return float(np.sqrt(err_sq))


def test_wave_amplitude_error():
    """Reference pass criterion: epsilon < 1e-8 at Nx=100, CFL=0.1
    (``test_hydro_wave.cpp:95,231``)."""
    eps = _wave_error(100, 0.1)
    print(f"wave epsilon = {eps:.3e}")
    assert eps < 1.0e-8


def test_wave_convergence():
    """Spatial convergence at low CFL (where PPM error dominates)."""
    e64 = _wave_error(64, 0.2)
    e128 = _wave_error(128, 0.2)
    order = np.log2(e64 / e128)
    print(f"L1(64)={e64:.3e} L1(128)={e128:.3e} order={order:.2f}")
    assert order > 1.5
