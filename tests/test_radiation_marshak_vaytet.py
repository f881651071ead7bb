"""Vaytet et al. multigroup Marshak wave (frequency-dependent opacity).

Reference ``src/problems/RadMarshakVaytet/test_radiation_marshak_Vaytet.cpp``
(benchmark; its offline comparison targets Vaytet's published profiles).
Physics asserted here: the wave heats the near-wall gas toward T_L, the
far field stays at T_initial, the temperature profile is monotone, and
the near-wall radiation spectrum approaches the Planck fractions of T_L.
"""

import jax.numpy as jnp
import numpy as np

from quokka_tpu import ParmParse, Simulation
from quokka_tpu.eos import A_RAD_CGS, K_BOLTZMANN_CGS
from quokka_tpu.problems.rad_marshak_vaytet import (
    GROUP_EDGES_HZ,
    H_PLANCK,
    N_GROUPS,
    RHO0,
    T_INITIAL,
    T_L,
    RadMarshakVaytetProblem,
)
from quokka_tpu.radiation.planck import planck_energy_fractions

CFG = """
geometry.prob_lo = 0.0 0.0 0.0
geometry.prob_hi = 20.0 1.0 1.0
amr.n_cell = 64 1 1
cfl = 0.8
radiation.cfl = 0.8
radiation.opacity_model = ppl_full_spectrum
max_dt = 1.0
stop_time = 1.36e-7
max_timesteps = 1000000
verbose = 0
"""


def test_vaytet_marshak_wave():
    prob = RadMarshakVaytetProblem()
    sim = Simulation(prob, ParmParse.from_string(CFG))
    sim.set_initial_conditions()
    sim.evolve()

    U = np.asarray(sim.U)
    assert np.all(np.isfinite(U))
    layout = prob.physics.layout()
    eos = sim.eos

    Tgas = np.asarray(eos.tgas_from_eint(U[0], U[4]))[:, 0, 0]
    # near-wall gas heated strongly toward T_L; far field still cold
    assert Tgas[0] > 0.55 * T_L
    assert abs(Tgas[-1] - T_INITIAL) < 0.05 * T_INITIAL
    # monotone decreasing front (no spurious oscillation > 1%)
    dT = np.diff(Tgas)
    assert np.all(dT < 0.01 * T_L)

    # near-wall spectrum ~ Planck fractions at the local temperature
    Eg = np.stack([U[layout.rad_index(g, 0)][0, 0, 0] for g in range(N_GROUPS)])
    fr_local = np.asarray(planck_energy_fractions(
        GROUP_EDGES_HZ, jnp.asarray(Tgas[0]), K_BOLTZMANN_CGS, H_PLANCK))
    frac = Eg / Eg.sum()
    # the dominant groups at ~1000 K (g=2,3) must dominate the local spectrum
    assert frac[2] + frac[3] > 0.9
    assert abs(frac[3] - fr_local[3]) < 0.25
    # all groups positive
    assert np.all(Eg > 0)
