"""Multigroup dust + line-cooling variants (RadDustMG / RadLineCoolingMG).

References:
- ``src/problems/RadDustMG/test_rad_dust_MG.cpp`` (+ tests/RadDust.in):
  4-group dust relaxation with a MODIFIED blackbody B = a T x fractions,
  compared to the exact slow-manifold ODE at rel-L1 tolerance 8e-4 on the
  (T_gas, T_rad) trajectories.
- ``src/problems/RadLineCoolingMG/test_rad_line_cooling_MG.cpp``: 4-group
  line cooling into group 0 + cosmic-ray + photoelectric heating from the
  FUV group, closed-form exact, tolerance 5e-4.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from quokka_tpu import ParmParse, Simulation
from quokka_tpu.indices import EGAS, RHO


def test_rad_dust_mg_relaxation():
    from quokka_tpu.problems.rad_dust import DMG_ARAD, DMG_CV, RadDustMGProblem

    pp = ParmParse.from_string("""
geometry.prob_lo = 0.0 0.0 0.0
geometry.prob_hi = 1.0 1.0 1.0
amr.n_cell = 4 1 1
constant_dt = 1.0e-8
stop_time = 1.0e-5
radiation.cfl = 8.0
radiation.opacity_model = ppl_fixed_slope
max_timesteps = 100000
verbose = 0
""")
    prob = RadDustMGProblem()
    sim = Simulation(prob, pp)
    sim.set_initial_conditions()

    rad = sim._radiation
    U = sim.U
    dt, chunk = 1.0e-8, 50
    layout = sim.layout
    ts, Tgas_n, Trad_n = [], [], []
    for i in range(20):  # 1000 steps total
        U = rad.run_steps(U, i * chunk * dt, dt, chunk)
        t = (i + 1) * chunk * dt
        Egas = float(U[EGAS][0, 0, 0])
        Er = sum(float(U[layout.rad_index(g, 0)][0, 0, 0]) for g in range(4))
        ts.append(t)
        Tgas_n.append(Egas / DMG_CV)
        Trad_n.append(Er / DMG_ARAD)
    sim.U = U

    Tgas_e, Trad_e = prob.exact_trajectory(ts)
    err = (np.abs(np.array(Tgas_n) - Tgas_e).sum()
           + np.abs(np.array(Trad_n) - Trad_e).sum())
    sol = np.abs(Tgas_e).sum() + np.abs(Trad_e).sum()
    rel = err / sol
    # reference tolerance (test_rad_dust_MG.cpp:237)
    assert rel < 8e-4, rel

    # the group spectrum follows the modified blackbody of T_d ~ T_rad
    from quokka_tpu.radiation.planck import planck_energy_fractions

    Eg = np.array([float(U[layout.rad_index(g, 0)][0, 0, 0]) for g in range(4)])
    fr = np.asarray(planck_energy_fractions(
        prob.rad.group_edges, jnp.asarray(Trad_n[-1]), 1.0, 1.0))
    np.testing.assert_allclose(Eg / Eg.sum(), fr, atol=0.02)


def test_rad_line_cooling_mg():
    from quokka_tpu.problems.rad_line_cooling import (
        RHO0,
        RadLineCoolingMGProblem,
    )

    pp = ParmParse.from_string("""
geometry.prob_lo = 0.0 0.0 0.0
geometry.prob_hi = 1.0 1.0 1.0
amr.n_cell = 4 1 1
constant_dt = 0.01
stop_time = 10.0
max_timesteps = 10000
verbose = 0
""")
    prob = RadLineCoolingMGProblem()
    sim = Simulation(prob, pp)
    sim.set_initial_conditions()
    sim.evolve()

    U = np.asarray(sim.U)
    layout = sim.layout
    eos = sim.eos
    Tgas = float(eos.tgas_from_eint(RHO0, U[EGAS][0, 0, 0]))
    Erad_line = float(U[layout.rad_index(0, 0)][0, 0, 0])
    Erad_fuv = float(U[layout.rad_index(3, 0)][0, 0, 0])

    Tgas_e, Erad_line_e = prob.exact_trajectory(sim.t)
    # reference tolerance 5e-4 on the trajectory; endpoint check here
    assert Tgas == pytest.approx(float(Tgas_e), rel=2e-3)
    assert Erad_line == pytest.approx(float(Erad_line_e), rel=2e-3)
    # the FUV group is not consumed by PE in this transparent setup
    # (heating draws at the constant initial rate, reference Erad_FUV = 1)
    assert Erad_fuv == pytest.approx(1.0, rel=0.05)


def test_rad_dust_single_group_relaxation():
    """Single-group dust coupling (reference RadDust,
    ``test_rad_dust.cpp``): same relaxation trajectory through the G=1
    dust solver with linearized emission B = a_rad T_d; rel-L1 8e-4."""
    from quokka_tpu.problems.rad_dust import DMG_ARAD, DMG_CV, RadDustProblem

    pp = ParmParse.from_string("""
geometry.prob_lo = 0.0 0.0 0.0
geometry.prob_hi = 1.0 1.0 1.0
amr.n_cell = 4 1 1
constant_dt = 1.0e-8
stop_time = 1.0e-5
radiation.cfl = 8.0
max_timesteps = 100000
verbose = 0
""")
    prob = RadDustProblem()
    sim = Simulation(prob, pp)
    sim.set_initial_conditions()

    rad = sim._radiation
    U = sim.U
    dt, chunk = 1.0e-8, 50
    layout = sim.layout
    ts, Tgas_n, Trad_n = [], [], []
    for i in range(20):  # 1000 steps total
        U = rad.run_steps(U, i * chunk * dt, dt, chunk)
        t = (i + 1) * chunk * dt
        Egas = float(U[EGAS][0, 0, 0])
        Er = float(U[layout.rad_index(0, 0)][0, 0, 0])
        ts.append(t)
        Tgas_n.append(Egas / DMG_CV)
        Trad_n.append(Er / DMG_ARAD)
    sim.U = U

    Tgas_e, Trad_e = prob.exact_trajectory(ts)
    err = (np.abs(np.array(Tgas_n) - Tgas_e).sum()
           + np.abs(np.array(Trad_n) - Trad_e).sum())
    sol = np.abs(Tgas_e).sum() + np.abs(Trad_e).sum()
    rel = err / sol
    # reference tolerance (test_rad_dust.cpp:216)
    assert rel < 8e-4, rel
