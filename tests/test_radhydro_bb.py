"""RadhydroBB: blackbody spectrum formation in a moving gas.

Reference ``src/problems/RadhydroBB/test_radhydro_bb.cpp`` ("model 3"):
gas at T0 = 1 moving at 1e-3 c with zero initial radiation must
thermalize (tau/cell ~ 1e5 -- asymptotic-preserving stress test) to
T_eq = 0.768032502191 with a Planck group spectrum, and the reference
accepts rel-L1 < 0.1 on both the spectrum and T_gas.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from quokka_tpu import ParmParse, Simulation
from quokka_tpu.indices import EGAS, EINT, MX1, RHO
from quokka_tpu.problems.radhydro_bb import (
    A_RAD,
    C_CODE,
    GROUP_EDGES,
    N_GROUPS,
    RHO0,
    T_EQUILIBRIUM,
    V0,
    RadhydroBBProblem,
)
from quokka_tpu.radiation.planck import planck_energy_fractions

CFG = f"""
geometry.prob_lo = 0.0 0.0 0.0
geometry.prob_hi = 64.0 1.0 1.0
amr.n_cell = 32 1 1
cfl = 0.8
radiation.cfl = 8.0
radiation.opacity_model = piecewise_constant
radiation.reconstruction_order = 3
max_dt = 1.0
stop_time = {10.0 / (1e-2 * C_CODE)}
max_timesteps = 100000
verbose = 0
"""


@pytest.mark.slow
def test_bb_thermalization():
    prob = RadhydroBBProblem()
    sim = Simulation(prob, ParmParse.from_string(CFG))
    sim.set_initial_conditions()
    sim.evolve()

    U = np.asarray(sim.U)
    assert np.all(np.isfinite(U))
    layout = sim.layout
    eos = sim.eos

    ke = 0.5 * U[MX1] ** 2 / U[RHO]
    Tgas = np.asarray(eos.tgas_from_eint(U[RHO], U[EGAS] - ke))
    # gas thermalized to the equilibrium temperature (ref tol 0.1; the
    # conservation argument pins it much tighter)
    np.testing.assert_allclose(Tgas, T_EQUILIBRIUM, rtol=0.02)

    # group spectrum ~ Planck at T_eq (reference tol 0.1 rel-L1)
    Eg = np.asarray([U[layout.rad_index(g, 0)].mean() for g in range(N_GROUPS)])
    fr = np.asarray(planck_energy_fractions(
        GROUP_EDGES, jnp.asarray(T_EQUILIBRIUM), 1.0, 1.0))
    Eg_exact = fr * A_RAD * T_EQUILIBRIUM**4
    rel_l1 = np.abs(Eg - Eg_exact).sum() / Eg_exact.sum()
    assert rel_l1 < 0.1

    # the gas keeps advecting: velocity drop from radiation drag is a
    # small relativistic correction, not an O(1) loss
    v = U[MX1] / U[RHO]
    np.testing.assert_allclose(v, V0, rtol=0.05)
