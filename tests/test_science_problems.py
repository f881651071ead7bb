"""Science problems: shock-cloud crushing and stochastic blast driving."""

import numpy as np
import pytest

from quokka_tpu import ParmParse, Simulation


@pytest.mark.slow
def test_shock_cloud_crushing():
    from quokka_tpu.problems.shock_cloud import (
        CHI, R_CLOUD, RHO_CLOUD, ShockCloudProblem, V_WIND,
    )

    t_cc = np.sqrt(CHI) * R_CLOUD / V_WIND
    pp = ParmParse.from_string(f"""
geometry.prob_hi = 1.0 0.6 0.6
amr.n_cell = 48 24 24
cfl = 0.3
stop_time = {0.5 * t_cc}
max_timesteps = 2000
verbose = 0
""")
    sim = Simulation(ShockCloudProblem(), pp)
    sim.set_initial_conditions()
    sim.evolve()
    U = np.asarray(sim.U)
    assert np.all(np.isfinite(U))
    assert np.all(U[0] > 0)
    # the shock has compressed the cloud edge above the initial maximum
    assert U[0].max() > 1.05 * RHO_CLOUD
    # wind momentum flows through (no spurious reflection at the inflow)
    assert U[1].max() > 0


def test_random_blast_driving():
    from quokka_tpu.problems.random_blast import RandomBlastProblem

    pp = ParmParse.from_string("""
geometry.prob_hi = 1.0 1.0 1.0
amr.n_cell = 32 32 32
cfl = 0.3
init_dt = 1e-3
stop_time = 0.2
max_timesteps = 200
verbose = 0
""")
    prob = RandomBlastProblem(seed=7)
    sim = Simulation(prob, pp)
    sim.set_initial_conditions()
    sim.evolve()
    U = np.asarray(sim.U)
    assert np.all(np.isfinite(U))
    assert prob.n_injected >= 1  # blasts actually fired
    # the box is stirred: kinetic energy present
    ke = 0.5 * (U[1:4] ** 2).sum(axis=0) / U[0]
    assert ke.sum() > 0.0
    assert U[0].max() / U[0].min() > 1.5  # density structure formed
