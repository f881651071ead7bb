"""Radiation pulse: asymptotic-preserving diffusion-limit test.

Reference pass criterion: rel. L1 error of T_gas vs the analytic Gaussian
diffusion solution < 0.01 at 32 cells, t = 1e-4
(``test_radiation_pulse.cpp:198``).
"""

import numpy as np

from quokka_tpu import ParmParse, Simulation
from quokka_tpu.indices import EGAS, RHO
from quokka_tpu.problems.rad_pulse import (
    CHAT,
    INITIAL_TIME,
    RHO0,
    RadPulseProblem,
    exact_Trad,
)


def test_rad_pulse_diffusion():
    nx = 32
    t_end = 1.0e-4
    pp = ParmParse.from_string(
        f"""
        geometry.prob_lo = 0. 0. 0.
        geometry.prob_hi = 1. 1. 1.
        amr.n_cell = {nx} 1 1
        stop_time = {t_end}
        max_timesteps = 100000
        verbose = 0
        """
    )
    prob = RadPulseProblem()
    sim = Simulation(prob, pp)
    sim.cfl = 0.8
    sim.set_initial_conditions()

    # run in device-side scan chunks (the per-substep dt is dx/chat-limited,
    # ~40k substeps total)
    dt = 0.8 * sim.grid.dx_min / CHAT
    n_total = int(np.ceil(t_end / dt))
    dt = t_end / n_total
    rad = sim._radiation
    U = sim.U
    chunk = 1000
    done = 0
    while done < n_total:
        n = min(chunk, n_total - done)
        U = rad.run_steps(U, done * dt, dt, n)
        done += n
    sim.U = U
    sim.t = t_end

    eos = sim.eos
    Egas = np.asarray(sim.U[EGAS][:, 0, 0])
    Tgas = np.asarray(eos.tgas_from_eint(RHO0, Egas))
    x = np.asarray(sim.grid.cell_centers(0)) - 0.5
    Texact = exact_Trad(x, t_end + INITIAL_TIME)

    rel_err = np.sum(np.abs(Tgas - Texact)) / np.sum(np.abs(Texact))
    print(f"rad pulse rel L1 err = {rel_err:.4f}")
    assert rel_err < 0.01
