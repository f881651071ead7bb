"""Advecting radiation pulse: frame invariance of the diffusing pulse
(reference RadhydroPulse, 0.6% composite criterion over the full 2-width
advection; here a shortened advection keeps the CPU cost bounded while
exercising the same O(beta tau) work terms)."""

import numpy as np
import pytest

from quokka_tpu import ParmParse, Simulation
from quokka_tpu.problems.radhydro_pulse import (
    A_RAD, RadhydroPulseProblem, V0_ADV, WIDTH,
)


def _run(v0, stop):
    pp = ParmParse.from_string(f"""
geometry.prob_lo = -512.0 0.0 0.0
geometry.prob_hi = 512.0 1.0 1.0
amr.n_cell = 64 1 1
cfl = 0.8
radiation.cfl = 0.8
stop_time = {stop}
max_timesteps = 100000
verbose = 0
""")
    prob = RadhydroPulseProblem()
    prob.v0 = v0
    sim = Simulation(prob, pp)
    sim.set_initial_conditions()
    sim.evolve()
    U = np.asarray(sim.U)
    rs = sim._radiation.rad_start
    Trad = (U[rs][:, 0, 0] / A_RAD) ** 0.25
    rho = U[0][:, 0, 0]
    eos = sim.eos
    import jax.numpy as jnp

    Tgas = np.asarray(eos.tgas_from_eint(jnp.asarray(rho), jnp.asarray(U[5][:, 0, 0])))
    return sim, Trad, Tgas


@pytest.mark.slow
def test_pulse_frame_invariance():
    t_end = 6.0e-6  # v0 t = 6 cm = width/4 of advection
    sim_s, Trad_s, Tgas_s = _run(0.0, t_end)
    sim_a, Trad_a, Tgas_a = _run(V0_ADV, t_end)

    x = np.asarray(sim_s.grid.cell_centers(0))
    dx = x[1] - x[0]
    shift = V0_ADV * sim_a.t / dx
    # shift the advected profile back (periodic, spectral shift would be
    # overkill at this tolerance: linear interp)
    idx = (np.arange(len(x)) + shift) % len(x)
    lo = np.floor(idx).astype(int) % len(x)
    hi = (lo + 1) % len(x)
    w = idx - np.floor(idx)
    Trad_a_shifted = (1 - w) * Trad_a[lo] + w * Trad_a[hi]
    Tgas_a_shifted = (1 - w) * Tgas_a[lo] + w * Tgas_a[hi]

    err = (np.sum(np.abs(Tgas_s - Trad_s))
           + np.sum(np.abs(Trad_a_shifted - Trad_s))
           + np.sum(np.abs(Tgas_a_shifted - Trad_s)))
    sol = 3.0 * np.sum(np.abs(Trad_s))
    rel = err / sol
    assert rel < 0.006, rel
