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


@pytest.mark.slow
def test_pulse_mg_const_matches_grey():
    """4 groups with identical constant opacity reproduce the grey pulse
    (reference RadhydroPulseMGconst)."""
    from quokka_tpu.problems.radhydro_pulse import RadhydroPulseMGconstProblem

    t_end = 6.0e-6
    _sim_g, Trad_g, Tgas_g = _run(0.0, t_end)

    pp = ParmParse.from_string(f"""
geometry.prob_lo = -512.0 0.0 0.0
geometry.prob_hi = 512.0 1.0 1.0
amr.n_cell = 64 1 1
cfl = 0.8
radiation.cfl = 0.8
radiation.opacity_model = piecewise_constant
stop_time = {t_end}
max_timesteps = 100000
verbose = 0
""")
    prob = RadhydroPulseMGconstProblem()
    sim = Simulation(prob, pp)
    sim.set_initial_conditions()
    sim.evolve()
    U = np.asarray(sim.U)
    layout = sim.layout
    Erad_tot = sum(U[layout.rad_index(g, 0)][:, 0, 0] for g in range(4))
    Trad_mg = (Erad_tot / A_RAD) ** 0.25

    rel = np.abs(Trad_mg - Trad_g).sum() / np.abs(Trad_g).sum()
    # group-resolved vs single-group Newton formulations agree to ~0.3%
    # (the reference's own grey-comparison tolerance class is 8e-3,
    # test_radhydro_pulse_grey.cpp:339)
    assert rel < 0.008, rel


@pytest.mark.slow
def test_pulse_mg_int_frame_invariance():
    """nu-and-T-dependent opacity, PPL fixed-slope integration (reference
    RadhydroPulseMGint): advected pulse shifted back matches the comoving
    one at the reference's 2% tolerance."""
    from quokka_tpu.problems.radhydro_pulse import (
        RadhydroPulseMGintProblem, V0_ADV,
    )

    def run_mg(v0, stop):
        pp = ParmParse.from_string(f"""
geometry.prob_lo = -512.0 0.0 0.0
geometry.prob_hi = 512.0 1.0 1.0
amr.n_cell = 64 1 1
cfl = 0.8
radiation.cfl = 0.8
radiation.opacity_model = ppl_fixed_slope
stop_time = {stop}
max_timesteps = 100000
verbose = 0
""")
        prob = RadhydroPulseMGintProblem()
        prob.v0 = v0
        sim = Simulation(prob, pp)
        sim.set_initial_conditions()
        sim.evolve()
        U = np.asarray(sim.U)
        layout = sim.layout
        Erad_tot = sum(U[layout.rad_index(g, 0)][:, 0, 0] for g in range(4))
        Trad = (Erad_tot / A_RAD) ** 0.25
        import jax.numpy as jnp

        Tgas = np.asarray(sim.eos.tgas_from_eint(
            jnp.asarray(U[0][:, 0, 0]), jnp.asarray(U[5][:, 0, 0])))
        return sim, Trad, Tgas

    t_end = 6.0e-6
    sim_s, Trad_s, Tgas_s = run_mg(0.0, t_end)
    sim_a, Trad_a, Tgas_a = run_mg(V0_ADV, t_end)

    x = np.asarray(sim_s.grid.cell_centers(0))
    dx = x[1] - x[0]
    shift = V0_ADV * sim_a.t / dx
    n = len(x)
    idx = (np.arange(n) + shift) % n
    lo = np.floor(idx).astype(int) % n
    hi = (lo + 1) % n
    w = idx - np.floor(idx)
    Tgas_a_sh = (1 - w) * Tgas_a[lo] + w * Tgas_a[hi]

    rel = np.abs(Tgas_a_sh - Tgas_s).sum() / np.abs(Tgas_s).sum()
    # reference tolerance (test_radhydro_pulse_MG_int.cpp:467)
    assert rel < 0.02, rel
    assert np.all(np.isfinite(Trad_a)) and np.all(Trad_a > 0)


@pytest.mark.slow
def test_pulse_dynamic_diffusion():
    """Dynamic-diffusion variant (reference RadhydroPulseDyn: kappa = 500,
    v0 = 3e7): the pulse is advected with the gas; frame invariance at a
    shortened horizon."""
    from quokka_tpu.problems.radhydro_pulse import (
        RadhydroPulseDynProblem, V0_DYN,
    )

    def run_dyn(v0, stop):
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
        prob = RadhydroPulseDynProblem()
        prob.v0 = v0
        sim = Simulation(prob, pp)
        sim.set_initial_conditions()
        sim.evolve()
        U = np.asarray(sim.U)
        rs = sim._radiation.rad_start
        Trad = (U[rs][:, 0, 0] / A_RAD) ** 0.25
        import jax.numpy as jnp

        Tgas = np.asarray(sim.eos.tgas_from_eint(
            jnp.asarray(U[0][:, 0, 0]), jnp.asarray(U[5][:, 0, 0])))
        return sim, Trad, Tgas

    t_end = 4.0e-7  # v0 t = 12 cm = width/2
    sim_s, Trad_s, Tgas_s = run_dyn(0.0, t_end)
    sim_a, Trad_a, Tgas_a = run_dyn(V0_DYN, t_end)

    x = np.asarray(sim_s.grid.cell_centers(0))
    dx = x[1] - x[0]
    shift = V0_DYN * sim_a.t / dx
    n = len(x)
    idx = (np.arange(n) + shift) % n
    lo = np.floor(idx).astype(int) % n
    hi = (lo + 1) % n
    w = idx - np.floor(idx)
    Tgas_a_sh = (1 - w) * Tgas_a[lo] + w * Tgas_a[hi]

    rel = np.abs(Tgas_a_sh - Tgas_s).sum() / np.abs(Tgas_s).sum()
    assert rel < 0.01, rel
