"""Radiation-matter coupling: implicit Newton source solve vs exact solution.

Reference pass criterion: relative L1 error of T_gas(t) vs the Gonzalez et
al. 2007 asymptotic solution < 2e-5
(``test_radiation_matter_coupling.cpp:219-226``).
"""

import numpy as np
import pytest

from quokka_tpu import ParmParse, Simulation
from quokka_tpu.indices import EGAS, RHO
from quokka_tpu.problems.rad_matter_coupling import (
    RadMatterCouplingProblem,
)


def test_matter_coupling_exact():
    pp = ParmParse.from_string(
        """
        geometry.prob_lo = 0. 0. 0.
        geometry.prob_hi = 1e5 1e5 1e5
        amr.n_cell = 4 1 1
        constant_dt = 1.0e-8
        stop_time = 1.0e-2
        max_timesteps = 1000000
        verbose = 0
        """
    )
    prob = RadMatterCouplingProblem()
    sim = Simulation(prob, pp)
    sim.set_initial_conditions()

    eos = sim.eos
    t_hist, Tgas_hist = [], []

    # run in 100-step device-side scans, sampling T_gas at each chunk end
    # (the reference records per step via computeAfterTimestep; the physics
    # comparison only needs the sampled trajectory)
    dt = 1.0e-8
    chunk = 100
    n_chunks = int(round(sim.stop_time / (dt * chunk)))
    rad = sim._radiation
    U = sim.U
    for i in range(n_chunks):
        U = rad.run_steps(U, i * chunk * dt, dt, chunk)
        Egas = float(U[EGAS][0, 0, 0])
        Tgas_hist.append(float(eos.tgas_from_eint(np.nan, Egas)))
        t_hist.append((i + 1) * chunk * dt)
    sim.U = U

    t_hist = np.array(t_hist)
    Tgas_hist = np.array(Tgas_hist)
    Tgas_exact = prob.exact_Tgas(t_hist)

    rel_err = np.sum(np.abs(Tgas_hist - Tgas_exact)) / np.sum(np.abs(Tgas_exact))
    print(f"relative L1 error norm = {rel_err:.3e}")
    assert rel_err < 2e-5


def test_matter_coupling_rsla_exact():
    """RSLA variant (reference RadMatterCouplingRSLA): with chat = 0.1 c
    the trajectory follows the closed-form RSLA solution to rel-L1 5e-5
    (``test_radiation_matter_coupling_rsla.cpp:232-236``)."""
    from quokka_tpu.problems.rad_matter_coupling import (
        RadMatterCouplingRSLAProblem,
    )

    pp = ParmParse.from_string(
        """
        geometry.prob_lo = 0. 0. 0.
        geometry.prob_hi = 1e5 1e5 1e5
        amr.n_cell = 4 1 1
        constant_dt = 1.0e-8
        stop_time = 1.0e-2
        max_timesteps = 1000000
        verbose = 0
        """
    )
    prob = RadMatterCouplingRSLAProblem()
    sim = Simulation(prob, pp)
    sim.set_initial_conditions()

    eos = sim.eos
    dt = 1.0e-8
    chunk = 100
    n_chunks = int(round(sim.stop_time / (dt * chunk)))
    rad = sim._radiation
    U = sim.U
    t_hist, Tgas_hist = [], []
    for i in range(n_chunks):
        U = rad.run_steps(U, i * chunk * dt, dt, chunk)
        Egas = float(U[EGAS][0, 0, 0])
        Tgas_hist.append(float(eos.tgas_from_eint(np.nan, Egas)))
        t_hist.append((i + 1) * chunk * dt)
    sim.U = U

    Tgas_hist = np.array(Tgas_hist)
    Tgas_exact = prob.exact_Tgas_rsla(np.array(t_hist))
    rel_err = np.sum(np.abs(Tgas_hist - Tgas_exact)) / np.sum(np.abs(Tgas_exact))
    assert rel_err < 5e-5, rel_err


def test_matter_coupling_mixed_precision():
    """radiation.mixed_precision_coupling = 1: f32 state, f64 Newton solve
    (the TPU validation middle ground). The f32-state trajectory with the
    mixed solve must meet the reference's own 2e-5 criterion -- which the
    all-f32 solve cannot (resid_tol floors at ~50 eps_f32 ~ 6e-6 per
    substep and the error accumulates)."""

    def run(mixed):
        pp = ParmParse.from_string(
            f"""
            geometry.prob_lo = 0. 0. 0.
            geometry.prob_hi = 1e5 1e5 1e5
            amr.n_cell = 4 1 1
            constant_dt = 1.0e-8
            stop_time = 1.0e-3
            max_timesteps = 1000000
            radiation.mixed_precision_coupling = {mixed}
            verbose = 0
            """
        )
        prob = RadMatterCouplingProblem()
        sim = Simulation(prob, pp, precision="single")
        sim.set_initial_conditions()
        eos = sim.eos
        dt = 1.0e-8
        chunk = 100
        n_chunks = int(round(sim.stop_time / (dt * chunk)))
        rad = sim._radiation
        U = sim.U
        t_hist, Tgas_hist = [], []
        for i in range(n_chunks):
            U = rad.run_steps(U, i * chunk * dt, dt, chunk)
            Egas = float(U[EGAS][0, 0, 0])
            Tgas_hist.append(float(eos.tgas_from_eint(np.nan, Egas)))
            t_hist.append((i + 1) * chunk * dt)
        t_hist = np.array(t_hist)
        Tgas_exact = prob.exact_Tgas(t_hist)
        return (np.sum(np.abs(np.array(Tgas_hist) - Tgas_exact))
                / np.sum(np.abs(Tgas_exact)))

    err_mixed = run(1)
    err_f32 = run(0)
    print(f"mixed {err_mixed:.3e} vs f32 {err_f32:.3e}")
    assert err_mixed < 2e-5
    assert err_mixed <= err_f32
