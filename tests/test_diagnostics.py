"""Config-driven diagnostics, projections, statistics, derived vars."""

import os

import numpy as np

from quokka_tpu import ParmParse, Simulation
from quokka_tpu.io.diagnostics import axis_profile, compute_derived_field, weighted_pdf
from quokka_tpu.problems.kelvin_helmholtz import KelvinHelmholtzProblem


def test_configured_diagnostics(tmp_path):
    os.chdir(tmp_path)
    pp = ParmParse.from_string(
        """
        geometry.prob_hi = 1. 1. 1.
        amr.n_cell = 32 32 1
        cfl = 0.4
        stop_time = 1.0
        max_timesteps = 10
        statistics_interval = 5
        projection_interval = 5
        quokka.diagnostics = d1 d2
        d1.type = DiagFramePlane
        d1.field = gasDensity
        d1.axis = y
        d1.op = sum
        d1.interval = 5
        d2.type = DiagPDF
        d2.field = temperature
        d2.bins = 32
        d2.log = 1
        d2.interval = 5
        verbose = 0
        """
    )
    sim = Simulation(KelvinHelmholtzProblem(), pp)
    sim.set_initial_conditions()
    sim.evolve()

    files = os.listdir(".")
    assert any(f.startswith("d1_gasDensity_plt") for f in files)
    assert any(f.startswith("pdf_temperature_") for f in files)
    assert any(f.startswith("proj_z_plt") for f in files)
    assert "history.txt" in files
    with open("history.txt") as f:
        lines = f.read().strip().splitlines()
    assert lines[0].startswith("#")
    assert len(lines) >= 2

    # derived fields + profile sanity
    T = compute_derived_field(sim, "temperature")
    assert np.all(np.asarray(T) > 0)
    prof = axis_profile(sim.U[0], 1)
    assert prof.shape[0] == 32
    hist, edges = weighted_pdf(T, bins=16)
    assert int(np.asarray(hist).sum()) == 32 * 32
