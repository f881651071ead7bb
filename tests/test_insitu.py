"""In-situ rendering (reference Ascent analog, ``src/simulation.hpp:2209-2280``).

The evolve loop renders configured fields to PNG every ``ascent_interval``
steps; AMR fine levels are composited onto the base grid first.
"""

import os

import numpy as np

from quokka_tpu import ParmParse, Simulation
from quokka_tpu.io.insitu import composite_field, render_field
from quokka_tpu.problems.kelvin_helmholtz import KelvinHelmholtzProblem


def _png_ok(path):
    assert os.path.exists(path), path
    with open(path, "rb") as f:
        magic = f.read(8)
    assert magic == b"\x89PNG\r\n\x1a\n", "not a PNG file"
    assert os.path.getsize(path) > 1000, "implausibly small render"


def test_insitu_render_during_evolve(tmp_path):
    os.chdir(tmp_path)
    pp = ParmParse.from_string(
        """
        geometry.prob_hi = 1. 1. 1.
        amr.n_cell = 32 32 1
        cfl = 0.4
        max_timesteps = 4
        ascent_interval = 2
        render.fields = gasDensity pressure
        verbose = 0
        """
    )
    sim = Simulation(KelvinHelmholtzProblem(), pp)
    sim.set_initial_conditions()
    sim.evolve()
    for step in (2, 4):
        _png_ok(tmp_path / f"render_gasDensity{step:05d}.png")
        _png_ok(tmp_path / f"render_pressure{step:05d}.png")


def test_insitu_amr_composite_and_projection(tmp_path):
    os.chdir(tmp_path)
    from quokka_tpu.amr.hierarchy import AMRSimulation
    from tests.test_amr import Blast2D

    pp = ParmParse.from_string(
        """
        geometry.prob_lo = 0. 0. 0.
        geometry.prob_hi = 1. 1. 1.
        amr.n_cell = 32 32 1
        amr.max_level = 1
        cfl = 0.3
        max_timesteps = 3
        verbose = 0
        """
    )
    sim = AMRSimulation(Blast2D(), pp)
    sim.set_initial_conditions()
    sim.evolve()
    assert sim.finest_level >= 1, "blast must refine for this test to bite"

    data = composite_field(sim, "gasDensity")
    assert data.shape == (64, 64, 1), "composite must be at finest resolution"
    mask = np.asarray(sim.level_mask[1]) > 0.5
    fine = np.asarray(sim.level_U[1])[0]
    np.testing.assert_array_equal(data[mask], fine[mask])

    path = render_field(sim, "gasDensity", mode="projection", axis=2,
                        directory=str(tmp_path))
    _png_ok(path)
