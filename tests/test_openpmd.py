"""openPMD-format plotfile output (reference ``src/io/openPMD.cpp``).

Checks the on-disk layout against the openPMD 1.1.0 standard: series root
attributes, file-based iteration encoding, C-order datasets with reversed
axis labels, per-level ``_lvl<l>`` mesh naming, and lossless round-trip of
the solver state.
"""

import os

import numpy as np

from quokka_tpu import ParmParse, Simulation
from quokka_tpu.io.openpmd import read_openpmd_file, write_openpmd
from quokka_tpu.problems.kelvin_helmholtz import KelvinHelmholtzProblem


def _run_sim(tmp_path, extra=""):
    os.chdir(tmp_path)
    pp = ParmParse.from_string(
        f"""
        geometry.prob_hi = 1. 1. 1.
        amr.n_cell = 32 32 1
        cfl = 0.4
        max_timesteps = 3
        plotfile_interval = 3
        plotfile_format = openpmd
        verbose = 0
        {extra}
        """
    )
    sim = Simulation(KelvinHelmholtzProblem(), pp)
    sim.set_initial_conditions()
    sim.evolve()
    return sim


def test_openpmd_layout_and_roundtrip(tmp_path):
    import h5py

    sim = _run_sim(tmp_path)
    path = tmp_path / f"plt{sim.istep:07d}.h5"
    assert path.exists(), "evolve() must write the openPMD plotfile"

    with h5py.File(path, "r") as f:
        # series root attributes (openPMD 1.1.0 required set)
        assert f.attrs["openPMD"] == b"1.1.0"
        assert f.attrs["basePath"] == b"/data/%T/"
        assert f.attrs["meshesPath"] == b"meshes/"
        assert f.attrs["iterationEncoding"] == b"fileBased"

        it = f[f"data/{sim.istep}"]
        assert np.isclose(it.attrs["time"], sim.t)

        ds = it["meshes/gasDensity"]
        assert ds.attrs["geometry"] == b"cartesian"
        assert ds.attrs["dataOrder"] == b"C"
        # reversed axis labels + disk shape (nz,ny,nx): src/io/openPMD.cpp:48-64
        assert [s for s in ds.attrs["axisLabels"]] == [b"z", b"y", b"x"]
        assert ds.shape == (1, 32, 32)
        np.testing.assert_allclose(
            ds.attrs["gridSpacing"], np.asarray(sim.grid.dx)[::-1]
        )
        assert list(ds.attrs["position"]) == [0.5, 0.5, 0.5]

    fields, t = read_openpmd_file(str(path))
    assert np.isclose(t, sim.t)
    U = np.asarray(sim.U)
    names = sim.layout.component_names()
    from quokka_tpu.io.openpmd import _mesh_name

    for i, n in enumerate(names):
        np.testing.assert_array_equal(fields[_mesh_name(n, 0)], U[i])


def test_openpmd_amr_levels(tmp_path):
    """Fine levels appear as <field>_lvl<l> meshes (src/io/openPMD.cpp:81-90)."""
    os.chdir(tmp_path)
    from quokka_tpu.amr.hierarchy import AMRSimulation
    from quokka_tpu.problems.sedov import SedovProblem

    pp = ParmParse.from_string(
        """
        geometry.prob_hi = 1.2 1.2 1.2
        amr.n_cell = 16 16 16
        amr.max_level = 1
        cfl = 0.3
        max_timesteps = 2
        verbose = 0
        """
    )
    sim = AMRSimulation(SedovProblem(), pp)
    sim.set_initial_conditions()
    sim.evolve()
    path = write_openpmd(sim, directory=str(tmp_path))
    fields, _ = read_openpmd_file(path)
    assert "gasDensity" in fields and fields["gasDensity"].shape == (16, 16, 16)
    if sim.finest_level >= 1:
        assert "gasDensity_lvl1" in fields
        assert fields["gasDensity_lvl1"].shape == (32, 32, 32)
        np.testing.assert_array_equal(
            fields["gasDensity_lvl1"], np.asarray(sim.level_U[1])[0]
        )
