"""Native async array writer (C++ thread pool via ctypes)."""

import numpy as np
import pytest

from quokka_tpu.io import native


@pytest.mark.skipif(not native.available(), reason="native writer unavailable")
def test_roundtrip_dtypes(tmp_path):
    rng = np.random.default_rng(0)
    for dtype in ("float64", "float32", "int32", "int64", "bool"):
        a = (rng.standard_normal((5, 17, 9)) * 100).astype(dtype)
        p = str(tmp_path / f"arr_{dtype}.qka")
        assert native.write_array_async(p, a)
        assert native.drain() == 0
        np.testing.assert_array_equal(native.read_array(p), a)


@pytest.mark.skipif(not native.available(), reason="native writer unavailable")
def test_many_concurrent_writes(tmp_path):
    arrays = [np.full((64, 64), i, np.float32) for i in range(32)]
    paths = [str(tmp_path / f"c{i}.qka") for i in range(32)]
    for p, a in zip(paths, arrays):
        assert native.write_array_async(p, a)
    assert native.drain() == 0
    for p, a in zip(paths, arrays):
        np.testing.assert_array_equal(native.read_array(p), a)


@pytest.mark.skipif(not native.available(), reason="native writer unavailable")
def test_truncation_detected(tmp_path):
    a = np.ones((8, 8))
    p = str(tmp_path / "t.qka")
    assert native.write_array_async(p, a)
    assert native.drain() == 0
    raw = open(p, "rb").read()
    open(p, "wb").write(raw[:-12])  # chop the tail
    with pytest.raises(ValueError):
        native.read_array(p)


def test_plotfile_through_native_writer(tmp_path):
    """The plotfile path streams per-component arrays through the native
    async writer (VisMF analog) and reads back losslessly, including AMR
    levels and the boolean refinement mask."""
    import os

    from quokka_tpu import ParmParse
    from quokka_tpu.amr.hierarchy import AMRSimulation
    from quokka_tpu.io.plotfile import read_plotfile, write_plotfile
    from tests.test_amr import Blast2D

    os.chdir(tmp_path)
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
    assert sim.finest_level >= 1
    path = write_plotfile(sim, directory=str(tmp_path))

    if native.available():
        lvl0 = os.listdir(os.path.join(path, "Level_0"))
        assert any(f.endswith(".qka") for f in lvl0), (
            "native writer available but plotfile fell back to npz"
        )

    header, data = read_plotfile(path)
    np.testing.assert_array_equal(data["gasDensity"], np.asarray(sim.U[0]))
    _, data1 = read_plotfile(path, level=1)
    np.testing.assert_array_equal(
        data1["gasDensity"], np.asarray(sim.level_U[1][0])
    )
    np.testing.assert_array_equal(
        data1["refined_mask"].astype(bool),
        np.asarray(sim.level_mask[1]).astype(bool),
    )
