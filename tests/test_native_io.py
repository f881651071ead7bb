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
