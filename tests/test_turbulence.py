"""Solenoidal turbulence-driving cube generator."""

import numpy as np

from quokka_tpu.utils.turbulence import (
    read_turb_cube, save_turb_cube, solenoidal_perturbation,
)


def test_solenoidal_and_normalized(tmp_path):
    v = solenoidal_perturbation(32, rms=2.5, seed=7)
    assert v.shape == (3, 32, 32, 32)
    # RMS normalization
    rms = np.sqrt((v**2).sum(axis=0).mean())
    np.testing.assert_allclose(rms, 2.5, rtol=1e-12)
    # zero mean
    assert np.abs(v.mean(axis=(1, 2, 3))).max() < 1e-12
    # divergence-free in the spectral sense
    k1 = np.fft.fftfreq(32, d=1.0 / 32)
    kx, ky, kz = np.meshgrid(k1, k1, k1, indexing="ij")
    vk = np.fft.fftn(v, axes=(1, 2, 3))
    div_k = kx * vk[0] + ky * vk[1] + kz * vk[2]
    denom = np.sqrt((np.abs(vk)**2).sum(axis=0)).max()
    assert np.abs(div_k).max() / denom < 1e-10
    # roundtrip through the cube file format
    p = str(tmp_path / "turb.npz")
    save_turb_cube(p, v)
    np.testing.assert_array_equal(read_turb_cube(p), v)
