"""Turbulence driving fields: solenoidal velocity perturbation cubes.

The analog of the reference's turbulence-data pipeline
(``src/turbulence/TurbDataReader.{hpp,cpp}`` + the offline
``perturbation.py`` generator): the reference generates solenoidal
Gaussian-random velocity cubes offline and loads them from HDF5 for the
StarCluster/PopIII initial conditions. Here the generator is built in
(numpy FFT, no external data): a power-law band-limited spectrum,
Helmholtz-projected to zero divergence, RMS-normalized.
"""

from __future__ import annotations

import numpy as np


def solenoidal_perturbation(
    n: int,
    k_min: float = 2.0,
    k_max: float = 4.0,
    slope: float = -2.0,
    rms: float = 1.0,
    seed: int = 42,
):
    """Generate a [3, n, n, n] solenoidal velocity cube.

    Power spectrum |v_k|^2 ~ k^slope in the band [k_min, k_max] (in units
    of the box wavenumber), Helmholtz projection removes the compressive
    part, and the field is normalized so sqrt(<|v|^2>) = rms. Matches the
    reference generator's conventions (``perturbation.py``: band-limited
    power law, solenoidal projection, RMS normalization)."""
    rng = np.random.default_rng(seed)
    k1 = np.fft.fftfreq(n, d=1.0 / n)
    kx, ky, kz = np.meshgrid(k1, k1, k1, indexing="ij")
    kk = np.sqrt(kx**2 + ky**2 + kz**2)

    amp = np.zeros_like(kk)
    band = (kk >= k_min) & (kk <= k_max)
    amp[band] = kk[band] ** (slope / 2.0)

    # random complex field with Hermitian symmetry via real-space draw
    v_k = np.empty((3, n, n, n), dtype=np.complex128)
    for c in range(3):
        noise = rng.standard_normal((n, n, n))
        v_k[c] = np.fft.fftn(noise) * amp

    # Helmholtz projection: v_k -= k (k . v_k) / k^2
    k2 = kk**2
    k2[k2 == 0.0] = 1.0
    k_dot_v = kx * v_k[0] + ky * v_k[1] + kz * v_k[2]
    v_k[0] -= kx * k_dot_v / k2
    v_k[1] -= ky * k_dot_v / k2
    v_k[2] -= kz * k_dot_v / k2

    v = np.real(np.fft.ifftn(v_k, axes=(1, 2, 3)))
    v -= v.mean(axis=(1, 2, 3), keepdims=True)
    cur_rms = np.sqrt((v**2).sum(axis=0).mean())
    if cur_rms > 0:
        v *= rms / cur_rms
    return v


def read_turb_cube(path: str):
    """Load a velocity cube saved by `save_turb_cube` (npz with vx/vy/vz;
    the reference reads the equivalent HDF5 datasets)."""
    d = np.load(path)
    return np.stack([d["vx"], d["vy"], d["vz"]])


def save_turb_cube(path: str, v):
    np.savez_compressed(path, vx=v[0], vy=v[1], vz=v[2])
