"""Self-gravity: Poisson solvers + operator-split momentum/energy kick.

TPU-native rebuild of the reference's gravity subsystem (reference
``src/simulation.hpp:1011-1096`` + ``src/QuokkaSimulation.hpp:709-757``):
the reference solves nabla^2 phi = 4 pi G rho with *open* (isolated)
boundaries via `amrex::OpenBCSolver` (James 1977); here the open-boundary
solve is a free-space Green's-function convolution on the zero-padded
domain (Hockney & Eastwood), which maps perfectly onto TPU: two 3D FFTs
(`jnp.fft` is XLA-collective-native under sharding) and an elementwise
multiply. A periodic spectral solver is also provided for periodic problems.

The gravity kick matches the reference exactly: operator-split, applied
after the hydro step, g = -grad phi by central differences, momentum
updated and total energy incremented by the kinetic-energy change
(``applyPoissonGravityAtLevel``).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from ..indices import EGAS, MX1, MX2, MX3, RHO
from ..stencil import sh


def greens_function_kernel(shape, dx, dtype=jnp.float64):
    """Free-space Green's function -1/(4 pi |r|) sampled on the 2x padded
    grid (wrapped so that r is the minimum-image distance), with the
    standard r=0 self-cell softening ~ dx."""
    n2 = [2 * n for n in shape]
    coords = []
    for d in range(3):
        i = jnp.arange(n2[d])
        # wrapped offsets: 0, 1, ..., n, -(n-1), ..., -1
        off = jnp.where(i <= shape[d], i, i - n2[d]).astype(dtype)
        coords.append(off * dx[d])
    x = coords[0][:, None, None]
    y = coords[1][None, :, None]
    z = coords[2][None, None, :]
    r = jnp.sqrt(x * x + y * y + z * z)
    # self-cell: effective potential of a cube ~ -1/(4 pi R_eff) with
    # R_eff ~ 0.51 * dx (volume-equivalent softening)
    r_eff = 0.51 * min(dx)
    r = jnp.where(r == 0.0, r_eff, r)
    return -1.0 / (4.0 * jnp.pi * r)


def _fft_real_dtype(dtype):
    """TPU backends have no complex128 (`C128 is not supported on TPU`):
    f64 Poisson solves run their FFT stage in f32/complex64 there, with the
    result cast back.  phi's ~1e-7 relative FFT error is far below the
    operator-split gravity truncation error."""
    import jax

    if jnp.dtype(dtype) == jnp.float64 and jax.default_backend() != "cpu":
        return jnp.float32
    return jnp.dtype(dtype)


def solve_poisson_open(rho_rhs: jnp.ndarray, dx, G_kernel_fft=None, dtype=None):
    """Solve nabla^2 phi = rhs with isolated (open) boundary conditions by
    free-space convolution: phi = G * rhs, G = -1/(4 pi r).

    `rho_rhs` is the full RHS field (the caller supplies 4 pi G rho, as the
    reference's `fillPoissonRhsAtLevel` does). Returns phi of the same shape.
    Pass a precomputed `G_kernel_fft` (from `greens_function_kernel` +
    rfftn) to amortize the kernel FFT."""
    shape = rho_rhs.shape
    dtype = dtype or rho_rhs.dtype
    fdt = _fft_real_dtype(dtype)
    n2 = tuple(2 * n for n in shape)

    if G_kernel_fft is None:
        Gk = greens_function_kernel(shape, dx, fdt)
        G_kernel_fft = jnp.fft.rfftn(Gk)
    elif G_kernel_fft.dtype == jnp.complex128 and fdt == jnp.float32:
        G_kernel_fft = G_kernel_fft.astype(jnp.complex64)

    cell_vol = dx[0] * dx[1] * dx[2]
    src = jnp.zeros(n2, dtype=fdt)
    src = src.at[: shape[0], : shape[1], : shape[2]].set(
        rho_rhs.astype(fdt))
    phi2 = jnp.fft.irfftn(jnp.fft.rfftn(src) * G_kernel_fft, s=n2)
    phi = phi2[: shape[0], : shape[1], : shape[2]] * cell_vol
    return phi.astype(dtype)


def solve_poisson_periodic(rhs: jnp.ndarray, dx):
    """Spectral solve of nabla^2 phi = rhs on the periodic box (discrete
    Laplacian eigenvalues, so the solution is consistent with the
    second-order central-difference gradient used in the kick)."""
    shape = rhs.shape
    dtype = rhs.dtype
    fdt = _fft_real_dtype(dtype)
    ks = []
    for d in range(3):
        k = jnp.fft.fftfreq(shape[d]).astype(fdt) * 2.0 * jnp.pi
        ks.append((2.0 * jnp.cos(k) - 2.0) / dx[d] ** 2)
    eig = (
        ks[0][:, None, None] + ks[1][None, :, None] + ks[2][None, None, :]
    )
    rhs_hat = jnp.fft.fftn(rhs.astype(fdt))
    eig = eig.at[0, 0, 0].set(1.0)
    phi_hat = rhs_hat / eig
    phi_hat = phi_hat.at[0, 0, 0].set(0.0)  # zero-mean gauge
    return jnp.real(jnp.fft.ifftn(phi_hat)).astype(dtype)


def gravity_accel(phi: jnp.ndarray, dx, periodic=True):
    """g = -grad phi by central differences (interior-valid for
    non-periodic; edges use one-sided wrap values which callers mask)."""
    gx = -0.5 * (sh(phi, 1, 0) - sh(phi, -1, 0)) / dx[0]
    gy = -0.5 * (sh(phi, 1, 1) - sh(phi, -1, 1)) / dx[1]
    gz = -0.5 * (sh(phi, 1, 2) - sh(phi, -1, 2)) / dx[2]
    return gx, gy, gz


def apply_gravity_kick(U: jnp.ndarray, phi: jnp.ndarray, dx, dt):
    """Operator-split gravity kick (reference `applyPoissonGravityAtLevel`):
    p += dt rho g, E += Delta KE."""
    rho = U[RHO]
    gx, gy, gz = gravity_accel(phi, dx)
    px, py, pz = U[MX1], U[MX2], U[MX3]
    ke_old = 0.5 * (px * px + py * py + pz * pz) / rho
    px = px + dt * rho * gx
    py = py + dt * rho * gy
    pz = pz + dt * rho * gz
    ke_new = 0.5 * (px * px + py * py + pz * pz) / rho
    out = U.at[MX1].set(px).at[MX2].set(py).at[MX3].set(pz)
    out = out.at[EGAS].add(ke_new - ke_old)
    return out
