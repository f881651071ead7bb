"""Stencil utilities for dense-array finite-volume kernels.

Convention used throughout the hydro/radiation compute path: work happens on
*ghost-padded* arrays of fixed shape ``[nvar, nx+2gx, ny+2gy, nz+2gz]`` and
every stencil operator is expressed with `sh(A, k, ax)` = "A evaluated at
index i+k along axis ax". `sh` is a roll, so shapes never change inside a
kernel; values in the ghost margin that a given shift corrupts are never read
because the final interior slice discards them. XLA fuses the rolls into the
surrounding elementwise graph, so this costs no extra HBM traffic in practice
(and keeps every shape static, which is what the TPU compiler needs).

Face-indexed arrays share the same padded shape: position ``f`` along an axis
holds the value at the interface between cells ``f-1`` and ``f`` (the
reference's "flux on the left edge of zone f" convention,
``src/hyperbolic_system.hpp:443-447``).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp


def sh(A: jnp.ndarray, k: int, ax: int) -> jnp.ndarray:
    """A shifted so that result[i] = A[i+k] along array axis `ax`."""
    if k == 0:
        return A
    return jnp.roll(A, -k, axis=ax)


def interior(A: jnp.ndarray, ng: Sequence[int]) -> jnp.ndarray:
    """Slice off the ghost margin. `ng` = ghost width per spatial axis; A's
    spatial axes are the last three."""
    idx = [slice(None)] * (A.ndim - 3)
    for g in ng:
        idx.append(slice(g, -g) if g > 0 else slice(None))
    return A[tuple(idx)]


def pad_spatial(A: jnp.ndarray, ng: Sequence[int], mode: str = "edge") -> jnp.ndarray:
    """Pad the last three (spatial) axes by `ng` with the given numpy pad mode."""
    pad = [(0, 0)] * (A.ndim - 3) + [(g, g) for g in ng]
    return jnp.pad(A, pad, mode=mode)


def ghost_widths(grid, ng_active: int) -> Tuple[int, int, int]:
    """Ghost width per axis: `ng_active` on active axes, 0 on size-1 axes."""
    return tuple(ng_active if grid.n_cell[d] > 1 else 0 for d in range(3))
