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


def sh_bc(
    A: jnp.ndarray,
    k: int,
    ax: int,
    lo_kind: str,
    hi_kind: str,
    odd: bool = False,
) -> jnp.ndarray:
    """`sh` with physical-wall-corrected values on an UNPADDED spatial field.

    On a ghost-free (lane-aligned) array the roll wrap is only correct for
    periodic boundaries; for reflecting/outflow walls the handful of
    positions whose stencil crosses the wall are fixed up with masked reads
    of the mirrored/edge planes (these fuse into the surrounding elementwise
    graph -- no extra HBM traffic). `odd=True` flips the sign of reflected
    values (normal velocity/momentum components). Matches
    `boundaries.physical_slabs` ghost values exactly (reference
    reflect_odd/reflect_even/foextrap, ``src/simulation.hpp:1706-1789``).

    `A` is a 3D spatial field and `ax` its array axis. |k| must not exceed
    the wall-stencil depth the caller owns (<= 4 here).
    """
    from jax import lax

    out = sh(A, k, ax)
    if k == 0:
        return out
    from .registry import BC_PERIODIC, BC_REFLECT

    n = A.shape[ax]
    idx_shape = [1, 1, 1]
    idx_shape[ax] = n
    idx = lax.broadcasted_iota(jnp.int32, tuple(idx_shape), ax)

    def plane(src: int):
        return lax.slice_in_dim(A, src, src + 1, axis=ax)

    sgn = -1.0 if odd else 1.0
    if k < 0 and lo_kind != BC_PERIODIC:
        m = -k
        # out[i] for i < m should read ghost g_{m-1-i}; reflect ghost g_j =
        # +-A[j], outflow ghost = A[0]
        for i in range(m):
            if lo_kind == BC_REFLECT:
                val = sgn * plane(m - 1 - i)
            else:  # outflow / anything edge-extrapolated
                val = plane(0)
            out = jnp.where(idx == i, val, out)
    if k > 0 and hi_kind != BC_PERIODIC:
        # out[i] for i >= n-k should read ghost g_{i+k-n}; reflect ghost
        # g_j = +-A[n-1-j], outflow ghost = A[n-1]
        for i in range(k):
            pos = n - k + i
            if hi_kind == BC_REFLECT:
                val = sgn * plane(n - 1 - (pos + k - n))
            else:
                val = plane(n - 1)
            out = jnp.where(idx == pos, val, out)
    return out


def pad_spatial(A: jnp.ndarray, ng: Sequence[int], mode: str = "edge") -> jnp.ndarray:
    """Pad the last three (spatial) axes by `ng` with the given numpy pad mode."""
    pad = [(0, 0)] * (A.ndim - 3) + [(g, g) for g in ng]
    return jnp.pad(A, pad, mode=mode)


def ghost_widths(grid, ng_active: int) -> Tuple[int, int, int]:
    """Ghost width per axis: `ng_active` on active axes, 0 on size-1 axes."""
    return tuple(ng_active if grid.n_cell[d] > 1 else 0 for d in range(3))
