"""Halo exchange over the device mesh (`shard_map` + `lax.ppermute`).

TPU-native equivalent of AMReX `FillBoundary` (reference
``src/simulation.hpp:1706-1789``; 39-84% of the reference's walltime at
scale, ``paper/performance_a100.csv``): each shard sends its boundary slabs
to mesh neighbors over ICI with `lax.ppermute`, then shards owning a piece
of the physical domain boundary overwrite their outer slabs with the
physical BC fill (periodic boundaries are simply the ppermute wraparound).

All functions here run *inside* a `shard_map`ped function.
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp
from jax import lax

from ..boundaries import pad_axis, physical_slabs
from ..registry import BC_PERIODIC, BC_USER, BCSpec
from .decomp import AXIS_NAMES, Decomposition


def _exchange_slabs(A: jnp.ndarray, d: int, w: int, name: str, n_shards: int):
    """ppermute the `w`-wide boundary slabs of spatial dim `d` to neighbors.
    Returns (recv_lo, recv_hi): recv_lo is the left neighbor's tail (this
    shard's low ghost), recv_hi the right neighbor's head."""
    ax = A.ndim - 3 + d
    n = A.shape[ax]
    tail = lax.slice_in_dim(A, n - w, n, axis=ax)
    head = lax.slice_in_dim(A, 0, w, axis=ax)
    fwd = [(i, (i + 1) % n_shards) for i in range(n_shards)]
    bwd = [(i, (i - 1) % n_shards) for i in range(n_shards)]
    recv_lo = lax.ppermute(tail, name, fwd)
    recv_hi = lax.ppermute(head, name, bwd)
    return recv_lo, recv_hi


def make_sharded_fill(
    decomp: Decomposition,
    ng: Sequence[int],
    bcs: BCSpec,
    layout,
    problem=None,
    grid=None,
) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """Build the ghost-fill function used inside the shard_mapped step:
    inter-shard halos via ppermute, physical BCs on domain-edge shards."""
    tiles = decomp.tiles

    def fill(U_local: jnp.ndarray) -> jnp.ndarray:
        Ug = U_local
        for d in range(3):
            g = ng[d]
            if g == 0:
                continue
            lo_kind, hi_kind = bcs.axis(d)
            if tiles[d] == 1:
                Ug = pad_axis(Ug, d, g, lo_kind, hi_kind, layout, problem, grid, ng)
                continue

            name = AXIS_NAMES[d]
            nsh = tiles[d]
            ax = d + 1
            recv_lo, recv_hi = _exchange_slabs(Ug, d, g, name, nsh)
            idx = lax.axis_index(name)

            lo, hi = recv_lo, recv_hi
            if lo_kind != BC_PERIODIC or hi_kind != BC_PERIODIC:
                phys_lo, phys_hi = physical_slabs(Ug, d, g, lo_kind, hi_kind, layout)
                if lo_kind != BC_PERIODIC:
                    lo = jnp.where(idx == 0, phys_lo, recv_lo)
                if hi_kind != BC_PERIODIC:
                    hi = jnp.where(idx == nsh - 1, phys_hi, recv_hi)

            Ug = jnp.concatenate([lo, Ug, hi], axis=ax)

            # ext_dir (user) BCs: apply the hook on edge shards only
            if problem is not None and (lo_kind == BC_USER or hi_kind == BC_USER):
                if lo_kind == BC_USER:
                    hooked = problem.fill_user_boundary(Ug, grid, ng, 0.0, d, 0)
                    Ug = jnp.where(idx == 0, hooked, Ug)
                if hi_kind == BC_USER:
                    hooked = problem.fill_user_boundary(Ug, grid, ng, 0.0, d, 1)
                    Ug = jnp.where(idx == nsh - 1, hooked, Ug)
        return Ug

    return fill


def make_sharded_mask_fill(
    decomp: Decomposition,
    ng: Sequence[int],
    periodic: Sequence[bool],
) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """Ghost fill for the FOFC redo mask (bool [nx,ny,nz]): halo-exchange
    across shards; periodic wrap / zero at physical boundaries (matches the
    reference's `redoFlag.FillBoundary(periodicity)`)."""
    tiles = decomp.tiles

    def fill(mask: jnp.ndarray) -> jnp.ndarray:
        out = mask
        for d in range(3):
            g = ng[d]
            if g == 0:
                continue
            ax = d
            n = out.shape[ax]
            if tiles[d] == 1:
                if periodic[d]:
                    lo = lax.slice_in_dim(out, n - g, n, axis=ax)
                    hi = lax.slice_in_dim(out, 0, g, axis=ax)
                else:
                    shape = list(out.shape)
                    shape[ax] = g
                    lo = jnp.zeros(shape, dtype=out.dtype)
                    hi = lo
            else:
                name = AXIS_NAMES[d]
                nsh = tiles[d]
                recv_lo, recv_hi = _exchange_slabs(out, d, g, name, nsh)
                if periodic[d]:
                    lo, hi = recv_lo, recv_hi
                else:
                    idx = lax.axis_index(name)
                    zeros = jnp.zeros_like(recv_lo)
                    lo = jnp.where(idx == 0, zeros, recv_lo)
                    hi = jnp.where(idx == nsh - 1, zeros, recv_hi)
            out = jnp.concatenate([lo, out, hi], axis=ax)
        return out

    return fill
