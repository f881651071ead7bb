"""Ghost-cell filling for physical boundary conditions (single device).

TPU-native equivalent of the reference's `fillBoundaryConditions` for the
physical-domain part (reference ``src/simulation.hpp:1706-1789``): periodic
(int_dir), outflow (foextrap), reflecting (reflect_even/odd on the normal
momentum), and user Dirichlet (ext_dir via a problem hook).

Same-level *inter-device* ghost exchange is handled separately by
`parallel.halo` (`shard_map` + `lax.ppermute`); the per-axis physical fill
here is reused there for the shards that own a piece of the domain boundary.

The fill is dimension-by-dimension (x then y then z), which also fills edge
and corner ghosts consistently -- same as AMReX's FillBoundary + domain BC
pass.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax.numpy as jnp

from .indices import MX1, RAD_FX, StateLayout
from .registry import BC_OUTFLOW, BC_PERIODIC, BC_REFLECT, BC_USER, BCSpec


def _odd_components(layout: StateLayout, axis: int) -> list[int]:
    """State components whose sign flips under reflection about `axis`
    (normal momentum + normal radiation flux per group)."""
    comps = []
    if layout.hydro_enabled:
        comps.append(MX1 + axis)
    if layout.radiation_enabled:
        for g in range(layout.n_groups):
            comps.append(layout.rad_index(g, RAD_FX + axis))
    return comps


def _reflect_sign(layout: StateLayout, axis: int, dtype) -> jnp.ndarray:
    sign = jnp.ones((layout.nvar, 1, 1, 1), dtype=dtype)
    for c in _odd_components(layout, axis):
        sign = sign.at[c].set(-1.0)
    return sign


def physical_slabs(
    U: jnp.ndarray,
    d: int,
    g: int,
    lo_kind: str,
    hi_kind: str,
    layout: StateLayout,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Ghost slabs for one axis computed from the adjacent interior data
    (periodic wrap / outflow extrapolation / reflection). BC_USER slabs are
    filled by the problem hook afterwards (see `pad_axis`)."""
    from jax import lax

    ax = d + 1
    n = U.shape[ax]
    # static slices (NOT jnp.take gathers -- XLA:TPU lowers those to slow
    # dynamic-gather kernels; slice+flip+broadcast all fuse)
    take = lambda a, b: lax.slice_in_dim(U, a, b, axis=ax)

    if lo_kind == BC_PERIODIC:
        lo = take(n - g, n)
    elif lo_kind == BC_REFLECT:
        lo = jnp.flip(take(0, g), axis=ax) * _reflect_sign(layout, d, U.dtype)
    else:  # outflow / user (user overwritten by the hook)
        shape = list(U.shape)
        shape[ax] = g
        lo = jnp.broadcast_to(take(0, 1), shape)

    if hi_kind == BC_PERIODIC:
        hi = take(0, g)
    elif hi_kind == BC_REFLECT:
        hi = jnp.flip(take(n - g, n), axis=ax) * _reflect_sign(layout, d, U.dtype)
    else:
        shape = list(U.shape)
        shape[ax] = g
        hi = jnp.broadcast_to(take(n - 1, n), shape)

    return lo, hi


def pad_axis(
    U: jnp.ndarray,
    d: int,
    g: int,
    lo_kind: str,
    hi_kind: str,
    layout: StateLayout,
    problem=None,
    grid=None,
    ng: Sequence[int] | None = None,
    time: float = 0.0,
) -> jnp.ndarray:
    """Pad one spatial axis with physical-BC ghost values."""
    ax = d + 1
    lo, hi = physical_slabs(U, d, g, lo_kind, hi_kind, layout)
    Ug = jnp.concatenate([lo, U, hi], axis=ax)
    if problem is not None:
        if lo_kind == BC_USER:
            Ug = problem.fill_user_boundary(Ug, grid, ng, time, d, 0)
        if hi_kind == BC_USER:
            Ug = problem.fill_user_boundary(Ug, grid, ng, time, d, 1)
        from .registry import BC_NSCBC_INFLOW, BC_NSCBC_OUTFLOW

        if BC_NSCBC_OUTFLOW in (lo_kind, hi_kind):
            from .hydro.nscbc import set_outflow_boundary

            eos = problem.make_eos()
            P_t = float(getattr(problem, "nscbc_outflow_pressure"))
            if lo_kind == BC_NSCBC_OUTFLOW:
                Ug = set_outflow_boundary(Ug, d, 0, P_t, grid, ng, eos)
            if hi_kind == BC_NSCBC_OUTFLOW:
                Ug = set_outflow_boundary(Ug, d, 1, P_t, grid, ng, eos)
        if BC_NSCBC_INFLOW in (lo_kind, hi_kind):
            from .hydro.nscbc import set_inflow_boundary

            eos = problem.make_eos()
            targets = problem.nscbc_inflow_targets(grid, time)
            if lo_kind == BC_NSCBC_INFLOW:
                Ug = set_inflow_boundary(Ug, d, 0, targets, grid, ng, eos)
            if hi_kind == BC_NSCBC_INFLOW:
                Ug = set_inflow_boundary(Ug, d, 1, targets, grid, ng, eos)
    return Ug


def fill_ghosts(
    U: jnp.ndarray,
    ng: Sequence[int],
    bcs: BCSpec,
    layout: StateLayout,
    problem=None,
    grid=None,
    time: float = 0.0,
) -> jnp.ndarray:
    """Pad interior state U[nvar, nx, ny, nz] with `ng` ghosts per axis and
    fill them according to `bcs`. Returns the padded array."""
    Ug = U
    for d in range(3):
        g = ng[d]
        if g == 0:
            continue
        lo_kind, hi_kind = bcs.axis(d)
        Ug = pad_axis(Ug, d, g, lo_kind, hi_kind, layout, problem, grid, ng, time)
    return Ug
