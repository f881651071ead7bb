"""Sharded (multi-chip) level step: the whole hydro advance inside one
`jax.shard_map` over the device mesh.

This is the TPU-native replacement for the reference's MPI execution model
(one AMReX rank per GPU; reference ``src/main.cpp:18-70``): every device owns
one block of the level array, the full RK2 step runs locally, ghost
exchanges are `lax.ppermute` halo slabs (see `parallel.halo`), and the
global reductions the reference does with `ParallelDescriptor::Reduce*`
(max signal speed, validity, FOFC cell counts) are `lax.pmax`/`lax.psum`
inside the same compiled program -- no host round-trips mid-step.
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import PartitionSpec as P

from ..hydro import advance as hydro_advance
from ..hydro import euler
from ..hydro.advance import HydroOptions
from .decomp import AXIS_NAMES, Decomposition
from .halo import make_sharded_fill, make_sharded_mask_fill


def build_sharded_step(
    opts: HydroOptions,
    decomp: Decomposition,
    ng: Sequence[int],
    periodic: Sequence[bool],
    bcs,
    layout,
    problem=None,
    grid=None,
    strang=None,
    ghost_free=None,
):
    """Returns a jitted `(U, dt) -> (U_new, stats)` operating on globally
    sharded arrays. stats values are replicated scalars.

    `ghost_free` (from `Simulation._ghost_free_config`) switches the hydro
    advance to hybrid ghost-free stepping: only halo-exchanged (sharded)
    or hook-filled axes are padded, never the lane (z) axis -- z walls are
    assembled inside the Pallas sweep kernels."""
    # hydro advances only the hydro block (radiation comps belong to the
    # radiation subsystem)
    from ..indices import StateLayout

    nh = layout.nvar_hydro
    layout_h = (
        StateLayout(hydro_enabled=True, radiation_enabled=False,
                    n_scalars=layout.n_scalars, n_mscalars=layout.n_mscalars)
        if layout.radiation_enabled else layout
    )
    bc_kinds = None
    if ghost_free is not None:
        ng = ghost_free["ng"]
        bc_kinds = ghost_free["bc_kinds"]
    fill = make_sharded_fill(decomp, ng, bcs, layout_h, problem, grid)
    mask_fill = make_sharded_mask_fill(decomp, ng, periodic)
    red_axes = tuple(AXIS_NAMES[d] for d in decomp.sharded_dims())

    def redo_any(redo):
        # the FOFC redo branch contains the halo-exchange collective, so the
        # cond predicate must be globally uniform across shards
        n = jnp.sum(redo.astype(jnp.int32))
        if red_axes:
            n = lax.psum(n, red_axes)
        return n > 0

    def local_step(U_local, dt):
        ok_strang = jnp.asarray(True)
        if strang is not None:
            U_local, ok1 = strang(U_local, 0.5 * dt)
            ok_strang = jnp.logical_and(ok_strang, ok1)
        Uh_new, st = hydro_advance.advance_hydro_rk2(
            U_local[:nh], dt, opts, fill, ng, periodic, mask_fill,
            redo_any_fn=redo_any, bc_kinds=bc_kinds,
        )
        if nh < U_local.shape[0]:
            U_new = jnp.concatenate([Uh_new, U_local[nh:]], axis=0)
        else:
            U_new = Uh_new
        if strang is not None:
            U_new, ok2 = strang(U_new, 0.5 * dt)
            ok_strang = jnp.logical_and(ok_strang, ok2)
        smax = jnp.max(euler.max_signal_speed(U_new, opts.eos))
        valid = jnp.all(euler.is_state_valid(U_new, opts.eos))
        valid = jnp.logical_and(valid, ok_strang)
        n_fofc = st["n_fofc"]
        if red_axes:
            smax = lax.pmax(smax, red_axes)
            valid = lax.psum(jnp.logical_not(valid).astype(jnp.int32), red_axes) == 0
            n_fofc = lax.psum(n_fofc, red_axes)
        return U_new, {"max_signal": smax, "valid": valid, "n_fofc": n_fofc}

    spec = decomp.state_spec()
    scalar_spec = P()
    stats_spec = {"max_signal": scalar_spec, "valid": scalar_spec, "n_fofc": scalar_spec}

    mapped = jax.shard_map(
        local_step,
        mesh=decomp.mesh,
        in_specs=(spec, scalar_spec),
        out_specs=(spec, stats_spec),
        check_vma=False,
    )
    return jax.jit(mapped)
