"""Driver-side integration of tile-pool (sparse) AMR levels.

`PoolState` bundles one pool level's device state + host metadata;
`PoolOps` builds and caches the jitted per-level programs (advance,
padding for children, reflux assembly, average-down) that the
`AMRSimulation` driver dispatches to when a level is pool-represented
(`amr.sparse_min_level`). Dense and pool levels coexist in one hierarchy:
dense levels below `sparse_min_level` (where refined volume fractions are
large), pools above (thin shells, deep cores) -- the reference's
box-granular BoxArray semantics at every level either way.

jit caching: one `jax.jit` per (level, program) -- capacity-bucket growth
changes array shapes, which jax retraces transparently; the bucket
headroom in `TileMeta.grow_capacity` bounds how often.
"""

from __future__ import annotations

from dataclasses import dataclass, replace
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..boundaries import fill_ghosts
from ..hydro import euler
from . import operators as ops
from . import pool_advance as pa
from . import tilepool as tp


@dataclass
class PoolState:
    """One pool level's state: device pool + metadata + parent linkage."""

    meta: tp.TileMeta
    U: jnp.ndarray                       # [T, nvar, tx, ty, tz]
    # parent linkage (parent is a pool): slot + octant offset per tile
    parent_slot: Optional[jnp.ndarray] = None
    parent_off: Optional[jnp.ndarray] = None
    # child linkage (this level's tiles -> child-pool slots per octant),
    # rebuilt when the CHILD level regrids
    child_slots: Optional[jnp.ndarray] = None
    # dense coverage mask at this level's resolution (built lazily, only
    # when the PARENT is dense and needs it for refluxing)
    cov_dense: Optional[jnp.ndarray] = None

    def coverage_dense(self) -> jnp.ndarray:
        if self.cov_dense is None:
            self.cov_dense = tp.coverage_mask_dense(self.meta)
        return self.cov_dense

    def no_children(self) -> jnp.ndarray:
        return jnp.full((self.meta.capacity, 2, 2, 2), -1, jnp.int32)


def _chunked_map(fn, args, chunk: int):
    """lax.map over tile chunks (pads the tile axis up to a chunk
    multiple; callers slice back). Bounds the live memory of whole-pool
    vmapped transforms (regrid prolongation allocates ~6 intermediates
    per tile -- unchunked it OOMs at benchmark scale)."""
    T = args[0].shape[0]
    Nc = -(-T // chunk)
    pad = Nc * chunk - T

    def prep(x):
        if pad:
            x = jnp.concatenate([x, jnp.repeat(x[:1], pad, axis=0)], axis=0)
        return x.reshape(Nc, chunk, *x.shape[1:])

    out = jax.lax.map(fn, tuple(prep(a) for a in args))
    return jax.tree_util.tree_map(
        lambda x: x.reshape(Nc * chunk, *x.shape[2:])[:T], out
    )


def stream_pool_build(produce, const_args, per_chunk_args, cap, chunk,
                      n_active, out_tail, dtype, old_U=None, remap=None):
    """Build a [cap, *out_tail] pool by producing tile data chunk-by-chunk
    on the host and streaming each chunk into a preallocated device buffer
    with DONATED dynamic_update_slice writes.

    `produce(*const_args, *chunk_args) -> [chunk, *out_tail]` must be a
    jitted per-chunk producer. `const_args` are passed whole on every call
    -- pool-sized arrays MUST ride here as jit ARGUMENTS: a closure would
    embed them as HLO constants, and at benchmark scale the serialized
    payload alone exceeds the remote TPU compile helper's request-body
    limit (HTTP 413). `per_chunk_args` are [cap, ...] device arrays
    sliced [i0:i0+chunk) per chunk. Rows >= `n_active` are filled with row
    0's data (benign spare-slot values so every vmapped pass stays finite,
    matching the previous whole-pool builder). If `old_U`/`remap` are
    given, rows with remap >= 0 carry the old pool's data through
    unchanged (regrid persistence) instead of the produced data.

    This replaces whole-pool lax.map stacking + full-size carry merge: at
    benchmark scale (shell 256^3 + 2 levels, level-2 build = 5504 x 32^3
    tiles) XLA laid the stacked [n_chunks, chunk, nvar, tx, ty, tz] map
    output out with a lane-minor tile axis (4x lane padding -> a 28.9 GB
    HBM allocation at compile), and the subsequent take/where merge held
    three pool-sized arrays at once. Streaming holds the output pool plus
    one chunk; peak extra memory is O(chunk)."""
    n_lead = 1 + len(out_tail)
    write = jax.jit(
        lambda buf, data, i0: lax.dynamic_update_slice(
            buf, data, (i0,) + (jnp.zeros((), jnp.int32),) * (n_lead - 1)
        ),
        donate_argnums=0,
    )

    def merge_fn(data, row0, valid, carried=None, keep=None):
        v = valid.reshape((chunk,) + (1,) * len(out_tail))
        data = jnp.where(v, data, row0[None])
        if carried is not None:
            k = keep.reshape((chunk,) + (1,) * len(out_tail))
            data = jnp.where(k & v, carried, data)
        return data

    merge = jax.jit(merge_fn)
    take_old = None
    if old_U is not None:
        take_old = jax.jit(
            lambda old, rows: jnp.take(old, jnp.maximum(rows, 0), axis=0)
        )

    write_tail = None
    U_new = jnp.zeros((cap, *out_tail), dtype)
    row0 = None
    Nc = -(-cap // chunk)
    for ci in range(Nc):
        i0 = ci * chunk
        r = min(chunk, cap - i0)

        def _sl(a):
            c = a[i0:i0 + r]
            if r < chunk:  # pad ragged tail chunk (rows discarded below)
                c = jnp.concatenate(
                    [c, jnp.repeat(c[:1], chunk - r, axis=0)], axis=0
                )
            return c

        if i0 >= n_active and row0 is not None:
            # spare slots never carry old data (their remap rows are -1)
            data = jnp.broadcast_to(row0[None], (chunk, *out_tail)).astype(
                dtype
            )
        else:
            data = produce(*const_args, *(_sl(a) for a in per_chunk_args))
            if row0 is None:
                row0 = data[0]
            valid = jnp.arange(i0, i0 + chunk) < n_active
            if old_U is not None:
                rows = _sl(remap)
                carried = take_old(old_U, rows)
                data = merge(data, row0, valid, carried, rows >= 0)
            else:
                data = merge(data, row0, valid)
        if r < chunk:
            if write_tail is None:
                write_tail = jax.jit(
                    lambda buf, d, i0: lax.dynamic_update_slice(
                        buf, d,
                        (i0,) + (jnp.zeros((), jnp.int32),) * (n_lead - 1)
                    ),
                    donate_argnums=0,
                )
            U_new = write_tail(U_new, data[:r], jnp.asarray(i0, jnp.int32))
        else:
            U_new = write(U_new, data, jnp.asarray(i0, jnp.int32))
    return U_new


def prolong_tiles_from_dense(parent_padded, origin_dev, tile_shape,
                             gp, active_axes, chunk: int = 64,
                             n_active=None, old_U=None, remap=None):
    """Tile interiors prolonged from a dense padded parent (new-tile data
    at regrid; `make_backdrop_from_dense` with zero fine ghosts), streamed
    chunk-by-chunk into the new pool buffer (`stream_pool_build`)."""
    hc = 1
    nv = parent_padded.shape[0]
    sizes = (nv,) + tuple(t // 2 + 2 * hc for t in tile_shape)

    def donor(pp, o):
        z = jnp.zeros((), o.dtype)
        start = (z,) + tuple(o[d] // 2 - hc + gp for d in range(3))
        return lax.dynamic_slice(pp, start, sizes)

    def body(pp, o_c):
        donors = jax.vmap(lambda o: donor(pp, o))(o_c)
        fine = jax.vmap(lambda D: ops.prolong(D, active_axes))(donors)
        sl = tuple(slice(2, fine.shape[2 + d] - 2) for d in range(3))
        return fine[(slice(None), slice(None)) + sl]

    cap = origin_dev.shape[0]
    if n_active is None:
        n_active = cap
    produce = jax.jit(body)
    return stream_pool_build(
        produce, (parent_padded,), (origin_dev,), cap, min(chunk, cap),
        n_active, (nv, *tile_shape), parent_padded.dtype, old_U=old_U,
        remap=remap,
    )


def current_backdrop_fn(kind, arrs, ts, g, active):
    """Per-chunk prolonged-parent backdrop provider at the CURRENT time
    (regrid/tag path): ``mk(org_c, ps_c, po_c) -> backdrop chunk``.

    kind/arrs mirror the hot loop's parent-context representations
    (`AMRSimulation._get_pool_step`):
    - "dense":   arrs = (dense ghost-padded parent,)
    - "poolpad": arrs = (materialized padded parent pool,)
    - "pool":    lazy, arrs = (U_p, nbr_p, org_p, gp_pad) -- the parent's
      padded tiles are assembled ON DEMAND per chunk from the parent pool
      + its own DENSE parent, so the benchmark-scale first pool level
      never materializes a full padded array (identical expressions to
      the materialized scheme, evaluated per chunk)."""
    if kind == "dense":
        (pp,) = arrs

        def mk(org_c, ps_c, po_c):
            return tp.make_backdrop_from_dense(pp, org_c, ts, g, g, active)
    elif kind == "poolpad":
        (pp,) = arrs

        def mk(org_c, ps_c, po_c):
            return tp.make_backdrop_from_pool(pp, ps_c, po_c, ts, g, g,
                                              active)
    else:  # lazy "pool" (parent's parent dense by the lazy-gate invariant)
        U_p, nbr_p, org_p, gp_pad = arrs
        slabs_p = tp.slice_slabs(U_p, g)

        def mk(org_c, ps_c, po_c):
            rows = jnp.maximum(ps_c, 0)
            bdp = tp.make_backdrop_from_dense(
                gp_pad, org_p[rows], ts, g, g, active
            )
            p_pad = tp.assemble_padded(
                U_p[rows], jnp.take(nbr_p, rows, axis=0), bdp, slabs_p, g
            )
            loc = jnp.arange(ps_c.shape[0], dtype=jnp.int32)
            return tp.make_backdrop_from_pool(p_pad, loc, po_c, ts, g, g,
                                              active)
    return mk


def prolong_tiles_from_pool_lazy(U_l, nbr_l, org_l, ps_l, po_l, kind, arrs,
                                 child_ps, child_po, ts, g, active,
                                 chunk: int = 64, n_active=None,
                                 old_U=None, remap=None):
    """New-child-tile data prolonged from POOL parent level l WITHOUT
    materializing l's full padded pool: per chunk of child tiles, assemble
    the padded parent tiles (interior + 26-dir neighbor slabs + backdrop
    from l's own parent context `kind`/`arrs`), then take the prolonged
    interior, streaming each chunk into the new pool buffer
    (`stream_pool_build`). Bitwise-equal to `prolong_tiles_from_pool` on
    the materialized padded pool: the donors carry every coarse cell the
    limited-linear slopes read, and `ops.prolong` is purely local."""
    slabs_l = tp.slice_slabs(U_l, g)
    is_lazy = isinstance(slabs_l, tuple) and len(slabs_l) == 3 \
        and slabs_l[0] == "lazy"

    def body(U_l, nbr_l, org_l, ps_l, po_l, slabs, arrs_t, ps_c, po_c):
        if is_lazy:
            slabs = ("lazy", U_l, g)
        mk = current_backdrop_fn(kind, arrs_t, ts, g, active)
        rows = jnp.maximum(ps_c, 0)
        bd = mk(org_l[rows], ps_l[rows], po_l[rows])
        p_pad = tp.assemble_padded(
            U_l[rows], jnp.take(nbr_l, rows, axis=0), bd, slabs, g
        )
        loc = jnp.arange(ps_c.shape[0], dtype=jnp.int32)
        fine = tp.make_backdrop_from_pool(p_pad, loc, po_c, ts, g, g, active)
        sl = tuple(slice(g, fine.shape[2 + d] - g) for d in range(3))
        return fine[(slice(None), slice(None)) + sl]

    cap = child_ps.shape[0]
    if n_active is None:
        n_active = cap
    nv = U_l.shape[1]
    const = (U_l, nbr_l, org_l, ps_l, po_l,
             () if is_lazy else slabs_l, tuple(arrs))
    return stream_pool_build(
        jax.jit(body), const, (child_ps, child_po), cap, min(chunk, cap),
        n_active, (nv, *ts), U_l.dtype, old_U=old_U, remap=remap,
    )


def prolong_tiles_from_pool(parent_padded_pool, parent_slot, parent_off,
                            tile_shape, gp, active_axes, chunk: int = 64):
    hc = 1
    nv = parent_padded_pool.shape[1]
    sizes = (nv,) + tuple(t // 2 + 2 * hc for t in tile_shape)

    def donor(slot, off):
        tile = parent_padded_pool[jnp.maximum(slot, 0)]
        z = jnp.zeros((), off.dtype)
        start = (z,) + tuple(off[d] - hc + gp for d in range(3))
        return lax.dynamic_slice(tile, start, sizes)

    def body(args):
        ps_c, po_c = args
        donors = jax.vmap(donor)(ps_c, po_c)
        fine = jax.vmap(lambda D: ops.prolong(D, active_axes))(donors)
        sl = tuple(slice(2, fine.shape[2 + d] - 2) for d in range(3))
        return fine[(slice(None), slice(None)) + sl]

    return _chunked_map(body, (parent_slot, parent_off), chunk)


def _unblock(flat: jnp.ndarray, grid, tile) -> jnp.ndarray:
    """[G0*G1*G2, nc, *tile] block pool -> dense [nc, G0*t0, G1*t1, G2*t2]."""
    nc = flat.shape[1]
    b = flat.reshape(*grid, nc, *tile)
    b = jnp.moveaxis(b, (0, 1, 2), (1, 3, 5))
    return b.reshape(nc, grid[0] * tile[0], grid[1] * tile[1], grid[2] * tile[2])


def fine_faces_to_dense(F_restr: Dict[int, jnp.ndarray], meta: tp.TileMeta,
                        ng: Tuple[int, int, int]) -> Dict[int, jnp.ndarray]:
    """Assemble a DENSE coarse-level face-flux dict (padded face coords,
    `ops.restrict_face_flux` layout: interior faces [0..Xc] at slots
    [g..g+Xc], zero-padded ghost faces) from per-tile restricted child
    fluxes with faces [0..txc] inclusive.

    A face shared by two adjacent child tiles is computed identically by
    both (their ghost fills see the same data), so the hi-plane pass only
    fills faces the lo-side block scatter left untouched."""
    tsc = tuple(t // 2 for t in meta.tile_shape)   # tile size in coarse cells
    TX, TY, TZ = meta.tiles_shape                  # block grid == tile grid
    Xc = (TX * tsc[0], TY * tsc[1], TZ * tsc[2])
    ijk = meta.ijk[: meta.n_active]
    lin = jnp.asarray((ijk[:, 0] * TY + ijk[:, 1]) * TZ + ijk[:, 2])
    out = {}
    for d, F in F_restr.items():
        nc = F.shape[1]
        Fa = F[: meta.n_active]
        lead = (slice(None), slice(None))
        # (1) faces [0..tsc) of each tile -> block scatter -> dense
        lo_sl = [slice(None)] * 3
        lo_sl[d] = slice(0, tsc[d])
        flat = jnp.zeros((TX * TY * TZ, nc, *tsc), F.dtype)
        flat = flat.at[lin].set(Fa[lead + tuple(lo_sl)])
        dense_lo = _unblock(flat, (TX, TY, TZ), tsc)
        face_shape = list(Xc)
        face_shape[d] += 1
        full = jnp.zeros((nc, *face_shape), F.dtype)
        inner = [slice(None)] * 3
        inner[d] = slice(0, Xc[d])
        full = full.at[(slice(None),) + tuple(inner)].set(dense_lo)
        # (2) each tile's hi plane (face tsc) -> the +1 block's lo face on
        # a grid extended along d (so the hi domain-edge face survives,
        # matching restrict_face_flux's inclusive [0..Xc] slice)
        grid1 = [TX, TY, TZ]
        grid1[d] += 1
        plane = [tsc[0], tsc[1], tsc[2]]
        plane[d] = 1
        hi_sl = [slice(None)] * 3
        hi_sl[d] = slice(tsc[d], tsc[d] + 1)
        planes = jnp.zeros((grid1[0] * grid1[1] * grid1[2], nc, *plane), F.dtype)
        ijk1 = ijk.copy()
        ijk1[:, d] += 1
        lin1 = jnp.asarray(
            (ijk1[:, 0] * grid1[1] + ijk1[:, 1]) * grid1[2] + ijk1[:, 2]
        )
        planes = planes.at[lin1].set(Fa[lead + tuple(hi_sl)])
        pdense = _unblock(planes, tuple(grid1), tuple(plane))
        # (3) strided merge at face positions b*tsc[d]: keep the lo-side
        # value exactly where an ACTIVE tile's lo pass wrote one (an
        # explicit written mask -- a value sentinel would misread a
        # legitimately zero lo-side flux as "unwritten")
        stride = [slice(None)] * 3
        stride[d] = slice(0, Xc[d] + 1, tsc[d])
        cur = full[(slice(None),) + tuple(stride)]
        actg = jnp.zeros((TX * TY * TZ,), bool).at[lin].set(True)
        wrote = actg.reshape(TX, TY, TZ)
        for e in range(3):
            if e != d:
                wrote = jnp.repeat(wrote, tsc[e], axis=e)
        epad = [(0, 0)] * 3
        epad[d] = (0, 1)  # face Xc (b=TX) is never written by the lo pass
        wrote = jnp.pad(wrote, epad)
        full = full.at[(slice(None),) + tuple(stride)].set(
            jnp.where(wrote[None], cur, pdense)
        )
        # pad into coarse padded face coords like restrict_face_flux
        pad = [(0, 0)]
        for e in range(3):
            ge = ng[e]
            if e == d:
                pad.append((ge, max(ge - 1, 0)))
            else:
                pad.append((ge, ge))
        out[d] = jnp.pad(full, pad)
    return out
