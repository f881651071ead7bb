"""Sparse tile-pool AMR level representation.

The dense-mask hierarchy (`amr.hierarchy`) advances FULL-DOMAIN arrays per
level, so level L costs 8^L x the base grid everywhere -- the right trade
for shallow hierarchies that refine large volume fractions, but the
reference's own AMR benchmark (radhydro shell 256^3 + 2 levels,
``paper/strong_scaling.csv:2``, deck ``tests/radhydro_shell_amr.in``) and
deep Jeans-refinement runs (``src/problems/PopIII/popiii.cpp``) refine thin
shells / small cores, where dense levels exceed one chip's HBM.

This module is the TPU-native sparse alternative: per level, a
FIXED-CAPACITY POOL of FIXED-SHAPE tiles

    U_pool[T, nvar, tx, ty, tz]

with host-side integer metadata (tile coordinates, neighbor table, parent
linkage). It is the jax analog of AMReX's BoxArray+DistributionMapping
(reference ``src/simulation.hpp:1421-1508``): the tile list changes only
at regrid time (host-orchestrated, like the reference's regrid), array
shapes change only when the pool CAPACITY bucket grows, so recompiles are
amortized exactly like the dense design's.

Representation contract (mirrors the reference's patch semantics, NOT the
dense path's cell-mask semantics):

- A level's active region is the union of its tiles: refinement is
  tile-granular, the pool analog of AMReX's ``blocking_factor`` box
  granularity. Every cell of an allocated tile is active.
- Ghost zones are assembled per tile from (a) same-level neighbor tiles
  (26-direction gather -- faces, edges, corners, so diagonal-only
  adjacencies fill exactly like the dense composite), (b) limited-linear
  prolongation of parent data where no neighbor tile exists (the
  coarse-fine fill, reference `FillPatchWithData` lincc semantics), and
  (c) periodic wrap through the neighbor table.
- All inter-level transfers (backdrop donors, average-down, reflux
  assembly) are GATHERS (`jnp.take` + `lax.dynamic_slice`); nothing
  scatters, so sharding the tile axis over a device mesh turns them into
  plain collectives.

Numerical parity: on a hierarchy whose dense cell-mask is tile-granular,
the pool fill reproduces the dense composite fill bit-for-bit (same
prolongation arithmetic on the same values -- `ops.prolong` is applied to
donor blocks with a 1-coarse-cell slope margin), and the advance applies
the same flux kernels to the same ghost-filled values. The one deliberate
semantic difference is FOFC flagging: the dense path also flags
prolonged BACKDROP cells (whose faces abut active cells), while the pool
path flags only real tile cells -- the reference's behavior (redoFlag
lives on patch cells, ``src/QuokkaSimulation.hpp:1144-1184``).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from . import operators as ops

# 26 non-zero direction vectors, sorted for deterministic build order
DIRS = [
    (a, b, c)
    for a in (-1, 0, 1)
    for b in (-1, 0, 1)
    for c in (-1, 0, 1)
    if (a, b, c) != (0, 0, 0)
]


# process-wide regrid-epoch counter (see TileMeta.epoch)
_EPOCH_COUNTER = 0


@dataclass
class TileMeta:
    """Host-side tile bookkeeping for one pool level (one regrid epoch).

    `ijk[t]` is tile t's coordinate in tile units; slots >= n_active hold
    (-1,-1,-1). Device-side tables (`nbr_dev`, `origin_dev`) are uploaded
    once per regrid."""

    level_shape: Tuple[int, int, int]      # level domain extent in cells
    tile_shape: Tuple[int, int, int]
    periodic: Tuple[bool, bool, bool]
    capacity: int
    n_active: int
    ijk: np.ndarray                        # [capacity, 3] int32
    slot_of: Dict[Tuple[int, int, int], int] = field(default_factory=dict)
    nbr_dev: Optional[jnp.ndarray] = None  # [capacity, 26] int32
    origin_dev: Optional[jnp.ndarray] = None  # [capacity, 3] int32 (cells)
    # monotonic regrid-epoch id: jit caches that close over this meta's
    # host tables key on it (NOT on id(meta), which CPython can recycle)
    epoch: int = -1

    @property
    def tiles_shape(self) -> Tuple[int, int, int]:
        return tuple(self.level_shape[d] // self.tile_shape[d] for d in range(3))

    @property
    def cells_per_tile(self) -> int:
        return int(np.prod(self.tile_shape))

    @property
    def active_cells(self) -> int:
        return self.n_active * self.cells_per_tile

    @staticmethod
    def build(level_shape, tile_shape, tiles: Sequence[Tuple[int, int, int]],
              periodic, capacity: Optional[int] = None,
              headroom: float = 1.5) -> "TileMeta":
        level_shape = tuple(int(n) for n in level_shape)
        tile_shape = tuple(int(n) for n in tile_shape)
        for d in range(3):
            if level_shape[d] % tile_shape[d] != 0:
                raise ValueError(
                    f"tile_shape {tile_shape} does not divide level {level_shape}"
                )
        tiles = sorted(set(tuple(int(i) for i in t) for t in tiles))
        n = len(tiles)
        if capacity is None:
            capacity = max(8, int(np.ceil(n * headroom)))
        if capacity < n:
            raise ValueError(f"capacity {capacity} < {n} active tiles")
        ijk = np.full((capacity, 3), -1, dtype=np.int32)
        if n:
            ijk[:n] = np.asarray(tiles, dtype=np.int32)
        global _EPOCH_COUNTER
        _EPOCH_COUNTER += 1
        meta = TileMeta(
            level_shape=level_shape, tile_shape=tile_shape,
            periodic=tuple(bool(p) for p in periodic),
            capacity=capacity, n_active=n, ijk=ijk,
            slot_of={t: s for s, t in enumerate(tiles)},
            epoch=_EPOCH_COUNTER,
        )
        meta._build_tables()
        return meta

    def _build_tables(self):
        TX, TY, TZ = self.tiles_shape
        nbr = np.full((self.capacity, len(DIRS)), -1, dtype=np.int32)
        for s in range(self.n_active):
            i, j, k = (int(v) for v in self.ijk[s])
            for q, (a, b, c) in enumerate(DIRS):
                ii, jj, kk = i + a, j + b, k + c
                if self.periodic[0]:
                    ii %= TX
                if self.periodic[1]:
                    jj %= TY
                if self.periodic[2]:
                    kk %= TZ
                if not (0 <= ii < TX and 0 <= jj < TY and 0 <= kk < TZ):
                    continue
                nbr[s, q] = self.slot_of.get((ii, jj, kk), -1)
        self.nbr_dev = jnp.asarray(nbr)
        origin = self.ijk * np.asarray(self.tile_shape, dtype=np.int32)
        self.origin_dev = jnp.asarray(np.maximum(origin, 0).astype(np.int32))

    def grow_capacity(self, n_needed: int, headroom: float = 1.5) -> int:
        """Capacity bucket for n_needed tiles: grow by `headroom` so the
        jitted pool programs recompile only on bucket changes."""
        if n_needed <= self.capacity:
            return self.capacity
        return max(int(np.ceil(n_needed * headroom)), self.capacity + 1)


# --------------------------------------------------------------------- slicing
def _region(tile_shape, g, d3):
    """(src, dst) index tuples for direction d3 = (a,b,c): src slices the
    NEIGHBOR tile's interior, dst the padded array's ghost region."""
    src, dst = [], []
    for d, a in enumerate(d3):
        t = tile_shape[d]
        if a == 0:
            src.append(slice(0, t))
            dst.append(slice(g, g + t))
        elif a > 0:  # neighbor at +1 supplies my hi ghosts from its lo edge
            src.append(slice(0, g))
            dst.append(slice(g + t, 2 * g + t))
        else:        # neighbor at -1 supplies my lo ghosts from its hi edge
            src.append(slice(t - g, t))
            dst.append(slice(0, g))
    return tuple(src), tuple(dst)


import os as _os

# Above this many slab bytes, `slice_slabs` returns a LAZY handle and the
# ghost assembly gathers whole neighbor tiles per chunk instead (then
# statically slices the slab region). Slabs are materialized FLAT
# ([T, prod] 2D arrays) so TPU lane tiling cannot pad the short minor
# dims: measured on v5e at benchmark scale (1216x32^3 tiles), building
# all 26 flat slabs costs 0.63 GB temp + 0.95x the pool in output, while
# the previous 5D slab pools lane-padded several-fold and the lazy
# vmapped-dynamic_slice path forced a transposed full-pool relayout copy
# (f32[1216,10,32,32,32]{1,0,4,3,2} -> 20.4 GB, an HBM OOM at compile).
_SLAB_MAX_BYTES = int(
    _os.environ.get("QUOKKA_POOL_SLAB_MAX_BYTES", str(4096 * 1024 * 1024))
)


def _slab_bytes(U_pool: jnp.ndarray, g: int) -> int:
    ts = U_pool.shape[2:]
    cells = 0
    for d3 in DIRS:
        n = 1
        for d, a in enumerate(d3):
            n *= ts[d] if a == 0 else g
        cells += n
    return U_pool.shape[0] * U_pool.shape[1] * cells * U_pool.dtype.itemsize


def slice_slabs(U_pool: jnp.ndarray, g: int):
    """The 26 neighbor-edge slab pools the ghost assembly gathers from
    (pre-sliced once per fill so chunked assembly reuses them), stored
    FLAT as [T, prod] so TPU lane tiling cannot pad the short slab dims.
    Above `QUOKKA_POOL_SLAB_MAX_BYTES` this returns a lazy handle instead
    and `assemble_padded` gathers whole neighbor tiles per chunk directly
    from the pool (identical values, no full-pool slab arrays)."""
    if _slab_bytes(U_pool, g) > _SLAB_MAX_BYTES:
        return ("lazy", U_pool, g)
    lead = (slice(None), slice(None))
    ts = U_pool.shape[2:]
    T = U_pool.shape[0]
    return tuple(
        U_pool[lead + _region(ts, g, d3)[0]].reshape(T, -1) for d3 in DIRS
    )


def gather_slab(U_pool: jnp.ndarray, rows: jnp.ndarray, d3, g: int):
    """Direction-d3 edge slab of tiles `rows` in the lazy (huge-pool)
    regime: gather the whole neighbor tiles through a flattened trailing
    view (a plain HBM row gather -- see `take_tiles`), then statically
    slice the slab region. Reads chunk x tile bytes from HBM rather than
    only the slab bytes, but never forces a full-pool relayout copy (the
    previous vmapped-dynamic_slice formulation made XLA:TPU copy the pool
    into a transposed layout with nvar lane-minor, padding 10 -> 128 and
    OOMing HBM at benchmark scale). Bitwise-equal to
    `take_tiles(slice_slabs(U)[q], rows)`."""
    ts = U_pool.shape[2:]
    src, _ = _region(ts, g, d3)
    tiles = take_tiles(U_pool, rows)
    return tiles[(slice(None), slice(None)) + src]


def take_tiles(X: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Row gather along the tile axis through a FLATTENED trailing view.
    A direct `jnp.take` on [T, nv, sx, sy, sz] slabs with tiny minor dims
    makes XLA:TPU stage the fused pad+clamp+gather through scoped VMEM
    (observed: 30M scoped alloc vs the 16M limit on a z-edge slab);
    gathering [T, prod] rows keeps it a plain HBM dynamic-gather."""
    flat = X.reshape(X.shape[0], -1)
    return jnp.take(flat, idx, axis=0).reshape(idx.shape[0], *X.shape[1:])


def assemble_padded(U_tiles: jnp.ndarray, nbr_rows: jnp.ndarray,
                    backdrop: jnp.ndarray, slabs, g: int) -> jnp.ndarray:
    """Ghost assembly for a (sub)set of tiles: interior = tile data, 26
    ghost regions = neighbor slab gathers where the neighbor exists, else
    the `backdrop` value. `slabs` = `slice_slabs` of the FULL pool (the
    neighbor table indexes the full pool)."""
    T = U_tiles.shape[0]
    nv = U_tiles.shape[1]
    ts = U_tiles.shape[2:]
    lazy = isinstance(slabs, tuple) and len(slabs) == 3 and slabs[0] == "lazy"
    lead = (slice(None), slice(None))
    out = backdrop
    ctr = tuple(slice(g, g + t) for t in ts)
    out = out.at[lead + ctr].set(U_tiles)
    for q, d3 in enumerate(DIRS):
        src, dst = _region(ts, g, d3)
        idx = nbr_rows[:, q]
        if lazy:
            gathered = gather_slab(slabs[1], jnp.maximum(idx, 0), d3,
                                   slabs[2])
        else:
            sh = tuple(s.stop - s.start for s in src)
            gathered = take_tiles(slabs[q], jnp.maximum(idx, 0)).reshape(
                T, nv, *sh
            )
        ok = (idx >= 0).reshape(T, 1, 1, 1, 1)
        out = out.at[lead + dst].set(
            jnp.where(ok, gathered, out[lead + dst])
        )
    return out


def fill_pool_ghosts(U_pool: jnp.ndarray, nbr: jnp.ndarray,
                     backdrop: jnp.ndarray, g: int) -> jnp.ndarray:
    """Assemble ghost-padded tiles [T, nvar, tx+2g, ty+2g, tz+2g].

    Interior = tile data; each of the 26 ghost regions = the corresponding
    neighbor tile's edge data where the neighbor exists, else the
    `backdrop` (prolonged parent data) value. Matches the dense composite
    `where(covered, fine, prolong(coarse))` cell-for-cell because tile
    coverage IS the level's active region."""
    return assemble_padded(U_pool, nbr, backdrop, slice_slabs(U_pool, g), g)


def fill_pool_ghosts_like(U_pool, nbr, g, fill_value=0.0):
    """Ghost fill with a constant backdrop (masks, flags): neighbor data
    where tiles exist, `fill_value` elsewhere."""
    T = U_pool.shape[0]
    padded_shape = (
        (T,) + U_pool.shape[1:2]
        + tuple(t + 2 * g for t in U_pool.shape[2:])
    )
    backdrop = jnp.full(padded_shape, fill_value, dtype=U_pool.dtype)
    return fill_pool_ghosts(U_pool, nbr, backdrop, g)


# ------------------------------------------------------------------- backdrop
def donor_halo(g: int) -> int:
    """Coarse halo for the prolongation donor block: g/2 coarse cells under
    the fine ghosts, +1 so the MC slopes / multi-D limiter of every used
    coarse cell see their real +-1 neighborhood."""
    return g // 2 + 1


def make_backdrop_from_dense(parent_padded: jnp.ndarray,
                             origin_dev: jnp.ndarray,
                             tile_shape, g: int, gp: int,
                             active_axes) -> jnp.ndarray:
    """Prolonged-parent backdrop for every tile from a DENSE (full-domain)
    ghost-padded parent array [nvar, X+2gp, Y+2gp, Z+2gp].

    origin_dev: [T,3] tile origins in FINE cells. Requires gp >= donor
    halo. Bitwise-equal to slicing `ops.prolong(parent_full)` because the
    donor block carries every coarse cell the used slopes/limits read."""
    hc = donor_halo(g)
    if gp < hc:
        raise ValueError(f"parent ghost width {gp} < donor halo {hc}")
    nv = parent_padded.shape[0]
    sizes = (nv,) + tuple(t // 2 + 2 * hc for t in tile_shape)

    def donor(o):
        z = jnp.zeros((), o.dtype)
        start = (z,) + tuple(o[d] // 2 - hc + gp for d in range(3))
        return lax.dynamic_slice(parent_padded, start, sizes)

    donors = jax.vmap(donor)(origin_dev)
    fine = jax.vmap(lambda D: ops.prolong(D, active_axes))(donors)
    crop = 2 * hc - g
    sl = tuple(slice(crop, fine.shape[2 + d] - crop) for d in range(3))
    return fine[(slice(None), slice(None)) + sl]


def make_backdrop_from_pool(parent_padded_pool: jnp.ndarray,
                            parent_slot: jnp.ndarray,
                            parent_off: jnp.ndarray,
                            tile_shape, g: int, gp: int,
                            active_axes) -> jnp.ndarray:
    """Same, from a POOL parent's ghost-padded tiles
    [Tp, nvar, ptx+2gp, ...]. parent_off[t] = the tile's coarse-image cell
    offset inside its parent tile (0 or ptx/2 per axis)."""
    hc = donor_halo(g)
    if gp < hc:
        raise ValueError(f"parent ghost width {gp} < donor halo {hc}")
    nv = parent_padded_pool.shape[1]
    sizes = (nv,) + tuple(t // 2 + 2 * hc for t in tile_shape)

    def donor(slot, off):
        tile = parent_padded_pool[jnp.maximum(slot, 0)]
        z = jnp.zeros((), off.dtype)
        start = (z,) + tuple(off[d] - hc + gp for d in range(3))
        return lax.dynamic_slice(tile, start, sizes)

    donors = jax.vmap(donor)(parent_slot, parent_off)
    fine = jax.vmap(lambda D: ops.prolong(D, active_axes))(donors)
    crop = 2 * hc - g
    sl = tuple(slice(crop, fine.shape[2 + d] - crop) for d in range(3))
    return fine[(slice(None), slice(None)) + sl]


# ---------------------------------------------------------- dense <-> pool
def gather_tiles_from_dense(U_dense: jnp.ndarray, origin_dev: jnp.ndarray,
                            tile_shape) -> jnp.ndarray:
    """Extract pool tiles [T, nvar, tx,ty,tz] from a dense level array."""
    nv = U_dense.shape[0]
    sizes = (nv,) + tuple(tile_shape)

    def pick(o):
        z = jnp.zeros((), o.dtype)
        return lax.dynamic_slice(U_dense, (z, o[0], o[1], o[2]), sizes)

    return jax.vmap(pick)(origin_dev)


def scatter_tiles_to_dense(U_dense: jnp.ndarray, U_pool: jnp.ndarray,
                           meta: TileMeta) -> jnp.ndarray:
    """Write pool tiles back into a dense level array (covered blocks
    only). Tiles are disjoint, so a block-space scatter is exact."""
    nv = U_dense.shape[0]
    tx, ty, tz = meta.tile_shape
    TX, TY, TZ = meta.tiles_shape
    blocks = U_dense.reshape(nv, TX, tx, TY, ty, TZ, tz)
    blocks = jnp.moveaxis(blocks, (1, 3, 5), (0, 1, 2))  # [TX,TY,TZ,nv,tx,ty,tz]
    flat = blocks.reshape(TX * TY * TZ, nv, tx, ty, tz)
    ijk = meta.ijk[: meta.n_active]
    lin = (ijk[:, 0] * TY + ijk[:, 1]) * TZ + ijk[:, 2]
    flat = flat.at[jnp.asarray(lin)].set(U_pool[: meta.n_active])
    blocks = flat.reshape(TX, TY, TZ, nv, tx, ty, tz)
    blocks = jnp.moveaxis(blocks, (0, 1, 2), (1, 3, 5))
    return blocks.reshape(U_dense.shape)


def pool_to_dense(U_pool: jnp.ndarray, meta: TileMeta, fill=0.0) -> jnp.ndarray:
    """Materialize a dense level array (fill where uncovered) -- output /
    diagnostics only, never on the advance path."""
    nv = U_pool.shape[1]
    dense = jnp.full((nv,) + meta.level_shape, fill, dtype=U_pool.dtype)
    return scatter_tiles_to_dense(dense, U_pool, meta)


def coverage_mask_dense(meta: TileMeta) -> jnp.ndarray:
    """Dense bool mask of the pool's covered cells (tile-granular)."""
    TX, TY, TZ = meta.tiles_shape
    cov = np.zeros((TX, TY, TZ), dtype=bool)
    ijk = meta.ijk[: meta.n_active]
    if len(ijk):
        cov[ijk[:, 0], ijk[:, 1], ijk[:, 2]] = True
    out = jnp.asarray(cov)
    for d, t in enumerate(meta.tile_shape):
        out = jnp.repeat(out, t, axis=d)
    return out


# ------------------------------------------------------------- parent linkage
def parent_linkage(meta: TileMeta, parent_meta: Optional[TileMeta]):
    """(parent_slot [T], parent_off [T,3]) device arrays for a pool level
    whose parent is also a pool. Each fine tile's coarse image is one
    octant of exactly one parent tile (equal tile shapes, ratio 2)."""
    if parent_meta is None:
        return None, None
    ps = np.full(meta.capacity, -1, dtype=np.int32)
    po = np.zeros((meta.capacity, 3), dtype=np.int32)
    for s in range(meta.n_active):
        i, j, k = (int(v) for v in meta.ijk[s])
        pt = (i // 2, j // 2, k // 2)
        slot = parent_meta.slot_of.get(pt, -1)
        if slot < 0:
            raise ValueError(
                f"fine tile {(i, j, k)} not nested in parent coverage"
            )
        ps[s] = slot
        po[s] = [
            (i % 2) * (meta.tile_shape[0] // 2),
            (j % 2) * (meta.tile_shape[1] // 2),
            (k % 2) * (meta.tile_shape[2] // 2),
        ]
    return jnp.asarray(ps), jnp.asarray(po)


def child_linkage(parent_meta: TileMeta, child_meta: TileMeta) -> jnp.ndarray:
    """child_slots [Tp, 2, 2, 2]: the child-pool slot covering each octant
    of each parent tile (-1 = unrefined). Drives average-down and the
    fine side of refluxing as pure gathers."""
    cs = np.full((parent_meta.capacity, 2, 2, 2), -1, dtype=np.int32)
    for s in range(parent_meta.n_active):
        i, j, k = (int(v) for v in parent_meta.ijk[s])
        for a in range(2):
            for b in range(2):
                for c in range(2):
                    cs[s, a, b, c] = child_meta.slot_of.get(
                        (2 * i + a, 2 * j + b, 2 * k + c), -1
                    )
    return jnp.asarray(cs)


# -------------------------------------------------------------- average-down
def average_down_into_pool(U_parent: jnp.ndarray, U_child: jnp.ndarray,
                           child_slots: jnp.ndarray, active_axes) -> jnp.ndarray:
    """Parent pool tiles overwritten with restricted child data where
    covered (reference `AverageDownTo`). Pure gather: each parent tile
    assembles its 2^3 octants from restricted child tiles."""
    restr = jax.vmap(lambda u: ops.restrict(u, active_axes))(U_child)
    tx2 = restr.shape[2]
    ty2 = restr.shape[3]
    tz2 = restr.shape[4]

    def assemble(p_tile, cs):
        rows = []
        for a in range(2):
            cols = []
            for b in range(2):
                zs = []
                for c in range(2):
                    idx = cs[a, b, c]
                    oct_par = lax.dynamic_slice(
                        p_tile, (0, a * tx2, b * ty2, c * tz2),
                        (p_tile.shape[0], tx2, ty2, tz2),
                    )
                    got = restr[jnp.maximum(idx, 0)]
                    zs.append(jnp.where(idx >= 0, got, oct_par))
                cols.append(jnp.concatenate(zs, axis=3))
            rows.append(jnp.concatenate(cols, axis=2))
        return jnp.concatenate(rows, axis=1)

    return jax.vmap(assemble)(U_parent, child_slots)


def assemble_children_faces(F_child_restr: Dict[int, jnp.ndarray],
                            child_slots: jnp.ndarray,
                            parent_nbr: jnp.ndarray,
                            tile_shape) -> Dict[int, jnp.ndarray]:
    """Per parent tile, the restricted time-averaged child fluxes on parent
    faces [Tp, nc, (tx+1) x ty x tz along d], zero where no child. Faces on
    the parent-tile boundary are completed from the face-neighbor parent's
    assembly (each physical face is written by the children of exactly one
    side when it is a coarse-fine boundary; when children exist on both
    sides the face is interior to the fine level and the reflux mask
    ignores it, so the unconditional sum is safe).

    F_child_restr[d]: [Tc, nc, ...] child fluxes restricted to parent
    resolution, faces [0..tx/2] inclusive along d."""
    tx, ty, tz = tile_shape
    half = (tx // 2, ty // 2, tz // 2)
    out = {}
    Tp = child_slots.shape[0]
    for d, Fc in F_child_restr.items():
        nc = Fc.shape[1]
        shape = [tx, ty, tz]
        shape[d] += 1
        F = jnp.zeros((Tp, nc, *shape), Fc.dtype)

        def place(cs):
            tile = jnp.zeros((nc, *shape), Fc.dtype)
            for a in range(2):
                for b in range(2):
                    for c in range(2):
                        idx = cs[a, b, c]
                        val = jnp.where(idx >= 0, Fc[jnp.maximum(idx, 0)], 0.0)
                        oct_shape = list(half)
                        oct_shape[d] += 1
                        start = [a * half[0], b * half[1], c * half[2]]
                        # octant faces overlap at the tile midplane along d:
                        # add (one side is zero except on interior fine
                        # faces, where the value is unused by the reflux)
                        region = tuple(
                            slice(start[e], start[e] + oct_shape[e])
                            for e in range(3)
                        )
                        cur = tile[(slice(None),) + region]
                        tile = tile.at[(slice(None),) + region].set(cur + val)
            return tile

        F = jax.vmap(place)(child_slots)
        # complete shared faces at the parent-tile boundary from the
        # face-neighbor's assembly
        qlo = DIRS.index(tuple(-1 if e == d else 0 for e in range(3)))
        qhi = DIRS.index(tuple(1 if e == d else 0 for e in range(3)))
        nlo, nhi = parent_nbr[:, qlo], parent_nbr[:, qhi]
        lead = (slice(None), slice(None))
        lo_face = tuple(
            slice(0, 1) if e == d else slice(None) for e in range(3)
        )
        hi_face = tuple(
            slice(shape[e] - 1, shape[e]) if e == d else slice(None)
            for e in range(3)
        )
        from_lo = jnp.where(
            (nlo >= 0).reshape(-1, 1, 1, 1, 1),
            jnp.take(F[lead + hi_face], jnp.maximum(nlo, 0), axis=0), 0.0,
        )
        from_hi = jnp.where(
            (nhi >= 0).reshape(-1, 1, 1, 1, 1),
            jnp.take(F[lead + lo_face], jnp.maximum(nhi, 0), axis=0), 0.0,
        )
        F = F.at[lead + lo_face].add(from_lo)
        F = F.at[lead + hi_face].add(from_hi)
        out[d] = F
    return out


def octant_coverage(child_slots: jnp.ndarray) -> jnp.ndarray:
    """[Tp, 2, 2, 2] bool: which octants of each parent tile are refined."""
    return child_slots >= 0


def coverage_cells(child_slots: jnp.ndarray, tile_shape) -> jnp.ndarray:
    """Cellwise covered mask per parent tile [Tp, tx, ty, tz] from octant
    coverage (tile-granular refinement: whole octants)."""
    cov = octant_coverage(child_slots)
    out = cov
    for d, t in enumerate(tile_shape):
        out = jnp.repeat(out, t // 2, axis=1 + d)
    return out
