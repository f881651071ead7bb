"""Lane-packed tile storage + streamed fused engine for HUGE pool levels.

The reference's AMR benchmark (radhydro shell 256^3 + 2 levels,
``/root/reference/tests/radhydro_shell_amr.in``,
``paper/strong_scaling.csv:2``) puts ~4.8k 32^3 tiles x 10 components on
the finest level: ~7 GB of f32 state on a 16 GB chip. At that scale the
standard pool paths are impossible on one chip:

- XLA's gather/dynamic-slice lowerings on ``[T, nvar, tx, ty, tz]`` pools
  force a full-pool relayout copy per program (measured on v5e: 1.6-6.4 GB
  temps; one transposed layout padded nvar 10 -> 128 lanes = 20.4 GB OOM).
- The two-pass RK2 holds THREE pool states at stage 2 (U0 for the fills,
  U1 for the stage-2 fluxes, U2 being built) -- 21+ GB.
- ``lax.map`` stacks whole-pool chunk outputs with a lane-minor tile axis
  (4x padding).

This module is the TPU-native answer, used for LEAF pool levels above a
byte threshold (``amr.pool_packed_min_bytes``):

1. **Lane-packed storage** ``[cap, nvar*tx*ty*tz // 128, 128]``: the
   (8,128) TPU tiling applies to the minor two dims with zero padding and
   row slicing on the tile axis is tiling-free.
2. **Pallas DMA row gather** (`row_gather`): arbitrary tile rows are
   copied HBM->HBM by explicit async DMAs -- zero relayout temp, reads
   only the requested rows (measured: temp = 0.0 GB at benchmark scale,
   bitwise-equal to ``jnp.take``).
3. **Fused single-pass RK2** (`fused_block_rk2`): stage 1 is recomputed
   per chunk on a (2g+2)-deep ghost block instead of materializing the U1
   pool, so a substep holds TWO pool states (old + new), not three. The
   halo algebra keeps every value bitwise-equal to the two-pass/global
   path: stage-1 FOFC flags are computable through depth g+2 (every face
   affecting a cell the stage-2 stencil reads), and stage-2 FOFC flags
   through the +-1 ring, so the masked blends see exactly the flags the
   owning tiles would compute.
4. **Host-streamed chunk loop with donated writes** (`stream_rows`): chunk
   outputs are written into the preallocated packed result with donated
   ``dynamic_update_slice`` -- no stacked map output ever exists.

Reference semantics: RK2-SSP with time-averaged fluxes applied to the old
state, FOFC first-order blending on faces adjacent to flagged cells, PdV
internal-energy source from the stage-1 filled state
(``src/QuokkaSimulation.hpp:1144-1369``, ``src/hydro/hydro_system.hpp``).
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
import os

from ..hydro import euler
from ..hydro.advance import (
    HydroOptions,
    _blend_fofc,
    add_internal_energy_pdv,
    compute_fluxes,
    rhs_from_fluxes,
)
from . import tilepool as tp

LANE = 128

# throttle the host-streamed chunk loops: without a periodic host sync
# the runtime reserves many queued chunk programs' arenas concurrently,
# which shows up as nondeterministic RESOURCE_EXHAUSTED at benchmark
# scale; syncing every N chunks bounds in-flight arenas. 0 disables.
_SYNC_CHUNKS = int(os.environ.get("QUOKKA_PACKED_SYNC_CHUNKS", "8"))
_DEBUG = os.environ.get("QUOKKA_PACKED_DEBUG", "0") == "1"


def _throttle(ci, x):
    if _SYNC_CHUNKS and (ci + 1) % _SYNC_CHUNKS == 0:
        jax.block_until_ready(x)
        if _DEBUG:
            import sys as _sys

            tot = sum(a.nbytes for a in jax.live_arrays())
            print(f"[packed] chunk {ci} ok, live {tot/2**30:.2f}G",
                  file=_sys.stderr, flush=True)


# ------------------------------------------------------------------ packing
def pack(x: jnp.ndarray) -> jnp.ndarray:
    """[n, nv, tx, ty, tz] -> [n, prod // 128, 128] (row bytes must be a
    lane multiple; 32^3 and 16^3 tiles always are)."""
    n = x.shape[0]
    return x.reshape(n, -1, LANE)


def unpack(xp: jnp.ndarray, nv: int, ts) -> jnp.ndarray:
    return xp.reshape(xp.shape[0], nv, *ts)


def packed_shape(cap: int, nv: int, ts) -> Tuple[int, int, int]:
    prod = nv * int(np.prod(ts))
    if prod % LANE:
        raise ValueError(f"tile row size {prod} not a multiple of {LANE}")
    return (cap, prod // LANE, LANE)


def _use_pallas_gather() -> bool:
    return jax.default_backend() not in ("cpu",)


def row_gather(Up: jnp.ndarray, rows: jnp.ndarray) -> jnp.ndarray:
    """Gather packed rows [n, L, 128] by index. On TPU this is a Pallas
    DMA kernel (no full-pool relayout; reads only the requested rows); on
    CPU a plain take (bitwise-identical -- DMAs copy bytes)."""
    if not _use_pallas_gather():
        return jnp.take(Up, rows, axis=0)
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = rows.shape[0]
    # DMA semaphores live in a tiny dedicated memory (2 KB sflag space on
    # v5e, ~512 slots); a big gather (benchmark-scale pools run n ~ 10^3
    # rows) must RING a bounded pool: slot r % S is reclaimed by waiting
    # on DMA r - S before DMA r starts. Up to S copies stay in flight.
    S = min(n, 256)

    def gk(idx_ref, src_ref, out_ref, sems):
        # explicit i32 for BOTH DMA slice indices: under jax_enable_x64
        # the SMEM scalar load widens to i64 AND a bare python-int
        # constant index traces as i64 -- tpu.memref_slice rejects either
        def row(r):
            return lax.convert_element_type(idx_ref[r], jnp.int32)

        def copy(r):
            return pltpu.make_async_copy(
                src_ref.at[row(r)], out_ref.at[jnp.int32(r)],
                sems.at[jnp.int32(r % S)],
            )

        for r in range(n):
            if r >= S:
                copy(r - S).wait()
            copy(r).start()
        for r in range(max(0, n - S), n):
            copy(r).wait()

    return pl.pallas_call(
        gk,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(1,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            scratch_shapes=[pltpu.SemaphoreType.DMA((S,))],
        ),
        out_shape=jax.ShapeDtypeStruct((n,) + Up.shape[1:], Up.dtype),
    )(rows.astype(jnp.int32), Up)


def row_slice(Up: jnp.ndarray, i0, n: int) -> jnp.ndarray:
    """Contiguous packed-row slice (tiling-free dynamic_slice)."""
    z = jnp.zeros((), jnp.int32)
    return lax.dynamic_slice(
        Up, (jnp.asarray(i0, jnp.int32), z, z), (n,) + Up.shape[1:]
    )


def make_row_writer(ndim: int = 3):
    """Jitted donated packed-row writer: write(buf, rows_data, i0)."""
    return jax.jit(
        lambda buf, data, i0: lax.dynamic_update_slice(
            buf, data,
            (jnp.asarray(i0, jnp.int32),)
            + (jnp.zeros((), jnp.int32),) * (ndim - 1),
        ),
        donate_argnums=0,
    )


# ----------------------------------------------------------- ghost assembly
def assemble_chunk(Up: jnp.ndarray, i0, chunk: int, nbr_c: jnp.ndarray,
                   backdrop: jnp.ndarray, gf: int, nv: int, ts) -> jnp.ndarray:
    """Ghost-padded 5D chunk [chunk, nv, ts+2gf, ...] from a packed pool.

    Interior = the contiguous row slice at i0 (pools are built with
    row-major tile order, so a chunk's own rows are contiguous); each of
    the 26 ghost regions = the neighbor row's edge data where the neighbor
    exists (ONE fused row gather for all 26 x chunk rows), else the
    `backdrop` value. Bitwise-equal to `tilepool.fill_pool_ghosts` on the
    unpacked pool: DMA copies bytes and the region algebra is shared."""
    own = unpack(row_slice(Up, i0, chunk), nv, ts)
    lead = (slice(None), slice(None))
    ctr = tuple(slice(gf, gf + t) for t in ts)
    out = backdrop.at[lead + ctr].set(own)
    idx = nbr_c.reshape(-1)  # [chunk * 26]
    nb = unpack(row_gather(Up, jnp.maximum(idx, 0)), nv, ts)
    nb = nb.reshape(chunk, len(tp.DIRS), nv, *ts)
    for q, d3 in enumerate(tp.DIRS):
        src, dst = tp._region(ts, gf, d3)
        ok = (nbr_c[:, q] >= 0).reshape(chunk, 1, 1, 1, 1)
        val = nb[:, q][lead + src]
        out = out.at[lead + dst].set(
            jnp.where(ok, val, out[lead + dst])
        )
    return out


def ring_real_mask(nbr_c: jnp.ndarray, ts, gf: int) -> jnp.ndarray:
    """[chunk, ts+2gf, ...] bool: True on the interior and on ghost-ring
    regions whose neighbor tile exists (these cells carry REAL tile data
    after assembly; everything else is prolonged backdrop, which the
    reference's redo flags never cover)."""
    chunk = nbr_c.shape[0]
    blk = tuple(t + 2 * gf for t in ts)
    m = jnp.zeros((chunk, 1) + blk, bool)
    ctr = tuple(slice(gf, gf + t) for t in ts)
    lead = (slice(None), slice(None))
    m = m.at[lead + ctr].set(True)
    for q, d3 in enumerate(tp.DIRS):
        _, dst = tp._region(ts, gf, d3)
        ok = (nbr_c[:, q] >= 0).reshape(chunk, 1, 1, 1, 1)
        m = m.at[lead + dst].set(ok)
    return m[:, 0]


def overlay_backdrop(U1: jnp.ndarray, nbr_c: jnp.ndarray,
                     bd: jnp.ndarray, gf: int, ts) -> jnp.ndarray:
    """Replace U1's ghost-ring regions that have NO neighbor tile with the
    stage-2 parent backdrop `bd` (the two-pass path's FillPatcher
    semantics: stage-2 ghosts are neighbor U1 data where a neighbor
    exists, else parent data lerped to the stage-2 time)."""
    lead = (slice(None), slice(None))
    out = U1
    for q, d3 in enumerate(tp.DIRS):
        _, dst = tp._region(ts, gf, d3)
        ok = (nbr_c[:, q] >= 0).reshape(nbr_c.shape[0], 1, 1, 1, 1)
        out = out.at[lead + dst].set(
            jnp.where(ok, out[lead + dst], bd[lead + dst])
        )
    return out


# ------------------------------------------------------------- fused RK2
def _crop(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """Crop k cells from each side of the trailing 3 spatial dims."""
    if k == 0:
        return x
    sl = (slice(None),) * (x.ndim - 3) + (slice(k, -k),) * 3
    return x[sl]


def _crop_tree(tree, k: int):
    return jax.tree_util.tree_map(lambda x: _crop(x, k), tree)


def _embed_mask(m: jnp.ndarray, k: int) -> jnp.ndarray:
    """Pad a [*, X, Y, Z] bool mask with k False cells per side."""
    padw = [(0, 0)] * (m.ndim - 3) + [(k, k)] * 3
    return jnp.pad(m, padw)


def fused_block_rk2(u_c, ug0, bd2, nbr_c, dt, opts: HydroOptions,
                    with_own: bool, active_axes) -> Tuple:
    """Fused single-pass RK2-SSP on one ghost-padded chunk.

    u_c:  [c, nv, *ts]           the chunk's own tiles (old state)
    ug0:  [c, nv, ts+2P, ...]    stage-1 fill, P = 2g+2
    bd2:  [c, nv, ts+2gov, ...]  stage-2 parent backdrop, gov = g+2
    nbr_c:[c, 26]                neighbor rows (for real-cell masks)

    Returns (U2 [c, nv, *ts], faces_own | None, faces_restr, n_fofc).
    Bitwise-equal to the dense/two-pass path (see module docstring): the
    flag halo algebra provides every FOFC flag that can influence a cell
    of the tile, and all per-cell ops are deterministic elementwise."""
    g = opts.nghost
    P = 2 * g + 2
    gov = g + 2
    eos = opts.eos
    ts = u_c.shape[2:]
    ng3 = (g, g, g)
    vm = jax.vmap

    def fx(ug, fo=False):
        return vm(lambda x: compute_fluxes(x, opts, fo))(ug)

    def upd(ug, fl, fv, m):
        """u_inner + dt * rhs over the g-interior of ug's coords."""
        def one(ugi, fls, fvs, mi):
            rhs = rhs_from_fluxes(fls, opts)
            rhs = add_internal_energy_pdv(rhs, ugi, fvs, opts, mi)
            from ..stencil import interior as _int
            return _crop(ugi, g) + dt * _int(rhs, ng3)

        if m is None:
            return vm(lambda a, b, c: one(a, b, c, None))(ug, fl, fv)
        return vm(one)(ug, fl, fv, m)

    def finalize(Up):
        Up = vm(
            lambda u: euler.enforce_limits(
                u, eos, opts.density_floor, opts.temperature_floor,
                opts.n_scalars,
            )
        )(Up)
        if opts.use_dual_energy and not eos.is_isothermal:
            Up = vm(euler.sync_dual_energy)(Up)
        return Up

    real_ov = ring_real_mask(nbr_c, ts, gov)
    real_1 = ring_real_mask(nbr_c, ts, 1)

    # ---- stage 1 on the full P-padded block
    fl1, fv1 = fx(ug0)
    U1 = upd(ug0, fl1, fv1, None)  # [c, nv, ts+2gov, ...]
    redo1 = vm(lambda u: jnp.logical_not(euler.is_state_valid(u, eos)))(U1)
    redo1 = jnp.logical_and(redo1, real_ov)
    n1 = jnp.sum(redo1)

    def s1_blend(_):
        fo_fl, fo_fv = fx(ug0, True)
        mP = _embed_mask(redo1, P - gov)  # -> [c, ts+2P, ...]
        flb, fvb = vm(
            lambda a, b, c_, d, m: _blend_fofc(a, b, c_, d, m, opts)
        )(fl1, fv1, fo_fl, fo_fv, mP)
        U1b = upd(ug0, flb, fvb, mP)
        return U1b, _crop_tree(flb, g), _crop_tree(fvb, g)

    def s1_clean(_):
        return U1, _crop_tree(fl1, g), _crop_tree(fv1, g)

    U1, fl1c, fv1c = lax.cond(jnp.any(redo1), s1_blend, s1_clean, None)
    U1 = finalize(U1)
    U1 = overlay_backdrop(U1, nbr_c, bd2, gov, ts)

    # ---- stage 2: time-averaged flux applied to U0 (Heun / RK2-SSP)
    ug0c = _crop(ug0, g)  # [c, nv, ts+2gov, ...] (PdV pressures, FO fluxes)
    fl2, fv2 = fx(U1)
    flA = {d: 0.5 * (fl1c[d] + fl2[d]) for d in fl2}
    fvA = {d: 0.5 * (fv1c[d] + fv2[d]) for d in fv2}
    U2w = upd(ug0c, flA, fvA, None)  # wide: [c, nv, ts+2, ...] valid ring 1
    # (upd crops g from gov coords -> ghost width gov - g = 2; the valid
    # ring is 1 -- the outermost cell's faces lack stage-2 stencil data,
    # but only the +-1 ring feeds the FOFC flags below)
    U2r = _crop(U2w, 1)  # [c, nv, ts+2, ...] -> ring-1 block
    redo2 = vm(lambda u: jnp.logical_not(euler.is_state_valid(u, eos)))(U2r)
    redo2 = jnp.logical_and(redo2, real_1)
    n2 = jnp.sum(redo2)

    def s2_blend(_):
        fo_fl, fo_fv = fx(ug0c, True)
        m2 = _embed_mask(redo2, gov - 1)  # -> gov coords
        flb, fvb = vm(
            lambda a, b, c_, d, m: _blend_fofc(a, b, c_, d, m, opts)
        )(flA, fvA, fo_fl, fo_fv, m2)
        U2b = upd(ug0c, flb, fvb, m2)
        return _crop(U2b, 2), flb, fvb

    def s2_clean(_):
        return _crop(U2w, 2), flA, fvA

    U2, flF, fvF = lax.cond(jnp.any(redo2), s2_blend, s2_clean, None)
    U2 = finalize(U2)

    # faces for refluxing: final (post-FOFC) time-averaged fluxes on the
    # tile's own faces [0..t] (gov coords -> pass gov as the ghost width)
    from .pool_advance import restrict_tile_faces, slice_tile_faces

    own = slice_tile_faces(flF, gov, ts)
    restr = restrict_tile_faces(own, active_axes)
    if not with_own:
        own = None
    return U2, own, restr, n1 + n2



# ------------------------------------------------- parent backdrop providers
def donor_pad_width(g: int) -> int:
    """Parent-tile ghost width needed to prolong a (2g+2)-deep fine
    backdrop: donor_halo(2g+2) = g + 2."""
    return tp.donor_halo(2 * g + 2)


def make_pool_backdrop_fn(ts, g: int, active, nv_part: int):
    """Backdrop provider for a packed level whose parent is a PACKED pool
    whose own parent is dense (the benchmark topology). parent_args =
    (Upo, Upn, gpa, gpb, nbr_p, org_p): the parent's packed old/new PART
    pools (hydro or rad rows, `nv_part` components), the dense grandparent
    pads at width gp2 (lerped to the parent window endpoints, same
    component slice), and the parent's tables.

    ``prep(parent_args, ps_c)`` gathers + assembles the <= chunk parent
    rows and their 26 neighbors (Pallas row gathers -- no relayout) padded
    at gp2 = g + 2, ONCE per chunk; ``bd(prepped, ps_c, po_c, tau, gf)``
    lerps the endpoint pair to the stage time and prolongs. Values mirror
    `hierarchy._get_pool_step`'s "pool" kind bitwise."""
    gp2 = donor_pad_width(g)

    def one_endpoint(Up, gp_dense, rows, nbr_p, org_p):
        n = rows.shape[0]
        own = unpack(row_gather(Up, rows), nv_part, ts)
        nbr_c = jnp.take(nbr_p, rows, axis=0)
        bd0 = tp.make_backdrop_from_dense(
            gp_dense, org_p[rows], ts, gp2, gp2, active
        )
        lead = (slice(None), slice(None))
        ctr = tuple(slice(gp2, gp2 + t) for t in ts)
        out = bd0.at[lead + ctr].set(own)
        nb = unpack(
            row_gather(Up, jnp.maximum(nbr_c.reshape(-1), 0)), nv_part, ts
        ).reshape(n, len(tp.DIRS), -1, *ts)
        for q, d3 in enumerate(tp.DIRS):
            src, dst = tp._region(ts, gp2, d3)
            ok = (nbr_c[:, q] >= 0).reshape(n, 1, 1, 1, 1)
            out = out.at[lead + dst].set(
                jnp.where(ok, nb[:, q][lead + src], out[lead + dst])
            )
        return out

    def prep(parent_args, ps_c):
        """Endpoint parent-padded chunks (computed ONCE per chunk; both
        stages lerp from the same pair)."""
        Upo, Upn, gpa, gpb, nbr_p, org_p = parent_args
        rows = jnp.maximum(ps_c, 0)
        return (one_endpoint(Upo, gpa, rows, nbr_p, org_p),
                one_endpoint(Upn, gpb, rows, nbr_p, org_p))

    def bd(prepped, ps_c, po_c, tau, gf):
        p_old, p_new = prepped
        ppt = (1.0 - tau) * p_old + tau * p_new
        loc = jnp.arange(ps_c.shape[0], dtype=jnp.int32)
        return tp.make_backdrop_from_pool(ppt, loc, po_c, ts, gf, gp2,
                                          active)

    return prep, bd


def make_dense_backdrop_fn(ts, g: int, active):
    """Backdrop provider for a packed level whose parent is DENSE.
    parent_args = (ppad_old2, ppad_new2): dense parents ghost-filled at
    width gp2 = g + 2. ``bd(parent_args, org_c, ps_c, po_c, tau, gf)``."""
    gp2 = donor_pad_width(g)

    def bd(parent_args, org_c, ps_c, po_c, tau, gf):
        ppad_old2, ppad_new2 = parent_args
        pp = (1.0 - tau) * ppad_old2 + tau * ppad_new2
        return tp.make_backdrop_from_dense(pp, org_c, ts, gf, gp2, active)

    return bd


# ------------------------------------------------- streamed write pipeline
class WindowedWriter:
    """Delayed in-place row write-back: chunk ci's output is applied to
    the (donated) pool buffer only once every chunk that can still READ
    ci's rows has run. Readers of row r are the tiles whose 26-neighbor
    table references r -- all within `max_nbr_dist` slots -- so holding
    ceil(W/chunk) + 1 pending chunks makes in-place updates exact while
    the substep's peak memory stays at ONE pool + O(window)."""

    def __init__(self, buf, chunk: int, max_nbr_dist: int, writer):
        self.buf = buf
        self.chunk = chunk
        self.delay = max_nbr_dist // chunk + 2
        self.writer = writer
        self.pending = []

    def push(self, i0: int, data):
        self.pending.append((i0, data))
        if len(self.pending) > self.delay:
            j0, d = self.pending.pop(0)
            self.buf = self.writer(self.buf, d, j0)

    def flush(self):
        for j0, d in self.pending:
            self.buf = self.writer(self.buf, d, j0)
        self.pending = []
        return self.buf


def scatter_restr_faces_prog(half, d_axis: int):
    """Jitted per-chunk scatter-add of parent-restricted child faces into
    the parent-indexed register buffer (pre-boundary-completion
    `assemble_children_faces` semantics: octant midplane overlaps ADD)."""

    def prog(F, restr_c, ps_c, po_c):
        def body(Facc, args):
            r, off, val = args
            # off = the child's coarse-image cell offset inside its parent
            # tile (0 or ts/2 per axis) -- already in parent cells
            start = (r, jnp.zeros((), jnp.int32), off[0], off[1], off[2])
            cur = lax.dynamic_slice(Facc, start, (1,) + val.shape)
            return lax.dynamic_update_slice(Facc, cur + val[None], start), None

        F, _ = lax.scan(body, F, (ps_c, po_c, restr_c))
        return F

    return jax.jit(prog, donate_argnums=0)


def complete_face_registers(Ffine: Dict[int, jnp.ndarray],
                            parent_nbr: jnp.ndarray) -> Dict[int, jnp.ndarray]:
    """Boundary-face completion across parent tiles (the tail of
    `tilepool.assemble_children_faces`): each parent's lo/hi face along d
    gains the face-neighbor parent's accumulated children contribution."""
    out = {}
    for d, F in Ffine.items():
        shape = F.shape[2:]
        qlo = tp.DIRS.index(tuple(-1 if e == d else 0 for e in range(3)))
        qhi = tp.DIRS.index(tuple(1 if e == d else 0 for e in range(3)))
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


# ------------------------------------------------------- streamed advance
def fused_hydro_advance_packed(
    Uph: jnp.ndarray,
    dt,
    opts: HydroOptions,
    nbr, org, ps, po,
    n_active: int,
    max_nbr_dist: int,
    backdrop_fn: Callable,
    backdrop_mode: str,          # "pool" | "dense"
    parent_args,
    th1, th2,
    chunk: int,
    active_axes,
    ts,
    nh: int,
    jit_cache: dict,
    cache_key,
    own_out: bool = False,
    parent_cap: int = 0,
    restr_mode: str = "parent",   # "parent" (scatter) | "child" (rows)
    in_place: bool = True,
) -> Tuple:
    """One fused RK2 hydro substep of a packed pool level, streamed
    chunk-by-chunk on the host with delayed donated in-place writes.

    Uph holds HYDRO rows only ([cap, nh*prod(ts)//128, 128]); radiation
    rows live in a sibling pool untouched by the hydro advance. Returns
    (Uph_new, faces_own | None, Ffine_restr, stats):

    - faces_own: this level's own time-averaged faces [cap, nh, ...] per
      axis (only when `own_out` -- the level has children to reflux
      against).
    - Ffine_restr: the level's restricted flux-register contribution.
      restr_mode "parent": PARENT-indexed [parent_cap, nh, faces...] per
      axis (pre-completion `assemble_children_faces` layout), scattered
      per chunk so no child-indexed face pool is ever materialized (pool
      parents). restr_mode "child": child-row-indexed [cap, nh, ...] (the
      format `_pool_child_reflux_dense` consumes for dense parents).
    - in_place=False streams into a FRESH output pool instead of the
      delayed in-place window (non-leaf levels: the old state is the
      children's time-interpolation window endpoint and must survive).
    """
    cap = Uph.shape[0]
    if cap % chunk:
        raise ValueError(f"packed capacity {cap} not a chunk multiple")
    g = opts.nghost
    P = 2 * g + 2
    gov = g + 2
    dt = jnp.asarray(dt)
    dtp = Uph.dtype
    th1 = jnp.asarray(th1, dtp)
    th2 = jnp.asarray(th2, dtp)
    half = tuple(t // 2 for t in ts)

    key = ("fused_hydro", cache_key, chunk, own_out)
    if key not in jit_cache:

        def chunk_prog(Uph, parent_args, nbr_c, org_c, ps_c, po_c, i0,
                       th1, th2, dt):
            if backdrop_mode == "pool":
                prep_fn, bd_fn = backdrop_fn
                prepped = prep_fn(parent_args, ps_c)
                bd1 = bd_fn(prepped, ps_c, po_c, th1, P)
                bd2 = bd_fn(prepped, ps_c, po_c, th2, gov)
            else:
                bd1 = backdrop_fn(parent_args, org_c, ps_c, po_c, th1, P)
                bd2 = backdrop_fn(parent_args, org_c, ps_c, po_c, th2, gov)
            ug0 = assemble_chunk(Uph, i0, chunk, nbr_c, bd1, P, nh, ts)
            u_c = unpack(row_slice(Uph, i0, chunk), nh, ts)
            U2, own, restr, nf = fused_block_rk2(
                u_c, ug0, bd2, nbr_c, dt, opts, own_out, active_axes
            )
            smax = jax.vmap(
                lambda u: jnp.max(euler.max_signal_speed(u, opts.eos))
            )(U2)
            fin = jax.vmap(lambda u: jnp.all(jnp.isfinite(u)))(U2)
            return pack(U2), own, restr, nf, smax, fin

        jit_cache[key] = jax.jit(chunk_prog)
    prog = jit_cache[key]

    wkey = ("w", cache_key)
    if wkey not in jit_cache:
        jit_cache[wkey] = (make_row_writer(3), make_row_writer(5),
                           {d: scatter_restr_faces_prog(half, d)
                            for d in active_axes})
    w3, w5, scatters = jit_cache[wkey]

    if in_place:
        ww = WindowedWriter(Uph, chunk, max_nbr_dist, w3)
    else:
        out_buf = jnp.zeros_like(Uph)
    own_bufs = None
    if restr_mode == "parent":
        Ffine = {
            d: jnp.zeros(
                (parent_cap, nh)
                + tuple((half[e] * 2) + (1 if e == d else 0)
                        for e in range(3)),
                dtp,
            )
            for d in active_axes
        }
    else:
        Ffine = None
    n_fofc = jnp.zeros((), jnp.int32)
    smax_all = jnp.zeros((), dtp)
    ok_all = jnp.asarray(True)
    n_live = -(-n_active // chunk)
    if _DEBUG:
        import sys as _sys

        fb = sum(f.nbytes for f in Ffine.values()) if Ffine else 0
        tot = sum(a.nbytes for a in jax.live_arrays())
        print(
            f"[packed] hydro_advance cap={cap} n_active={n_active} "
            f"chunk={chunk} n_live={n_live} own_out={own_out} "
            f"in_place={in_place} Uph={Uph.nbytes/2**30:.2f}G "
            f"Ffine={fb/2**30:.2f}G live={tot/2**30:.2f}G",
            file=_sys.stderr, flush=True,
        )
    for ci in range(cap // chunk):
        i0 = ci * chunk
        if ci >= n_live:
            if in_place:
                break  # spare rows keep their old benign data
            out_buf = w3(out_buf, row_slice(Uph, i0, chunk), i0)
            continue
        nbr_c = nbr[i0:i0 + chunk]
        U2p, own, restr, nf, smax, fin = prog(
            ww.buf if in_place else Uph, parent_args, nbr_c,
            org[i0:i0 + chunk],
            ps[i0:i0 + chunk], po[i0:i0 + chunk],
            jnp.asarray(i0, jnp.int32), th1, th2, dt,
        )
        if in_place:
            ww.push(i0, U2p)
        else:
            out_buf = w3(out_buf, U2p, i0)
        if own_out:
            if own_bufs is None:
                own_bufs = {
                    d: jnp.zeros((cap,) + o.shape[1:], o.dtype)
                    for d, o in own.items()
                }
            for d in own:
                own_bufs[d] = w5(own_bufs[d], own[d], i0)
        if restr_mode == "parent":
            for d in restr:
                Ffine[d] = scatters[d](
                    Ffine[d], restr[d], ps[i0:i0 + chunk],
                    po[i0:i0 + chunk]
                )
        else:
            if Ffine is None:
                Ffine = {
                    d: jnp.zeros((cap,) + r.shape[1:], r.dtype)
                    for d, r in restr.items()
                }
            for d in restr:
                Ffine[d] = w5(Ffine[d], restr[d], i0)
        act = jnp.arange(i0, i0 + chunk) < n_active
        n_fofc = n_fofc + nf
        smax_all = jnp.maximum(smax_all, jnp.max(jnp.where(act, smax, 0.0)))
        ok_all = jnp.logical_and(ok_all, jnp.all(jnp.where(act, fin, True)))
        _throttle(ci, n_fofc)
    Uph_new = ww.flush() if in_place else out_buf
    stats = {"max_signal": smax_all, "valid": ok_all, "n_fofc": n_fofc}
    return Uph_new, own_bufs, Ffine, stats


# ----------------------------------------------------- streamed radiation
def make_row_adder(ndim: int = 5):
    """Jitted donated row-range ADD: buf[i0:i0+n] += data."""

    def add(buf, data, i0):
        start = (jnp.asarray(i0, jnp.int32),) + (jnp.zeros(
            (), jnp.int32),) * (ndim - 1)
        cur = lax.dynamic_slice(buf, start, data.shape)
        return lax.dynamic_update_slice(buf, cur + data, start)

    return jax.jit(add, donate_argnums=0)


def fused_rad_subcycle_packed(
    Uph: jnp.ndarray,
    Upr: jnp.ndarray,
    time, dt_level,
    nsub: int,
    ropts,                       # RadOptions
    hopts: HydroOptions,
    layout,
    eos,
    problem,
    grid,                        # level grid (TileGridView coordinates)
    nbr, org, ps, po,
    n_active: int,
    max_nbr_dist: int,
    rad_backdrop_fn,             # ("pool": (prep, bd)) | ("dense": bd)
    backdrop_mode: str,
    parent_args_r,
    th0, th1,
    chunk: int,
    active_axes,
    ts,
    jit_cache: dict,
    cache_key,
    own_out: bool = False,
    parent_cap: int = 0,
    restr_mode: str = "parent",
    preserve_r_input: bool = False,
) -> Tuple:
    """IMEX PD-ARS radiation subcycle of a packed pool level, streamed.

    Mirrors `radiation.pool.PoolLevelRadiation` (itself the pool analog of
    the reference `QuokkaSimulation::subcycleRadiationAtLevel`,
    ``src/QuokkaSimulation.hpp:1577-1650``) with the fused-halo execution:
    stage-1 transport runs on a 2g-deep radiation block so the post-Newton
    R1 ring the stage-2 transport stencil reads is recomputed in-block
    (bitwise-equal to the neighbor's own values: the Newton coupling is
    pointwise and the transported values share inputs), instead of
    materializing a U1 pool. Gas coupling updates stream back into the
    HYDRO pool rows through the same delayed-write window as the rad rows.

    Returns (Uph', Upr', own_bufs | None, Ffine_restr)."""
    from ..radiation.pool import TileGridView
    from ..radiation.system import (
        add_fluxes_rk2, compute_rad_fluxes, predict_step, rad_div_fluxes,
    )
    from .pool_advance import restrict_tile_faces, slice_tile_faces

    cap = Uph.shape[0]
    g = hopts.nghost
    g2 = 2 * g
    dtp = Uph.dtype
    G = ropts.n_groups
    nr = 4 * G
    nh = layout.nvar_hydro
    nv_tot = layout.nvar
    rad_start = layout.rad_start
    dx = grid.dx
    multigroup = G > 1
    half = tuple(t // 2 for t in ts)
    kB = problem.eos_traits.boltzmann_constant
    boundaries = tuple(problem.rad.group_edges) if problem.rad.group_edges \
        else (0.0, float("inf"))

    def newton(U_blk, rad_src, dt, stage):
        """Pointwise matter-radiation coupling on a [c, nv, X, Y, Z]
        block: flatten the chunk axis into x and call the solver ONCE
        (bitwise-identical to the dense/two-pass pool paths)."""
        c, nv = U_blk.shape[:2]
        sp = U_blk.shape[2:]
        Uf = jnp.moveaxis(U_blk, 0, 1).reshape(nv, c * sp[0], *sp[1:])
        if multigroup and rad_src.ndim == 5:
            rf = jnp.moveaxis(rad_src, 0, 1).reshape(G, c * sp[0], *sp[1:])
        else:
            rf = rad_src.reshape(c * sp[0], *sp[1:])
        if multigroup:
            from ..radiation.multigroup import add_source_terms_multi_group

            U2f, _ = add_source_terms_multi_group(
                Uf, rf, dt, stage, ropts, eos, problem, rad_start,
                boundaries, kB,
            )
        else:
            from ..radiation.source_terms import add_source_terms_single_group

            U2f, _ = add_source_terms_single_group(
                Uf, rf, dt, stage, ropts, eos,
                problem.compute_planck_opacity,
                problem.compute_energy_mean_opacity,
                problem.compute_flux_mean_opacity, rad_start,
            )
        return jnp.moveaxis(U2f.reshape(nv, c, sp[0], *sp[1:]), 1, 0)

    key = ("fused_rad", cache_key, chunk, own_out)
    if key not in jit_cache:

        def chunk_prog(Uph, Upr, parent_args_r, nbr_c, org_c, ps_c, po_c,
                       i0, th_a, th_b, t_sub, dt):
            # per-tile radiation energy source (problem hook on traced
            # tile-origin coordinates), evaluated on the g-PADDED tile so
            # ring-cell Newton recomputations see the very source values
            # the owning neighbor tile applies (the hook is
            # position-dependent; same global coordinates -> same values)
            tsg = tuple(t + 2 * g for t in ts)

            def rad_src_of(o):
                gv = TileGridView(grid, o - g, tsg)
                src = jnp.asarray(
                    problem.set_radiation_energy_source(gv, t_sub), dtp
                )
                if multigroup and src.ndim == 3:
                    src = jnp.broadcast_to(src[None], (G, *src.shape)) / G
                return src

            src_b = jax.vmap(rad_src_of)(org_c)
            rad_src = _crop(src_b, g)

            # stage-1 rad fill at depth 2g
            if backdrop_mode == "pool":
                prep_fn, bd_fn = rad_backdrop_fn
                prepped = prep_fn(parent_args_r, ps_c)
                bd_a = bd_fn(prepped, ps_c, po_c, th_a, g2)
                bd_b = bd_fn(prepped, ps_c, po_c, th_b, g)
            else:
                bd_a = rad_backdrop_fn(parent_args_r, org_c, ps_c, po_c,
                                       th_a, g2)
                bd_b = rad_backdrop_fn(parent_args_r, org_c, ps_c, po_c,
                                       th_b, g)
            R0g = assemble_chunk(Upr, i0, chunk, nbr_c, bd_a, g2, nr, ts)

            # gas block at depth g: neighbor rows where they exist; a
            # benign constant where not (those ring cells are overlaid
            # with parent backdrop before anything reads them)
            from ..indices import EGAS as _EG, EINT as _EI, RHO as _RHO

            ben = jnp.zeros((chunk, nh) + tsg, dtp)
            ben = ben.at[:, _RHO].set(1.0)
            ben = ben.at[:, _EG].set(1.0).at[:, _EI].set(1.0)
            gasg = assemble_chunk(Uph, i0, chunk, nbr_c, ben, g, nh, ts)

            fl0 = jax.vmap(
                lambda x: compute_rad_fluxes(x, 0, ropts, active_axes, dx)
            )(R0g)
            divF0g = jax.vmap(lambda f: rad_div_fluxes(f, dx))(fl0)
            divF0 = _crop(divF0g, g)             # [c, G, 4, ts+2g...]
            R0b = _crop(R0g, g).reshape(chunk, G, 4, *divF0.shape[3:])
            R1b = jax.vmap(
                lambda r, d: predict_step(r, d, dt, ropts)
            )(R0b, divF0)

            # stage-1 Newton on the g-block (pointwise; ring cells use the
            # gathered neighbor gas so they match the owner's update)
            Ub = jnp.concatenate(
                [gasg, R1b.reshape(chunk, nr, *gasg.shape[2:])], axis=1
            )
            U1b = newton(Ub, src_b, dt, 1)
            real_g = ring_real_mask(nbr_c, ts, g)[:, None]
            U1b = jnp.where(real_g, U1b, Ub)
            R1blk = U1b[:, nh:]
            # no-neighbor ring: parent backdrop at the stage-2 time
            R1blk = overlay_backdrop(R1blk, nbr_c, bd_b, g, ts)

            fl1 = jax.vmap(
                lambda x: compute_rad_fluxes(x, 0, ropts, active_axes, dx)
            )(R1blk)
            divF1g = jax.vmap(lambda f: rad_div_fluxes(f, dx))(fl1)
            divF1 = _crop(divF1g, g)
            R1n = _crop(R1blk, g).reshape(chunk, G, 4, *ts)  # post-Newton
            R_new = jax.vmap(
                lambda r0, r1, d0, d1: add_fluxes_rk2(r0, r1, d0, d1, dt,
                                                      ropts)
            )(_crop(R0b, g), R1n, _crop(divF0, g), divF1)

            # stage-2 Newton on the interior
            gas1 = _crop(U1b[:, :nh], g)
            U2t = jnp.concatenate(
                [gas1, R_new.reshape(chunk, nr, *ts)], axis=1
            )
            U2t = newton(U2t, rad_src, dt, 2)

            # faces: time-average of the two transport stages on [0..t]
            def faces_of(fl, gw):
                flat = {
                    d: F.reshape(chunk, nr, *F.shape[3:]) for d, F in
                    fl.items()
                }
                return slice_tile_faces(flat, gw, ts)

            own0 = faces_of(fl0, g2)
            own1 = faces_of(fl1, g)
            own = {d: 0.5 * (own0[d] + own1[d]) for d in own0}
            # restrict per transport STAGE before the 0.5 average -- the
            # exact f32 association of the two-pass chunked path
            # (radiation.pool transport's restrict_inline), so the parent
            # flux registers match bitwise
            r0 = restrict_tile_faces(own0, active_axes)
            r1 = restrict_tile_faces(own1, active_axes)
            restr = {d: 0.5 * (r0[d] + r1[d]) for d in r0}
            fin = jax.vmap(lambda u: jnp.all(jnp.isfinite(u)))(U2t)
            return (pack(U2t[:, :nh]), pack(U2t[:, nh:]), own, restr, fin)

        jit_cache[key] = jax.jit(chunk_prog)
    prog = jit_cache[key]

    wkey = ("rad_w", cache_key)
    if wkey not in jit_cache:
        jit_cache[wkey] = (make_row_writer(3), make_row_adder(5),
                           {d: scatter_restr_faces_prog(half, d)
                            for d in active_axes})
    w3, addrows, scatters = jit_cache[wkey]

    dt_r = dt_level / nsub
    own_bufs = None
    Ffine = None
    ok_all = jnp.asarray(True)
    n_live = -(-n_active // chunk)
    for i in range(nsub):
        th_a = jnp.asarray(th0 + (th1 - th0) * (i / nsub), dtp)
        th_b = jnp.asarray(th0 + (th1 - th0) * ((i + 1) / nsub), dtp)
        t_sub = jnp.asarray(time + i * dt_r, dtp)
        wh = WindowedWriter(Uph, chunk, max_nbr_dist, w3)
        # non-leaf levels: the INPUT rad pool is the children's window-old
        # endpoint -- the first substep streams into a fresh buffer; later
        # substeps consume intermediates and run the in-place window
        fresh_r = (i == 0 and preserve_r_input)
        if fresh_r:
            r_out = jnp.zeros_like(Upr)
        else:
            wr = WindowedWriter(Upr, chunk, max_nbr_dist, w3)
        for ci in range(cap // chunk):
            i0 = ci * chunk
            if ci >= n_live:
                if fresh_r:
                    r_out = w3(r_out, row_slice(Upr, i0, chunk), i0)
                    continue
                break
            Hp, Rp, own, restr, fin = prog(
                wh.buf, Upr if fresh_r else wr.buf, parent_args_r,
                nbr[i0:i0 + chunk],
                org[i0:i0 + chunk], ps[i0:i0 + chunk], po[i0:i0 + chunk],
                jnp.asarray(i0, jnp.int32), th_a, th_b, t_sub,
                jnp.asarray(dt_r, dtp),
            )
            wh.push(i0, Hp)
            if fresh_r:
                r_out = w3(r_out, Rp, i0)
            else:
                wr.push(i0, Rp)
            if own_out:
                # non-leaf: accumulate full-resolution faces; restrict
                # ONCE over the subcycle sum (the two-pass with_own f32
                # association) after the loop
                if own_bufs is None:
                    own_bufs = {
                        d: jnp.zeros((cap,) + o.shape[1:], o.dtype)
                        for d, o in own.items()
                    }
                for d in own:
                    own_bufs[d] = addrows(own_bufs[d], own[d] / nsub, i0)
            else:
                if Ffine is None:
                    if restr_mode == "parent":
                        Ffine = {
                            d: jnp.zeros(
                                (parent_cap, nr) + tuple(
                                    (half[e] * 2) + (1 if e == d else 0)
                                    for e in range(3)),
                                dtp,
                            )
                            for d in active_axes
                        }
                    else:
                        Ffine = {
                            d: jnp.zeros((cap,) + r.shape[1:], r.dtype)
                            for d, r in restr.items()
                        }
                if restr_mode == "parent":
                    for d in restr:
                        Ffine[d] = scatters[d](
                            Ffine[d], restr[d] / nsub, ps[i0:i0 + chunk],
                            po[i0:i0 + chunk],
                        )
                else:
                    for d in restr:
                        Ffine[d] = addrows(Ffine[d], restr[d] / nsub, i0)
            act = jnp.arange(i0, i0 + chunk) < n_active
            ok_all = jnp.logical_and(
                ok_all, jnp.all(jnp.where(act, fin, True))
            )
            _throttle(ci, ok_all)
        Uph = wh.flush()
        Upr = r_out if fresh_r else wr.flush()
    if own_out:
        from .pool_advance import restrict_tile_faces as _rtf

        restrF = _rtf(own_bufs, active_axes)
        if restr_mode == "parent":
            Ffine = {
                d: jnp.zeros(
                    (parent_cap, nr) + tuple(
                        (half[e] * 2) + (1 if e == d else 0)
                        for e in range(3)),
                    dtp,
                )
                for d in active_axes
            }
            for ci in range(n_live):
                i0 = ci * chunk
                for d in restrF:
                    Ffine[d] = scatters[d](
                        Ffine[d], restrF[d][i0:i0 + chunk],
                        ps[i0:i0 + chunk], po[i0:i0 + chunk],
                    )
        else:
            Ffine = restrF
    return Uph, Upr, own_bufs, Ffine, ok_all


