"""Hierarchy integration of the lane-packed streamed pool engine.

`AMRSimulation` dispatches here for pool levels when ``amr.pool_packed=1``
(the reference-benchmark-scale mode; see `packed.py` for why the standard
pool paths cannot run the radhydro-shell 256^3 + 2-level configuration on
a 16 GB chip). Packed levels store their state SPLIT as two lane-packed
row pools -- hydro ``Uh [cap, nh*prod/128, 128]`` and radiation
``Ur [cap, 4G*prod/128, 128]`` -- so the hydro advance never copies the
radiation rows and vice versa, and every cross-tile access is a Pallas DMA
row gather.

Supported topology (v1): ``amr.sparse_min_level == 1`` with up to two
packed levels -- level 1's parent is the dense root, level 2's parent is
packed level 1 (exactly the reference benchmark,
``/root/reference/tests/radhydro_shell_amr.in``). Deeper packed stacks
raise NotImplementedError. Multi-chip sharding of packed pools is not
wired (single-chip benchmark mode); the retry-ladder stash is skipped
(packed substeps advance in place -- holding a pre-step copy of a
benchmark-scale hierarchy would defeat the memory design).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..hydro import euler
from . import operators as ops
from . import packed as pk
from . import tilepool as tp


def max_nbr_distance(meta) -> int:
    """Largest |neighbor slot - own slot| over active rows: the delayed
    write-back window that makes in-place streamed substeps exact."""
    nbr = np.asarray(meta.nbr_dev[: meta.n_active])
    if nbr.size == 0:
        return 0
    s = np.arange(nbr.shape[0])[:, None]
    d = np.where(nbr >= 0, np.abs(nbr - s), 0)
    return int(d.max())


def _split_pack(U5, nh):
    return pk.pack(U5[:, :nh]), pk.pack(U5[:, nh:]) if U5.shape[1] > nh \
        else None


def unpack_full(st, nh, nr, ts):
    """Transient full 5D pool [cap, nvar, *ts] from a packed PoolState
    (parent-scale ops only -- never call on the benchmark leaf)."""
    Uh5 = pk.unpack(st.Uh, nh, ts)
    if st.Ur is None:
        return Uh5
    return jnp.concatenate([Uh5, pk.unpack(st.Ur, nr, ts)], axis=1)


# --------------------------------------------------------------- regrid build
def build_packed_level(sim, l: int, meta, old_st) -> "object":
    """Build/regrid packed level l's state: limited-linear prolongation
    from the parent (streamed chunk-by-chunk), carrying persistent tiles'
    old data. Hydro and radiation parts are built SEQUENTIALLY so at most
    one part's old+new pair is alive at once."""
    from .sparse import PoolState, stream_pool_build

    ts = sim.tile_shape
    g = sim._g
    active = sim.grid.active_axes
    nh = sim.layout.nvar_hydro
    nv = sim.layout.nvar
    nr = nv - nh
    chunk = sim.packed_chunk
    cap = meta.capacity
    dtype = sim.dtype

    remap = None
    if old_st is not None and old_st.meta.n_active:
        rm = np.full(cap, -1, np.int32)
        for t, s in meta.slot_of.items():
            rm[s] = old_st.meta.slot_of.get(t, -1)
        remap = jnp.asarray(rm)

    # `l` is the PARENT level (the caller regrids level l+1 from tags on l)
    parent_pool = sim._is_pool(l)
    if parent_pool:
        stp = sim.level_pool[l]
        if not getattr(stp, "packed", False):
            raise NotImplementedError("packed child of unpacked pool parent")
        if sim._is_pool(l - 1):
            raise NotImplementedError(
                "packed prolongation needs a dense grandparent (v1)"
            )
        gp_pad = sim._get_dense_pad(l - 1)(sim.level_U[l - 1])
        ps, po = tp.parent_linkage(meta, stp.meta)
        nbr_p, org_p = stp.meta.nbr_dev, stp.meta.origin_dev
        gp2 = pk.donor_pad_width(g)

        def make_produce(Up_part, nv_part, gp_part):
            def produce(Up, gp, nbrp, orgp, ps_c, po_c):
                rows = jnp.maximum(ps_c, 0)
                own = pk.unpack(pk.row_gather(Up, rows), nv_part, ts)
                nbr_c = jnp.take(nbrp, rows, axis=0)
                bd0 = tp.make_backdrop_from_dense(
                    gp, orgp[rows], ts, gp2, g, active
                )
                lead = (slice(None), slice(None))
                ctr = tuple(slice(gp2, gp2 + t) for t in ts)
                out = bd0.at[lead + ctr].set(own)
                nb = pk.unpack(
                    pk.row_gather(Up, jnp.maximum(nbr_c.reshape(-1), 0)),
                    nv_part, ts,
                ).reshape(ps_c.shape[0], len(tp.DIRS), nv_part, *ts)
                for q, d3 in enumerate(tp.DIRS):
                    src, dst = tp._region(ts, gp2, d3)
                    okq = (nbr_c[:, q] >= 0).reshape(-1, 1, 1, 1, 1)
                    out = out.at[lead + dst].set(
                        jnp.where(okq, nb[:, q][lead + src],
                                  out[lead + dst])
                    )
                loc = jnp.arange(ps_c.shape[0], dtype=jnp.int32)
                fine = tp.make_backdrop_from_pool(
                    out, loc, po_c, ts, 0, gp2, active
                )
                return pk.pack(fine)

            return jax.jit(produce), (Up_part, gp_part, nbr_p, org_p)

        parts = []
        for Up_part, nv_part, comp0 in (
            (stp.Uh, nh, 0), (stp.Ur, nr, nh)
        ):
            if Up_part is None:
                parts.append(None)
                continue
            gp_part = gp_pad[comp0:comp0 + nv_part]
            produce, const = make_produce(Up_part, nv_part, gp_part)
            old_part = None
            if remap is not None:
                old_part = old_st.Uh if comp0 == 0 else old_st.Ur
            parts.append(stream_pool_build(
                produce, const, (ps, po), cap, min(chunk, cap),
                meta.n_active,
                pk.packed_shape(1, nv_part, ts)[1:], dtype,
                old_U=old_part, remap=remap,
            ))
        Uh_new, Ur_new = parts
    else:
        # dense parent: donor slices from the ghost-padded dense level
        pp = sim._get_dense_pad(l)(sim.level_U[l])
        ps = po = None
        hc = 1
        sizes_t = tuple(t // 2 + 2 * hc for t in ts)

        def make_produce(nv_part, comp0):
            def produce(ppad, o_c):
                def donor(o):
                    z = jnp.zeros((), o.dtype)
                    start = (jnp.asarray(comp0, o.dtype),) + tuple(
                        o[d] // 2 - hc + g for d in range(3)
                    )
                    return jax.lax.dynamic_slice(
                        ppad, start, (nv_part,) + sizes_t
                    )

                donors = jax.vmap(donor)(o_c)
                fine = jax.vmap(
                    lambda D: ops.prolong(D, active)
                )(donors)
                sl = tuple(slice(2, fine.shape[2 + d] - 2) for d in range(3))
                return pk.pack(fine[(slice(None), slice(None)) + sl])

            return jax.jit(produce)

        parts = []
        for nv_part, comp0 in ((nh, 0), (nr, nh)):
            if nv_part == 0:
                parts.append(None)
                continue
            old_part = None
            if remap is not None:
                old_part = old_st.Uh if comp0 == 0 else old_st.Ur
            parts.append(stream_pool_build(
                make_produce(nv_part, comp0), (pp,), (meta.origin_dev,),
                cap, min(chunk, cap), meta.n_active,
                pk.packed_shape(1, nv_part, ts)[1:], dtype,
                old_U=old_part, remap=remap,
            ))
        Uh_new, Ur_new = parts

    from .sparse import PoolState

    st = PoolState(meta=meta, U=None, parent_slot=ps, parent_off=po)
    st.packed = True
    st.Uh = Uh_new
    st.Ur = Ur_new
    st.max_nbr_dist = max_nbr_distance(meta)
    return st


# ------------------------------------------------------------- octant tags
def octant_tags_packed(sim, l: int) -> np.ndarray:
    """Tagged octants of packed level l (dense parent only, v1): per
    chunk, assemble the FULL-state g-padded block (hydro + rad), call the
    problem's local error estimator, dilate by n_error_buf (exact across
    tiles: flags live on the padded block), reduce to octants."""
    st = sim.level_pool[l]
    g = sim._g
    ts = sim.tile_shape
    if sim._is_pool(l - 1):
        raise NotImplementedError("packed tags with pool parent (v1)")
    nh = sim.layout.nvar_hydro
    nv = sim.layout.nvar
    nr = nv - nh
    chunk = sim.packed_chunk
    active = sim.grid.active_axes
    n_buf = sim.n_error_buf
    grid = sim.level_grids[l]
    problem = sim.problem
    pp = sim._get_dense_pad(l - 1)(sim.level_U[l - 1])

    key = ("pk_octags", l)
    if key not in sim._pool_jits:

        def prog(Uh, Ur, ppad, nbr_c, org_c, i0):
            bd_h = tp.make_backdrop_from_dense(
                ppad[:nh], org_c, ts, g, g, active
            )
            blk = pk.assemble_chunk(Uh, i0, chunk, nbr_c, bd_h, g, nh, ts)
            if Ur is not None:
                bd_r = tp.make_backdrop_from_dense(
                    ppad[nh:], org_c, ts, g, g, active
                )
                blk_r = pk.assemble_chunk(Ur, i0, chunk, nbr_c, bd_r, g,
                                          nr, ts)
                blk = jnp.concatenate([blk, blk_r], axis=1)

            def one(up, o):
                tags = problem.error_est_local(up, grid, l, o)
                tags = ops.dilate(tags, n_buf, (0, 1, 2), (False,) * 3)
                tags = tags[g:-g, g:-g, g:-g]
                return tags.reshape(
                    2, ts[0] // 2, 2, ts[1] // 2, 2, ts[2] // 2
                ).any(axis=(1, 3, 5))

            return jax.vmap(one)(blk, org_c)

        sim._pool_jits[key] = jax.jit(prog, static_argnums=())
    prog = sim._pool_jits[key]

    nbr = st.meta.nbr_dev
    org = st.meta.origin_dev
    outs = []
    n_live = -(-st.meta.n_active // chunk)
    for ci in range(n_live):
        i0 = ci * chunk
        outs.append(np.asarray(prog(
            st.Uh, st.Ur, pp, nbr[i0:i0 + chunk], org[i0:i0 + chunk],
            jnp.asarray(i0, jnp.int32),
        )))
    octs = np.concatenate(outs, axis=0) if outs else np.zeros((0, 2, 2, 2),
                                                              bool)
    return octs[: st.meta.n_active]


# -------------------------------------------------------------- avg down
def avgdown_packed(sim, l: int):
    """Average packed child (l+1) into packed parent l, streamed over
    parent chunks (reference `AverageDownTo`; pool analog
    `tilepool.average_down_into_pool` evaluated per chunk)."""
    st = sim.level_pool[l]
    child = sim.level_pool[l + 1]
    ts = sim.tile_shape
    nh = sim.layout.nvar_hydro
    nv = sim.layout.nvar
    nr = nv - nh
    chunk = sim.packed_chunk
    active = sim.grid.active_axes
    opts = sim.level_opts[l]
    half = tuple(t // 2 for t in ts)

    key = ("pk_avgdown", l)
    if key not in sim._pool_jits:

        def prog(Uh_p, Ur_p, Uh_c, Ur_c, cs_c, i0):
            rows = jnp.maximum(cs_c.reshape(-1), 0)  # [chunk*8]
            ch_h = pk.unpack(pk.row_gather(Uh_c, rows), nh, ts)
            ch = [jax.vmap(lambda u: ops.restrict(u, active))(ch_h)]
            if Ur_c is not None:
                ch_r = pk.unpack(pk.row_gather(Ur_c, rows), nr, ts)
                ch.append(jax.vmap(lambda u: ops.restrict(u, active))(ch_r))
            restr = jnp.concatenate(ch, axis=1)  # [chunk*8, nv, half...]
            restr = restr.reshape(chunk, 2, 2, 2, nv, *half)

            own_h = pk.unpack(pk.row_slice(Uh_p, i0, chunk), nh, ts)
            if Ur_p is not None:
                own = jnp.concatenate(
                    [own_h, pk.unpack(pk.row_slice(Ur_p, i0, chunk), nr,
                                      ts)], axis=1
                )
            else:
                own = own_h

            def assemble(p_tile, rs, cs):
                rows_ = []
                for a in range(2):
                    cols = []
                    for b in range(2):
                        zs = []
                        for c in range(2):
                            oct_par = jax.lax.dynamic_slice(
                                p_tile,
                                (0, a * half[0], b * half[1], c * half[2]),
                                (nv,) + half,
                            )
                            zs.append(jnp.where(cs[a, b, c] >= 0,
                                                rs[a, b, c], oct_par))
                        cols.append(jnp.concatenate(zs, axis=3))
                    rows_.append(jnp.concatenate(cols, axis=2))
                return jnp.concatenate(rows_, axis=1)

            out = jax.vmap(assemble)(own, restr, cs_c)
            out = jax.vmap(
                lambda u: euler.enforce_limits(
                    u, opts.eos, opts.density_floor,
                    opts.temperature_floor, opts.n_scalars,
                )
            )(out)
            return pk.pack(out[:, :nh]), (
                pk.pack(out[:, nh:]) if Ur_p is not None else None
            )

        sim._pool_jits[key] = jax.jit(prog)
        sim._pool_jits[key + ("w",)] = pk.make_row_writer(3)
    prog = sim._pool_jits[key]
    w3 = sim._pool_jits[key + ("w",)]

    cs = st.child_slots
    Uh, Ur = st.Uh, st.Ur
    n_live = -(-st.meta.n_active // chunk)
    for ci in range(n_live):
        i0 = ci * chunk
        hp, rp = prog(Uh, Ur, child.Uh, child.Ur, cs[i0:i0 + chunk],
                      jnp.asarray(i0, jnp.int32))
        # avgdown is pointwise in the parent row (no parent-neighbor
        # reads), so immediate in-place writes are exact
        Uh = w3(Uh, hp, i0)
        if rp is not None:
            Ur = w3(Ur, rp, i0)
    st.Uh, st.Ur = Uh, Ur


# ------------------------------------------------------------------ reflux
def reflux_packed(sim, l: int, own_bufs: Dict, Ffine_sum: Dict, dt_c):
    """Coarse-fine flux correction on packed parent l: complete the
    child-scattered parent-indexed registers across parent-tile faces,
    then apply the existing correction kernel on a TRANSIENT 5D unpack of
    the parent (parent levels are an 8th of the leaf's bytes)."""
    from .pool_advance import reflux_pool_parent

    st = sim.level_pool[l]
    ts = sim.tile_shape
    nh = sim.layout.nvar_hydro
    nv = sim.layout.nvar
    nr = nv - nh

    key = ("pk_reflux", l)
    if key not in sim._pool_jits:

        dx = sim.level_opts[l].dx
        rad_fix = sim._rad_fixup_pool

        def prog(Uh, Ur, own, Ffine, child_slots, nbr, dt_c):
            U5 = pk.unpack(Uh, nh, ts)
            if Ur is not None:
                U5 = jnp.concatenate([U5, pk.unpack(Ur, nr, ts)], axis=1)
            Ff = pk.complete_face_registers(Ffine, nbr)
            U5 = reflux_pool_parent(
                U5, own, Ff, child_slots, nbr, dt_c, dx, ts
            )
            U5 = rad_fix(U5)
            return pk.pack(U5[:, :nh]), (
                pk.pack(U5[:, nh:]) if Ur is not None else None
            )

        sim._pool_jits[key] = jax.jit(prog)
    Uh, Ur = sim._pool_jits[key](
        st.Uh, st.Ur, own_bufs, Ffine_sum, st.child_slots,
        st.meta.nbr_dev, jnp.asarray(dt_c, sim.dtype),
    )
    st.Uh, st.Ur = Uh, Ur


# ---------------------------------------------------------- sums / signals
def packed_level_sums(sim, l: int):
    """Mask-weighted composite conservation sums of packed level l
    (uncovered active cells only), streamed."""
    st = sim.level_pool[l]
    ts = sim.tile_shape
    nh = sim.layout.nvar_hydro
    nv = sim.layout.nvar
    nr = nv - nh
    chunk = sim.packed_chunk
    vol = sim.level_grids[l].cell_volume()

    key = ("pk_sums", l)
    if key not in sim._pool_jits:

        def prog(Uh, Ur, cs_c, act_c, i0):
            own = pk.unpack(pk.row_slice(Uh, i0, chunk), nh, ts)
            if Ur is not None:
                own = jnp.concatenate(
                    [own, pk.unpack(pk.row_slice(Ur, i0, chunk), nr, ts)],
                    axis=1,
                )
            cov = tp.coverage_cells(cs_c, ts)
            w = act_c[:, None, None, None] & ~cov
            return jnp.sum(jnp.where(w[:, None], own, 0.0),
                           axis=(0, 2, 3, 4))

        sim._pool_jits[key] = jax.jit(prog)
    prog = sim._pool_jits[key]
    cs = st.child_slots if st.child_slots is not None else st.no_children()
    amask = sim._pool_active_mask(l)
    total = None
    n_live = -(-st.meta.n_active // chunk)
    for ci in range(n_live):
        i0 = ci * chunk
        part = prog(st.Uh, st.Ur, cs[i0:i0 + chunk],
                    amask[i0:i0 + chunk], jnp.asarray(i0, jnp.int32))
        total = part if total is None else total + part
    if total is None:
        total = jnp.zeros((nv,), sim.dtype)
    return total * vol


def packed_max_signal(sim, l: int):
    """Max hydro signal speed over packed level l's active tiles."""
    st = sim.level_pool[l]
    ts = sim.tile_shape
    nh = sim.layout.nvar_hydro
    chunk = sim.packed_chunk
    opts = sim.level_opts[l]

    key = ("pk_sig", l)
    if key not in sim._pool_jits:

        def prog(Uh, act_c, i0):
            own = pk.unpack(pk.row_slice(Uh, i0, chunk), nh, ts)
            sig = jax.vmap(
                lambda u: jnp.max(euler.max_signal_speed(u, opts.eos))
            )(own)
            return jnp.max(jnp.where(act_c, sig, 0.0))

        sim._pool_jits[key] = jax.jit(prog)
    prog = sim._pool_jits[key]
    amask = sim._pool_active_mask(l)
    smax = jnp.zeros((), sim.dtype)
    n_live = -(-st.meta.n_active // chunk)
    for ci in range(n_live):
        i0 = ci * chunk
        smax = jnp.maximum(
            smax, prog(st.Uh, amask[i0:i0 + chunk],
                       jnp.asarray(i0, jnp.int32))
        )
    return smax


# --------------------------------------------------------------- timestep
def timestep_pool_packed(sim, l: int, t_level: float, dt_l: float):
    """One substep of packed pool level l: fused streamed hydro advance,
    streamed radiation subcycle, recursion into packed children, reflux
    and average-down -- the packed analog of
    `AMRSimulation._timestep_pool` with identical update semantics."""
    if (
        l < sim.max_level
        and sim.level_steps[l] > 0
        and sim.level_steps[l] % sim.regrid_interval == 0
    ):
        sim._regrid_level(l)

    from ..utils.profiler import prof
    from . import packed as pk

    st = sim.level_pool[l]
    meta = st.meta
    dtype = sim.dtype
    ts = sim.tile_shape
    g = sim._g
    nh = sim.layout.nvar_hydro
    nv = sim.layout.nvar
    nr = nv - nh
    active = sim.grid.active_axes
    chunk = sim.packed_chunk
    theta1 = (t_level - sim._parent_t) / sim._parent_dt
    theta2 = theta1 + dt_l / sim._parent_dt
    nbr, org = meta.nbr_dev, meta.origin_dev
    zero = jnp.zeros((meta.capacity,), jnp.int32)
    zero3 = jnp.zeros((meta.capacity, 3), jnp.int32)
    ps = st.parent_slot if st.parent_slot is not None else zero
    po = st.parent_off if st.parent_off is not None else zero3
    is_leaf = l >= sim.finest_level
    opts = sim._pool_opts(l)

    ctx_kind, ctx = sim._parent_ctx
    if ctx_kind == "dense":
        # dense parent: SPLIT ghost pads at gp2 (built by the handoff --
        # hydro and radiation parts are padded separately so no full-
        # layout pad or eager component slice ever exists)
        ph_o, ph_n, pr_o, pr_n = ctx
        bmode = "dense"
        bd_h = pk.make_dense_backdrop_fn(ts, g, active)
        bd_r = bd_h
        pargs_h = (ph_o, ph_n)
        pargs_r = (pr_o, pr_n) if nr else None
    elif ctx_kind == "ppool":
        (Uh_o, Uh_n, Ur_o, Ur_n, gp4, nbr_p, org_p, tha, thb) = ctx
        bmode = "pool"
        ph_o, ph_n, pr_o, pr_n = gp4
        gpa_h = (1.0 - tha) * ph_o + tha * ph_n
        gpb_h = (1.0 - thb) * ph_o + thb * ph_n
        bd_h = pk.make_pool_backdrop_fn(ts, g, active, nh)
        pargs_h = (Uh_o, Uh_n, gpa_h, gpb_h, nbr_p, org_p)
        if nr:
            gpa_r = (1.0 - tha) * pr_o + tha * pr_n
            gpb_r = (1.0 - thb) * pr_o + thb * pr_n
            bd_r = pk.make_pool_backdrop_fn(ts, g, active, nr)
            pargs_r = (Ur_o, Ur_n, gpa_r, gpb_r, nbr_p, org_p)
    else:
        raise NotImplementedError(f"packed parent ctx {ctx_kind}")

    restr_mode = "child" if ctx_kind == "dense" else "parent"
    parent_cap = 0 if ctx_kind == "dense" else ctx[0].shape[0]

    Uh_old, Ur_old = st.Uh, st.Ur
    with prof.region(f"hydro_P{l}"):
        Uh_new, own_h, Ffine_h, stats = pk.fused_hydro_advance_packed(
            Uh_old, jnp.asarray(dt_l, dtype), opts, nbr, org, ps, po,
            meta.n_active, st.max_nbr_dist, bd_h, bmode, pargs_h,
            theta1, theta2, chunk, active, ts, nh,
            sim._pool_jits, (l, meta.epoch),
            own_out=not is_leaf, parent_cap=parent_cap,
            restr_mode=restr_mode, in_place=is_leaf,
        )
        prof.sync(Uh_new)
    if hasattr(sim, "_substep_valid_flags"):
        sim._substep_valid_flags.append(stats["valid"])
    if "n_fofc" in stats:
        sim.fofc_counts.append(stats["n_fofc"])

    own_r = Ffine_r = None
    Ur_new = Ur_old
    if sim.layout.radiation_enabled and sim._radiation is not None and nr:
        ropts = sim._get_pool_rad(l).opts
        dt_rad = ropts.cfl * sim.level_grids[l].dx_min / ropts.chat
        import math as _m

        nsub = max(1, int(_m.ceil(dt_l / dt_rad)))
        if nsub > ropts.max_substeps + 1:
            raise RuntimeError(
                f"radiation substeps {nsub} > max {ropts.max_substeps}"
            )
        with prof.region(f"rad_P{l}"):
            Uh_new, Ur_new, own_r, Ffine_r, rad_ok = (
                pk.fused_rad_subcycle_packed(
                    Uh_new, Ur_old, t_level, dt_l, nsub, ropts, opts,
                    sim.layout, sim.eos, sim.problem, sim.level_grids[l],
                    nbr, org, ps, po, meta.n_active, st.max_nbr_dist,
                    bd_r, bmode, pargs_r, theta1, theta2, chunk, active,
                    ts, sim._pool_jits, (l, meta.epoch, "r"),
                    own_out=not is_leaf, parent_cap=parent_cap,
                    restr_mode=restr_mode,
                    preserve_r_input=not is_leaf,
                )
            )
            prof.sync(Ur_new)
        sim._substep_valid_flags.append(rad_ok)
        Ffine = {d: jnp.concatenate([Ffine_h[d], Ffine_r[d]], axis=1)
                 for d in Ffine_h}
        own_all = (None if is_leaf else {
            d: jnp.concatenate([own_h[d], own_r[d]], axis=1) for d in own_h
        })
    else:
        Ffine = Ffine_h
        own_all = own_h

    st.Uh, st.Ur = Uh_new, Ur_new
    sim.level_steps[l] += 1
    sim.cell_updates += meta.active_cells
    sim.cell_updates_raw += meta.active_cells

    if not is_leaf:
        # hand this level's window to the packed child
        th1a = jnp.asarray(theta1, dtype)
        th2a = jnp.asarray(theta2, dtype)
        if ctx_kind == "dense":
            gp4 = ctx
        else:
            raise NotImplementedError(
                "packed hierarchies deeper than 2 pool levels (the child "
                "backdrop needs a dense grandparent)"
            )
        saved = (sim._parent_ctx, sim._parent_t, sim._parent_dt)
        sim._parent_ctx = ("ppool", (
            Uh_old, st.Uh, Ur_old, st.Ur, gp4, nbr, org, th1a, th2a,
        ))
        sim._parent_t = t_level
        sim._parent_dt = dt_l

        n_fine = 2 if sim.do_subcycle else 1
        w = 1.0 / n_fine
        fine_sum = None
        for i in range(n_fine):
            timestep_pool_packed(sim, l + 1, t_level + i * dt_l * w,
                                 dt_l * w)
            ff = sim._last_packed_Ffine
            if fine_sum is None:
                fine_sum = {d: w * F for d, F in ff.items()}
            else:
                fine_sum = {d: fine_sum[d] + w * ff[d] for d in ff}
        (sim._parent_ctx, sim._parent_t, sim._parent_dt) = saved

        if sim.do_reflux:
            with prof.region(f"reflux_P{l}"):
                reflux_packed(sim, l, own_all, fine_sum, dt_l)
        with prof.region(f"avgdown_P{l}"):
            avgdown_packed(sim, l)

    if restr_mode == "child":
        sim._last_restricted_fluxes = Ffine
        sim._last_packed_Ffine = None
    else:
        sim._last_packed_Ffine = Ffine


# -------------------------------------------------- dense-parent consumers
def avgdown_packed_into_dense(sim, l: int):
    """Average packed child (l+1) tiles into the DENSE parent level l,
    streamed over child chunks (scatters restricted tiles at origins/2)."""
    child = sim.level_pool[l + 1]
    ts = sim.tile_shape
    nh = sim.layout.nvar_hydro
    nv = sim.layout.nvar
    nr = nv - nh
    chunk = sim.packed_chunk
    active = sim.grid.active_axes
    opts = sim.level_opts[l]
    half = tuple(t // 2 for t in ts)

    key = ("pk_avgdown_dense", l)
    if key not in sim._pool_jits:

        def prog(U, Uh_c, Ur_c, org_c, act_c, i0):
            own = pk.unpack(pk.row_slice(Uh_c, i0, chunk), nh, ts)
            if Ur_c is not None:
                own = jnp.concatenate(
                    [own, pk.unpack(pk.row_slice(Ur_c, i0, chunk), nr, ts)],
                    axis=1,
                )
            restr = jax.vmap(lambda u: ops.restrict(u, active))(own)

            def body(Uacc, args):
                o, a, val = args
                start = (jnp.zeros((), jnp.int32),
                         o[0] // 2, o[1] // 2, o[2] // 2)
                cur = jax.lax.dynamic_slice(Uacc, start, val.shape)
                new = jnp.where(a, val, cur)
                return jax.lax.dynamic_update_slice(Uacc, new, start), None

            U, _ = jax.lax.scan(body, U, (org_c, act_c, restr))
            return U

        sim._pool_jits[key] = jax.jit(prog, donate_argnums=0)
        sim._pool_jits[key + ("lim",)] = jax.jit(
            lambda U: euler.enforce_limits(
                U, opts.eos, opts.density_floor, opts.temperature_floor,
                opts.n_scalars,
            )
        )
    prog = sim._pool_jits[key]

    U = sim.level_U[l]
    amask = sim._pool_active_mask(l + 1)
    n_live = -(-child.meta.n_active // chunk)
    org = child.meta.origin_dev
    for ci in range(n_live):
        i0 = ci * chunk
        U = prog(U, child.Uh, child.Ur, org[i0:i0 + chunk],
                 amask[i0:i0 + chunk], jnp.asarray(i0, jnp.int32))
    # limits over the WHOLE dense level AFTER the scatter (the
    # `_pool_child_avgdown_dense` ordering, bitwise-identical)
    sim.level_U[l] = sim._pool_jits[key + ("lim",)](U)
