"""RK2-SSP hydro advance over a tile pool.

Same numerics as `hydro.advance.advance_hydro_rk2`'s classic path (the
contraction-stable flux formulation), vmapped over the tile axis, with the
two ghost fills (stage 1 at the substep start time, stage 2 at its end)
running OUTSIDE the vmap -- they gather across tiles (neighbor slabs +
parent donors, `tilepool.fill_pool_ghosts`).

FOFC stays branch-free per tile but cond-gated GLOBALLY over the pool: the
first-order backup sweep and the mask halo fill run only when any tile
flagged a redo, exactly like the dense path's device-side gating. The redo
mask lives on real tile cells only (reference semantics: redoFlag is
defined on patch cells, ``src/QuokkaSimulation.hpp:1144-1184``; the
dense-mask path additionally flags prolonged backdrop cells).
"""

from __future__ import annotations

from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from ..hydro import euler
from ..hydro.advance import (
    HydroOptions,
    _blend_fofc,
    add_internal_energy_pdv,
    compute_fluxes,
    rhs_from_fluxes,
)
from ..stencil import interior
from . import tilepool as tp


def _fluxes_of(Ug_pool, opts: HydroOptions, first_order: bool = False):
    return jax.vmap(lambda ug: compute_fluxes(ug, opts, first_order))(Ug_pool)


def advance_pool_hydro_rk2(
    U_pool: jnp.ndarray,
    dt,
    opts: HydroOptions,
    fill1: Callable[[jnp.ndarray], jnp.ndarray],
    fill2: Callable[[jnp.ndarray], jnp.ndarray],
    nbr: jnp.ndarray,
    return_fluxes: bool = False,
) -> Tuple[jnp.ndarray, Dict]:
    """One RK2-SSP hydro step of every tile in the pool.

    `fill1`/`fill2` map the unpadded pool to ghost-padded tiles (stage-2
    fills interpolate the parent at the substep END time, the reference's
    FillPatcher semantics). `nbr` is the pool's 26-direction neighbor
    table (for the FOFC mask halo). With `return_fluxes`, stats carries
    the final per-tile time-averaged face fluxes (padded face coords) that
    feed the parent's flux register."""
    g = opts.nghost
    ng3 = (g, g, g)
    eos = opts.eos

    def apply_pool(Ug_pool, fl, fv, mask_p):
        def one(u, ug, fls, fvs, m):
            rhs = rhs_from_fluxes(fls, opts)
            rhs = add_internal_energy_pdv(rhs, ug, fvs, opts, m)
            return u + dt * interior(rhs, ng3)

        if mask_p is None:
            return jax.vmap(
                lambda u, ug, fls, fvs: one(u, ug, fls, fvs, None)
            )(U_pool, Ug_pool, fl, fv)
        return jax.vmap(one)(U_pool, Ug_pool, fl, fv, mask_p)

    def finalize(Up):
        Up = jax.vmap(
            lambda u: euler.enforce_limits(
                u, eos, opts.density_floor, opts.temperature_floor,
                opts.n_scalars,
            )
        )(Up)
        if opts.use_dual_energy and not eos.is_isothermal:
            Up = jax.vmap(euler.sync_dual_energy)(Up)
        return Up

    def stage(Ug0, fl, fv):
        """Flux application with pool-wide cond-gated masked FOFC."""
        U_try = apply_pool(Ug0, fl, fv, None)
        redo = jax.vmap(
            lambda u: jnp.logical_not(euler.is_state_valid(u, eos))
        )(U_try)
        n_redo = jnp.sum(redo)

        def _redo_branch(_):
            fo_fl, fo_fv = _fluxes_of(Ug0, opts, first_order=True)
            mask_p = tp.fill_pool_ghosts_like(redo[:, None], nbr, g)[:, 0]
            fl2, fv2 = jax.vmap(
                lambda a, b, c, d, m: _blend_fofc(a, b, c, d, m, opts)
            )(fl, fv, fo_fl, fo_fv, mask_p)
            return apply_pool(Ug0, fl2, fv2, mask_p), fl2, fv2

        def _clean(_):
            return U_try, fl, fv

        U_new, flb, fvb = lax.cond(jnp.any(redo), _redo_branch, _clean, None)
        return finalize(U_new), flb, fvb, n_redo

    # ---- stage 1
    Ug0 = fill1(U_pool)
    fl1, fv1 = _fluxes_of(Ug0, opts)
    U1, fl1b, fv1b, n1 = stage(Ug0, fl1, fv1)

    if opts.rk_order == 1:
        stats = {"n_fofc": n1}
        if return_fluxes:
            stats["fluxes"] = fl1b
        return U1, stats

    # ---- stage 2: time-averaged flux applied to U0 (Heun / RK2-SSP).
    # Both the fluxes AND the face velocities average the POST-BLEND
    # stage-1 values (dense-path rk2_stage semantics).
    Ug1 = fill2(U1)
    fl2, fv2 = _fluxes_of(Ug1, opts)
    flA = {d: 0.5 * (fl1b[d] + fl2[d]) for d in fl2}
    fvA = {d: 0.5 * (fv1b[d] + fv2[d]) for d in fv2}
    U2, flAb, _, n2 = stage(Ug0, flA, fvA)

    stats = {"n_fofc": n1 + n2}
    if return_fluxes:
        stats["fluxes"] = flAb
    return U2, stats


def advance_pool_hydro_rk2_chunked(
    U_pool: jnp.ndarray,
    dt,
    opts: HydroOptions,
    nbr: jnp.ndarray,
    org: jnp.ndarray,
    ps: jnp.ndarray,
    po: jnp.ndarray,
    make_backdrop: Callable,
    pp1: jnp.ndarray,
    pp2: jnp.ndarray,
    chunk: int,
    with_own_faces: bool,
    active_axes=(0, 1, 2),
) -> Tuple[jnp.ndarray, Dict | None, Dict, Dict]:
    """Memory-lean variant of `advance_pool_hydro_rk2`: tiles advance in
    CHUNKS under `lax.map`, and each chunk assembles its own ghost-padded
    tiles (neighbor slab gathers + `make_backdrop(org_c, ps_c, po_c, pp)`
    donors from the pre-lerped parent padded state `pp1`/`pp2` for the
    stage-1/stage-2 times), so no full-pool padded array or face-flux dict is
    ever materialized -- live memory is O(pool state) + O(chunk). Stage 2
    re-assembles the stage-1 fill per chunk instead of holding stage-1
    fluxes (+~50% flux work, the price of O(1) memory on the reference's
    1024^3-class fine levels).

    Returns (U2, faces_own | None, faces_restr, stats): faces sliced to
    [0..t] (own resolution, only when `with_own_faces` -- the level has
    children to reflux against) and restricted to the parent resolution."""
    g = opts.nghost
    ng3 = (g, g, g)
    eos = opts.eos
    T = U_pool.shape[0]
    if T % chunk:
        raise ValueError(f"pool capacity {T} not divisible by chunk {chunk}")
    Nc = T // chunk
    ts = U_pool.shape[2:]

    def chunked(x):
        return x.reshape(Nc, chunk, *x.shape[1:])

    def unchunk(x):
        return x.reshape(T, *x.shape[2:])

    def unchunk_tree(tree):
        return jax.tree_util.tree_map(unchunk, tree)

    def fluxes_c(ug_c, first_order=False):
        return jax.vmap(
            lambda ug: compute_fluxes(ug, opts, first_order)
        )(ug_c)

    def apply_c(u_c, ug_c, fl, fv, m_c):
        def one(u, ug, fls, fvs, m):
            rhs = rhs_from_fluxes(fls, opts)
            rhs = add_internal_energy_pdv(rhs, ug, fvs, opts, m)
            return u + dt * interior(rhs, ng3)

        if m_c is None:
            return jax.vmap(
                lambda u, ug, fls, fvs: one(u, ug, fls, fvs, None)
            )(u_c, ug_c, fl, fv)
        return jax.vmap(one)(u_c, ug_c, fl, fv, m_c)

    def finalize(Up):
        Up = jax.vmap(
            lambda u: euler.enforce_limits(
                u, eos, opts.density_floor, opts.temperature_floor,
                opts.n_scalars,
            )
        )(Up)
        if opts.use_dual_energy and not eos.is_isothermal:
            Up = jax.vmap(euler.sync_dual_energy)(Up)
        return Up

    def fill_c(u_c, nbr_c, org_c, ps_c, po_c, pp, slabs):
        bd = make_backdrop(org_c, ps_c, po_c, pp)
        return tp.assemble_padded(u_c, nbr_c, bd, slabs, g)

    def faces_of(fl_c):
        own = slice_tile_faces(fl_c, g, ts)
        restr = restrict_tile_faces(own, active_axes)
        return (own if with_own_faces else None), restr

    meta_in = (chunked(nbr), chunked(org), chunked(ps), chunked(po))
    slabs0 = tp.slice_slabs(U_pool, g)

    # ---- stage 1
    def s1_body(args):
        u_c, nbr_c, org_c, ps_c, po_c = args
        ug = fill_c(u_c, nbr_c, org_c, ps_c, po_c, pp1, slabs0)
        fl, fv = fluxes_c(ug)
        U1c = apply_c(u_c, ug, fl, fv, None)
        redo = jax.vmap(
            lambda u: jnp.logical_not(euler.is_state_valid(u, eos))
        )(U1c)
        return U1c, redo

    U1, redo1 = lax.map(s1_body, (chunked(U_pool),) + meta_in)
    U1, redo1 = unchunk(U1), unchunk(redo1)
    n1 = jnp.sum(redo1)

    def s1_redo(_):
        mask_p = tp.fill_pool_ghosts_like(redo1[:, None], nbr, g)[:, 0]

        def body(args):
            u_c, nbr_c, org_c, ps_c, po_c, m_c = args
            ug = fill_c(u_c, nbr_c, org_c, ps_c, po_c, pp1, slabs0)
            fl, fv = fluxes_c(ug)
            fo_fl, fo_fv = fluxes_c(ug, first_order=True)
            flb, fvb = jax.vmap(
                lambda a, b, c, d, m: _blend_fofc(a, b, c, d, m, opts)
            )(fl, fv, fo_fl, fo_fv, m_c)
            return apply_c(u_c, ug, flb, fvb, m_c)

        return unchunk(
            lax.map(body, (chunked(U_pool),) + meta_in + (chunked(mask_p),))
        )

    U1 = lax.cond(jnp.any(redo1), s1_redo, lambda _: U1, None)
    U1 = finalize(U1)
    # stage-2 averages the POST-BLEND stage-1 fluxes (dense-path
    # semantics, hydro/advance.py rk2_stage -> flux_avg; previously the
    # chunked path re-averaged the raw high-order fl1 when stage-1 FOFC
    # had fired). Zero mask when clean: _blend_fofc is then the identity
    # and the per-chunk cond skips the first-order flux computation.
    pad3 = tuple(t + 2 * g for t in ts)
    mask1_p = lax.cond(
        jnp.any(redo1),
        lambda _: tp.fill_pool_ghosts_like(redo1[:, None], nbr, g)[:, 0],
        lambda _: jnp.zeros((T,) + pad3, bool),
        None,
    )

    def s1_fluxes_blended(ug0, m1_c):
        fl1, fv1 = fluxes_c(ug0)

        def blend(_):
            fo_fl, fo_fv = fluxes_c(ug0, first_order=True)
            return jax.vmap(
                lambda a, b, c, d, m: _blend_fofc(a, b, c, d, m, opts)
            )(fl1, fv1, fo_fl, fo_fv, m1_c)

        return lax.cond(jnp.any(m1_c), blend, lambda _: (fl1, fv1), None)

    if opts.rk_order == 1:
        # faces from a dedicated chunked pass (rk1 is not the hot path)
        def f_body(args):
            u_c, nbr_c, org_c, ps_c, po_c = args
            ug = fill_c(u_c, nbr_c, org_c, ps_c, po_c, pp1, slabs0)
            fl, _ = fluxes_c(ug)
            return faces_of(fl)

        own, restr = lax.map(f_body, (chunked(U_pool),) + meta_in)
        return U1, unchunk_tree(own), unchunk_tree(restr), {"n_fofc": n1}

    # ---- stage 2 (time-averaged flux applied to U0)
    slabs1 = tp.slice_slabs(U1, g)

    def s2_body(args):
        u0_c, u1_c, nbr_c, org_c, ps_c, po_c, m1_c = args
        ug0 = fill_c(u0_c, nbr_c, org_c, ps_c, po_c, pp1, slabs0)
        ug1 = fill_c(u1_c, nbr_c, org_c, ps_c, po_c, pp2, slabs1)
        fl1, fv1 = s1_fluxes_blended(ug0, m1_c)
        fl2, fv2 = fluxes_c(ug1)
        flA = {d: 0.5 * (fl1[d] + fl2[d]) for d in fl2}
        fvA = {d: 0.5 * (fv1[d] + fv2[d]) for d in fv2}
        U2c = apply_c(u0_c, ug0, flA, fvA, None)
        redo = jax.vmap(
            lambda u: jnp.logical_not(euler.is_state_valid(u, eos))
        )(U2c)
        own, restr = faces_of(flA)
        return U2c, redo, own, restr

    U2, redo2, own, restr = lax.map(
        s2_body, (chunked(U_pool), chunked(U1)) + meta_in
        + (chunked(mask1_p),)
    )
    U2, redo2 = unchunk(U2), unchunk(redo2)
    own = unchunk_tree(own)
    restr = unchunk_tree(restr)
    n2 = jnp.sum(redo2)

    def s2_redo(_):
        mask_p = tp.fill_pool_ghosts_like(redo2[:, None], nbr, g)[:, 0]

        def body(args):
            u0_c, u1_c, nbr_c, org_c, ps_c, po_c, m_c, m1_c = args
            ug0 = fill_c(u0_c, nbr_c, org_c, ps_c, po_c, pp1, slabs0)
            ug1 = fill_c(u1_c, nbr_c, org_c, ps_c, po_c, pp2, slabs1)
            fl1, fv1 = s1_fluxes_blended(ug0, m1_c)
            fl2, fv2 = fluxes_c(ug1)
            flA = {d: 0.5 * (fl1[d] + fl2[d]) for d in fl2}
            fvA = {d: 0.5 * (fv1[d] + fv2[d]) for d in fv2}
            fo_fl, fo_fv = fluxes_c(ug0, first_order=True)
            flb, fvb = jax.vmap(
                lambda a, b, c, d, m: _blend_fofc(a, b, c, d, m, opts)
            )(flA, fvA, fo_fl, fo_fv, m_c)
            U2c = apply_c(u0_c, ug0, flb, fvb, m_c)
            ownb, restrb = faces_of(flb)
            return U2c, ownb, restrb

        out = lax.map(
            body,
            (chunked(U_pool), chunked(U1)) + meta_in
            + (chunked(mask_p), chunked(mask1_p)),
        )
        return jax.tree_util.tree_map(unchunk, out)

    def s2_clean(_):
        return U2, own, restr

    U2, own, restr = lax.cond(jnp.any(redo2), s2_redo, s2_clean, None)
    U2 = finalize(U2)
    return U2, own, restr, {"n_fofc": n1 + n2}


def slice_tile_faces(F_pool: Dict[int, jnp.ndarray], g: int,
                     tile_shape) -> Dict[int, jnp.ndarray]:
    """Padded-face-coord per-tile fluxes -> interior faces [0..t] inclusive
    along the flux axis, interior cells transversally."""
    out = {}
    for d, F in F_pool.items():
        idx = [slice(None), slice(None)]
        for e in range(3):
            t = tile_shape[e]
            if e == d:
                idx.append(slice(g, g + t + 1))
            else:
                idx.append(slice(g, g + t))
        out[d] = F[tuple(idx)]
    return out


def restrict_tile_faces(F_faces: Dict[int, jnp.ndarray],
                        active_axes) -> Dict[int, jnp.ndarray]:
    """Per-tile fine face fluxes (faces [0..t] along d) restricted to the
    parent resolution: even faces along d, 2x2 transverse average --
    `ops.restrict_face_flux` semantics without the padding bookkeeping."""
    out = {}
    for d, F in F_faces.items():
        cur = F
        for e in active_axes:
            ax = cur.ndim - 3 + e
            n = cur.shape[ax]
            if e == d:
                sub = [slice(None)] * cur.ndim
                sub[ax] = slice(0, n, 2)
                cur = cur[tuple(sub)]
            else:
                shape = list(cur.shape)
                new_shape = shape[:ax] + [n // 2, 2] + shape[ax + 1:]
                cur = cur.reshape(new_shape).mean(axis=ax + 1)
        out[d] = cur
    return out


def reflux_pool_parent(
    U_parent: jnp.ndarray,
    F_crse: Dict[int, jnp.ndarray],
    F_fine: Dict[int, jnp.ndarray],
    child_slots: jnp.ndarray,
    parent_nbr: jnp.ndarray,
    dt_c,
    dx,
    tile_shape,
) -> jnp.ndarray:
    """Apply the coarse-fine flux mismatch to uncovered parent-tile cells
    (reference `YAFluxRegister::Reflux`; dense analog
    `hierarchy._reflux`).

    F_crse[d]: parent tiles' own faces [0..t] along d (from
    `slice_tile_faces`). F_fine[d]: restricted child fluxes assembled on
    parent faces (`tilepool.assemble_children_faces`). Boundary faces are
    those where child coverage flips across the face; coverage is padded
    1 cell across tile boundaries through the neighbor table."""
    covf = tp.coverage_cells(child_slots, tile_shape)
    cov_p = tp.fill_pool_ghosts_like(covf[:, None], parent_nbr, 1)[:, 0]

    def one(u, fc_t, ff_t, cp, covc):
        corr = None
        for d in sorted(fc_t):
            t = tile_shape[d]
            # cp is padded by 1 on all axes; face f (0..t) along d sits
            # between padded cells f and f+1, interior transversally
            lo = [slice(1, 1 + tile_shape[e]) for e in range(3)]
            hi = list(lo)
            lo[d] = slice(0, t + 1)
            hi[d] = slice(1, t + 2)
            boundary = cp[tuple(lo)] != cp[tuple(hi)]  # faces [0..t]
            dF = jnp.where(boundary[None], ff_t[d] - fc_t[d], 0.0)
            n = dF.shape[1 + d]
            lo_f = [slice(None)] * 3
            lo_f[d] = slice(0, n - 1)
            hi_f = [slice(None)] * 3
            hi_f[d] = slice(1, n)
            contrib = (
                dF[(slice(None),) + tuple(lo_f)]
                - dF[(slice(None),) + tuple(hi_f)]
            ) * (dt_c / dx[d])
            corr = contrib if corr is None else corr + contrib
        nc = corr.shape[0]
        if nc < u.shape[0]:
            # flux register covers only the leading components
            pad = jnp.zeros((u.shape[0] - nc, *corr.shape[1:]), corr.dtype)
            corr = jnp.concatenate([corr, pad], axis=0)
        # apply only to uncovered cells (covered ones get averaged down)
        return u + jnp.where(covc[None], 0.0, corr)

    return jax.vmap(one)(U_parent, F_crse, F_fine, cov_p, covf)
