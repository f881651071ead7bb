"""Fused Pallas TPU sweep kernels for the hydro flux pipeline.

The reference runs reconstruction + Riemann solve as a handful of large GPU
kernels per direction (`hydroFluxFunction`, reference
``src/QuokkaSimulation.hpp:1494-1519``). The pure-XLA formulation of the
same pipeline fragments into ~300 fusions per step (each one a full HBM
round-trip), so the hot path here is a single Pallas kernel per sweep
direction: one read of the primitive state (+ 3 small precomputed transverse
fields), all of PPM + flattening + HLLC (or donor-cell + LLF for the
first-order FOFC fluxes) in VMEM, one write of the flux block.

Blocking: the sweep axis and the lane (z) axis stay whole inside each
block, so all stencil shifts are in-VMEM rolls; the kernel grid tiles the
remaining transverse dimension(s). Transverse-stencil quantities (the
Miller-Colella flattening coefficient combined over axes, and the one-sided
transverse velocity differences used by the carbuncle fix / artificial
viscosity) are precomputed once per stage as cheap fused XLA passes and
passed in as 3D fields.

The kernel reuses the *same* jnp math as the reference-parity XLA path
(`reconstruct.py` / `riemann.py` helpers operate on in-VMEM blocks), so
there is exactly one implementation of the numerics.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..indices import EGAS, EINT, MX1, PEINT, PPRES, PRHO, PVX1, RHO, SCALAR0
from ..stencil import sh
from . import euler, reconstruct
from .advance import HydroOptions, _transverse_axes
from .riemann import FaceState, hllc, llf


def precompute_transverse_fields(prim: jnp.ndarray, opts: HydroOptions,
                                 bc_kinds: dict | None = None):
    """Cheap fused XLA pass: per active axis t, the one-sided min velocity
    difference field dmin_t(c) = min(v_t(c+1_t) - v_t(c), v_t(c) - v_t(c-1_t))
    (used by the carbuncle dw and CW84 artificial viscosity), plus the
    combined flattening coefficient chi_cell = min over axes of the 3-point
    min of chi_t (reference `FlattenShocks`).

    `bc_kinds` = {axis: (lo_kind, hi_kind)} turns on wall-corrected stencil
    reads for the ghost-free path (unpadded lane-aligned arrays); None keeps
    plain roll semantics for ghost-padded inputs."""
    def shb(A, k, t, odd=False):
        if bc_kinds is None or bc_kinds.get(t) is None:
            return sh(A, k, t)
        from ..stencil import sh_bc

        lo_k, hi_k = bc_kinds[t]
        return sh_bc(A, k, t, lo_k, hi_k, odd)

    dmins = {}
    for t in opts.active_axes:
        v = prim[PVX1 + t]
        d_plus = shb(v, 1, t, odd=True) - v
        d_minus = v - shb(v, -1, t, odd=True)
        dmins[t] = jnp.minimum(d_plus, d_minus)

    chi_cell = None
    chi_ghost = {}
    if opts.use_flattening and opts.reconstruction_order == 3:
        from ..registry import BC_OUTFLOW

        chis, min3s = {}, {}
        for t in opts.active_axes:
            bc_axis = None if bc_kinds is None else bc_kinds.get(t)
            chi_t = reconstruct.flattening_chi(
                prim, t, opts.eos, opts.reconstruct_eint, bc_axis=bc_axis
            )
            chis[t] = chi_t
            m = jnp.minimum(jnp.minimum(shb(chi_t, -1, t), chi_t), shb(chi_t, 1, t))
            min3s[t] = m
            chi_cell = m if chi_cell is None else jnp.minimum(chi_cell, m)

        # exact adjacent-ghost chi_cell planes for OUTFLOW walls: with
        # replicated (foextrap) ghosts the along-axis flattening chi is
        # identically 1 at every ghost cell (all its stencil differences
        # vanish bit-exactly), so the padded path's ghost value is
        #   chi_cell[ghost_adj] = min(chi_d[edge], min_{t != d} min3_t[edge])
        # -- NOT the edge cell's chi_cell (which also folds in the
        # next-inward chi_d). The sweep kernels consume only the adjacent
        # ghost, so one plane per outflow side restores exactness.
        if bc_kinds is not None:
            from jax import lax

            for d in opts.active_axes:
                bc_axis = bc_kinds.get(d)
                if bc_axis is None:
                    continue
                lo_k, hi_k = bc_axis
                if lo_k != BC_OUTFLOW and hi_k != BC_OUTFLOW:
                    continue
                E = None
                for t in opts.active_axes:
                    if t == d:
                        continue
                    E = min3s[t] if E is None else jnp.minimum(E, min3s[t])
                n = prim.shape[1 + d]
                ghost_d = jnp.minimum(chis[d], E) if E is not None else chis[d]
                lo_pl = (
                    lax.slice_in_dim(ghost_d, 0, 1, axis=d)
                    if lo_k == BC_OUTFLOW else None
                )
                hi_pl = (
                    lax.slice_in_dim(ghost_d, n - 1, n, axis=d)
                    if hi_k == BC_OUTFLOW else None
                )
                chi_ghost[d] = (lo_pl, hi_pl)

    if bc_kinds is not None:
        return dmins, chi_cell, chi_ghost
    return dmins, chi_cell


def precompute_transverse_pallas(prim: jnp.ndarray, opts: HydroOptions,
                                 bc_kinds: dict | None,
                                 state_is_cons: bool = False):
    """Kernel-fused version of `precompute_transverse_fields` for the
    divergence fast path: one Pallas kernel per axis t (sweep axis whole
    in-block, so the +-2 chi stencil and the +-1 velocity-difference
    stencil are in-VMEM rolls; wall axes assemble their ghosts exactly
    like the sweep kernels, which reproduces the padded fill bit-exactly).
    The XLA formulation runs these as ~a dozen separate HBM passes over
    3D fields; here each axis is one read of prim + three 1-component
    writes. Returns (dmins, chi_cell, chi_ghost) like the XLA version.

    ``state_is_cons``: the input is the CONSERVED state; cons->prim runs
    in-VMEM after the wall-ghost assembly (bit-identical to converting the
    ghost-filled array -- the pointwise conversion commutes with mirror/
    edge-copy ghosts), which saves the HBM materialization of the
    primitive array on the hot path."""
    nv, X, Y, Z = prim.shape
    dtype = prim.dtype
    do_chi = opts.use_flattening and opts.reconstruction_order == 3

    dmins, min3s, chis = {}, {}, {}
    for t in opts.active_axes:
        shape4, imap4, grid = _block_spec_4d(nv, X, Y, Z, t, _BLOCK_TRANSVERSE)
        shape3 = shape4[1:]
        imap3 = (lambda *idx: imap4(*idx)[1:])
        bc_axis = None if bc_kinds is None else bc_kinds.get(t)
        n_sweep = prim.shape[1 + t]

        def kernel(prim_ref, *out_refs, t=t, bc_axis=bc_axis,
                   n_sweep=n_sweep):
            blk = prim_ref[...]
            g = 0
            if bc_axis is not None:
                g = 4
                blk = _assemble_wall_ghosts(
                    blk, t, bc_axis[0], bc_axis[1],
                    odd_comp=(MX1 if state_is_cons else PVX1) + t, g=g
                )
            if state_is_cons:
                blk = euler.cons_to_prim(blk, opts.eos, opts.reconstruct_eint)

            def islice(A):
                if g == 0:
                    return A
                i = [slice(None)] * A.ndim
                i[A.ndim - 3 + t] = slice(g, g + n_sweep)
                return A[tuple(i)]

            v = blk[PVX1 + t]
            d_plus = sh(v, 1, t) - v
            d_minus = v - sh(v, -1, t)
            out_refs[0][...] = islice(jnp.minimum(d_plus, d_minus))
            if do_chi:
                chi = reconstruct.flattening_chi(
                    blk, t, opts.eos, opts.reconstruct_eint
                )
                m3 = jnp.minimum(jnp.minimum(sh(chi, -1, t), chi),
                                 sh(chi, 1, t))
                out_refs[1][...] = islice(m3)
                out_refs[2][...] = islice(chi)

        n_out = 3 if do_chi else 1
        outs = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[pl.BlockSpec(shape4, imap4, memory_space=pltpu.VMEM)],
            out_specs=tuple(
                pl.BlockSpec(shape3, imap3, memory_space=pltpu.VMEM)
                for _ in range(n_out)
            ),
            out_shape=tuple(
                jax.ShapeDtypeStruct((X, Y, Z), dtype) for _ in range(n_out)
            ),
            interpret=_interpret_mode(),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=127 * 1024 * 1024,
            ),
        )(prim)
        dmins[t] = outs[0]
        if do_chi:
            min3s[t] = outs[1]
            chis[t] = outs[2]

    chi_cell = None
    if do_chi:
        for t in opts.active_axes:
            chi_cell = min3s[t] if chi_cell is None else jnp.minimum(
                chi_cell, min3s[t]
            )

    # exact adjacent-ghost chi_cell planes for OUTFLOW walls (same
    # derivation as precompute_transverse_fields)
    chi_ghost = {}
    if do_chi and bc_kinds is not None:
        from jax import lax

        from ..registry import BC_OUTFLOW

        for d in opts.active_axes:
            bc_axis = bc_kinds.get(d)
            if bc_axis is None:
                continue
            lo_k, hi_k = bc_axis
            if lo_k != BC_OUTFLOW and hi_k != BC_OUTFLOW:
                continue
            E = None
            for t in opts.active_axes:
                if t == d:
                    continue
                E = min3s[t] if E is None else jnp.minimum(E, min3s[t])
            n = prim.shape[1 + d]
            ghost_d = jnp.minimum(chis[d], E) if E is not None else chis[d]
            lo_pl = (
                lax.slice_in_dim(ghost_d, 0, 1, axis=d)
                if lo_k == BC_OUTFLOW else None
            )
            hi_pl = (
                lax.slice_in_dim(ghost_d, n - 1, n, axis=d)
                if hi_k == BC_OUTFLOW else None
            )
            chi_ghost[d] = (lo_pl, hi_pl)

    return dmins, chi_cell, chi_ghost


def _assemble_wall_ghosts(blk, ax: int, lo_kind: str, hi_kind: str,
                          odd_comp: int | None, g: int = 4,
                          adj_lo=None, adj_hi=None):
    """Extend a VMEM block by `g` ghost entries on each side of spatial axis
    `ax`, computing the ghost values from the block's own edge data (the
    wall BCs are local transforms: reflect = mirrored +- sign flip on the
    normal component, outflow = edge replication). This reproduces the
    ghost-padded fill exactly (``boundaries.physical_slabs``) without any
    HBM-resident padded array. `odd_comp` is the component index (axis 0 of
    a 4D block) whose sign flips under reflection, or None for an
    even/scalar block."""
    from ..registry import BC_REFLECT

    nax = blk.ndim - 3 + ax  # spatial axes are the last three
    n = blk.shape[nax]

    def take(a, b):
        idx = [slice(None)] * blk.ndim
        idx[nax] = slice(a, b)
        return blk[tuple(idx)]

    def reflect_sign(x):
        if odd_comp is None:
            return x
        # iota+select, not .at[].set (which Mosaic lowers as scatter)
        from jax import lax

        comp = lax.broadcasted_iota(
            jnp.int32, (blk.shape[0],) + (1,) * (blk.ndim - 1), 0
        )
        sign = jnp.where(comp == odd_comp,
                         jnp.asarray(-1.0, blk.dtype),
                         jnp.asarray(1.0, blk.dtype))
        return x * sign

    # mirror via g static single-entry slices (avoids lax.rev, which Mosaic
    # may not lower on the lane axis)
    if lo_kind == BC_REFLECT:
        lo = jnp.concatenate([take(g - 1 - j, g - j) for j in range(g)], axis=nax)
        lo = reflect_sign(lo)
    else:  # outflow / edge extrapolation
        shape = list(blk.shape)
        shape[nax] = g - 1 if adj_lo is not None else g
        lo = jnp.broadcast_to(take(0, 1), shape)
        if adj_lo is not None:
            # the wall-adjacent ghost entry (the only one the face stencils
            # read) gets the exact precomputed value
            lo = jnp.concatenate([lo, adj_lo], axis=nax)

    if hi_kind == BC_REFLECT:
        hi = jnp.concatenate(
            [take(n - 1 - j, n - j) for j in range(g)], axis=nax
        )
        hi = reflect_sign(hi)
    else:
        shape = list(blk.shape)
        shape[nax] = g - 1 if adj_hi is not None else g
        hi = jnp.broadcast_to(take(n - 1, n), shape)
        if adj_hi is not None:
            hi = jnp.concatenate([adj_hi, hi], axis=nax)

    return jnp.concatenate([lo, blk, hi], axis=nax)


def _sweep_body(prim_blk, chi_blk, dminv_blk, dminw_blk, axis, opts: HydroOptions,
                first_order: bool):
    """Kernel math on one VMEM block. `axis` here is the *block* spatial
    axis index (0..2 over the block's spatial dims); shifts along it are
    rolls (the sweep axis is whole inside the block, so roll wraparound
    touches only discarded ghost faces). Returns (flux_blk, facevel_blk)."""
    eos = opts.eos
    ax = axis + 1  # prim block is [NV, bx, by, bz]

    if first_order:
        qL, qR = reconstruct.donor_cell_faces(prim_blk, axis)
    else:
        qL, qR = reconstruct.reconstruct_faces(prim_blk, axis, opts.reconstruction_order)
        if chi_blk is not None:
            chi_m1 = sh(chi_blk, -1, axis)[None]
            chi_0 = chi_blk[None]
            qL = chi_m1 * qL + (1.0 - chi_m1) * sh(prim_blk, -1, ax)
            qR = chi_0 * qR + (1.0 - chi_0) * prim_blk

    vax, wax = _transverse_axes(axis, max(opts.ndim, 1))

    def face_state(q):
        rho = q[PRHO]
        rinv = 1.0 / rho
        u = q[PVX1 + axis]
        v = q[PVX1 + vax]
        w = q[PVX1 + wax]
        ke = 0.5 * rho * (u * u + v * v + w * w)
        if eos.is_isothermal:
            P = rho * eos.cs_isothermal**2
            cs = jnp.full_like(rho, eos.cs_isothermal)
            E = jnp.zeros_like(rho)
            Eint = jnp.zeros_like(rho)
        elif opts.reconstruct_eint:
            P = eos.pressure(rho, q[PPRES] * rho)
            Eint = rho * q[PEINT]
            cs = jnp.sqrt(eos.gamma * P * rinv)
            E = eos.eint_from_pres(rho, P) + ke
        else:
            P = q[PPRES]
            Eint = q[PEINT]
            cs = jnp.sqrt(eos.gamma * P * rinv)
            E = eos.eint_from_pres(rho, P) + ke
        scalars = q[SCALAR0:] if q.shape[0] > SCALAR0 else None
        return FaceState(rho=rho, u=u, v=v, w=w, P=P, cs=cs, E=E, Eint=Eint,
                         scalars=scalars, rinv=rinv)

    sL = face_state(qL)
    sR = face_state(qR)

    if first_order:
        F = llf(sL, sR)
    else:
        un = prim_blk[PVX1 + axis]
        du = un - sh(un, -1, axis)

        dvl = dvr = dwl = dwr = 0.0
        dw = None
        if dminv_blk is not None:
            dvl, dvr = sh(dminv_blk, -1, axis), dminv_blk
            dw = jnp.minimum(dvl, dvr)
        if dminw_blk is not None:
            dwl, dwr = sh(dminw_blk, -1, axis), dminw_blk
            m2 = jnp.minimum(dwl, dwr)
            dw = m2 if dw is None else jnp.minimum(dw, m2)
        if dw is None:
            dw = jnp.zeros_like(du)

        F = hllc(sL, sR, eos, du, dw)

        if opts.K_visc > 0.0:
            div_v = du
            if dminv_blk is not None:
                div_v = div_v + 0.5 * (dvl + dvr)
            if dminw_blk is not None:
                div_v = div_v + 0.5 * (dwl + dwr)
            viscosity = opts.K_visc * jnp.maximum(-div_v, 0.0)
            F = F + viscosity[None] * (sL.conserved() - sR.conserved())

    # canonical -> state component order
    comps = [None] * F.shape[0]
    comps[RHO] = F[0]
    comps[MX1 + axis] = F[1]
    comps[MX1 + vax] = F[2]
    comps[MX1 + wax] = F[3]
    comps[EGAS] = F[4]
    comps[EINT] = F[5]
    for n in range(opts.n_scalars):
        comps[SCALAR0 + n] = F[6 + n]
    Fout = jnp.stack(comps)

    if eos.is_isothermal:
        Fout = Fout.at[EGAS].set(0.0).at[EINT].set(0.0)

    if opts.n_mscalars > 0:
        mrho = Fout[RHO]
        upwind_is_L = mrho >= 0.0
        sum_L = jnp.sum(sL.scalars[: opts.n_mscalars], axis=0)
        sum_R = jnp.sum(sR.scalars[: opts.n_mscalars], axis=0)
        for n in range(opts.n_mscalars):
            f_L = mrho * sL.scalars[n] / sum_L
            f_R = mrho * sR.scalars[n] / sum_R
            Fout = Fout.at[SCALAR0 + n].set(jnp.where(upwind_is_L, f_L, f_R))

    facevel = Fout[RHO] * jnp.where(Fout[RHO] >= 0.0, sR.rinv, sL.rinv)
    return Fout, facevel


_SWEEP_CHUNK = int(
    __import__("os").environ.get("QUOKKA_PALLAS_SWEEP_CHUNK", "0")
)
_SWEEP_CHUNK_ABOVE = int(
    __import__("os").environ.get("QUOKKA_PALLAS_SWEEP_CHUNK_ABOVE", "272")
)


def _wrap_slice(A, axis, s, e):
    """Slice [s, e) along block spatial axis `axis`, wrapping out-of-range
    indices around the array ends (in-VMEM roll semantics: the whole-axis
    kernels read shifted values through jnp.roll wraparound, so chunk
    halos at the array ends must reproduce exactly those values)."""
    nax = A.ndim - 3 + axis
    n = A.shape[nax]

    def seg(a, b):
        idx = [slice(None)] * A.ndim
        idx[nax] = slice(a, b)
        return A[tuple(idx)]

    parts = []
    if s < 0:
        parts.append(seg(n + s, n))
        s = 0
    mid_e = min(e, n)
    parts.append(seg(s, mid_e))
    if e > n:
        parts.append(seg(0, e - n))
    return parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=nax)


def _sweep_body_chunked(prim_blk, chi_blk, dminv_blk, dminw_blk, axis,
                        opts: HydroOptions, first_order: bool,
                        mask_blk=None, fo_blk=None):
    """`_sweep_body` with the sweep-axis intermediates bounded: above
    `QUOKKA_PALLAS_SWEEP_CHUNK_ABOVE` entries, the face pipeline runs in
    static chunks with 4-entry stencil halos (face slot i reads cells
    [i-3, i+2]); each chunk's live set is chunk-sized, so the kernel VMEM
    budget no longer caps the domain extent at ~272 cells/axis. Halo
    slices wrap at the array ends (`_wrap_slice`), reproducing the
    whole-axis roll semantics BIT-FOR-BIT: every face value is computed
    from the same cell values by the same elementwise expressions --
    chunking only changes data movement, never arithmetic."""
    n = prim_blk.shape[1 + axis]
    C = _chunk_size(n, mask_blk is not None, axis)
    if not C:
        return _window_flux(prim_blk, chi_blk, dminv_blk, dminw_blk,
                            mask_blk, fo_blk, axis, opts, first_order)
    h = 4

    def wsl(A, s, e):
        return None if A is None else _wrap_slice(A, axis, s, e)

    def osl(A, a, b):
        nax = A.ndim - 3 + axis
        idx = [slice(None)] * A.ndim
        idx[nax] = slice(a, b)
        return A[tuple(idx)]

    Fs, vs = [], []
    for s in range(0, n, C):
        e = min(n, s + C)
        Fc, vc = _window_flux(
            wsl(prim_blk, s - h, e + h),
            wsl(chi_blk, s - h, e + h),
            wsl(dminv_blk, s - h, e + h),
            wsl(dminw_blk, s - h, e + h),
            wsl(mask_blk, s - h, e + h),
            wsl(fo_blk, s - h, e + h),
            axis, opts, first_order,
        )
        Fs.append(osl(Fc, h, h + (e - s)))
        vs.append(osl(vc, h, h + (e - s)))
    nax4 = Fs[0].ndim - 3 + axis
    return (jnp.concatenate(Fs, axis=nax4),
            jnp.concatenate(vs, axis=vs[0].ndim - 3 + axis))


_SWEEP_CHUNK_AX = tuple(
    int(__import__("os").environ.get(f"QUOKKA_PALLAS_SWEEP_CHUNK_AX{a}",
                                     "-1"))
    for a in range(3)
)


def _chunk_size(n: int, has_mask: bool, axis: int | None = None) -> int:
    """Sweep-axis chunk for in-kernel pipelines; 0 = run whole-axis.
    Auto: 32 keeps (3 double-buffered whole-sweep windows + the chunk
    live set + register spill slots) inside the 128M VMEM budget at
    512-class extents (measured: C=64 spills 47M -> 139M total).
    FOFC-blend kernels (has_mask) run two flux pipelines, and they are
    the RARE branch: a quarter chunk costs nothing.

    Per-axis override QUOKKA_PALLAS_SWEEP_CHUNK_AX{0,1,2} (-1 = no
    override): x-axis chunking is a measured WIN below the 272 gate
    (the chunk windows slice a free outer dim: 8.5 -> 6.9 ms at 256^3 on
    v5e) while z-axis chunking slices the lane dim and is ruinous; the
    x-sweep therefore defaults to C=32 with the others whole-axis."""
    if axis is not None and _SWEEP_CHUNK_AX[axis] >= 0:
        C = _SWEEP_CHUNK_AX[axis]
        if has_mask and C > 0:
            C = max(16, C // 4)
        return 0 if (C == 0 or C >= n) else C
    if (axis == 0 and _SWEEP_CHUNK <= 0 and n > 128
            and not _interpret_mode()):
        # default: chunk the x sweep in fine slabs -- outer-dim slices
        # are free and the small live set keeps the VPU out of VMEM
        # spill territory (measured on v5e at 256^3: whole-axis 8.5 ms,
        # C=32 6.9, C=8 ~6, C=4 best: step 265 -> 284.5 Mzones/s).
        # TPU only: interpret-mode CI would pay n/C trace iterations.
        C = 4 if not has_mask else 16
        return 0 if C >= n else C
    C = _SWEEP_CHUNK if _SWEEP_CHUNK > 0 else 32
    if has_mask:
        C = max(16, C // 4)
    if (n <= _SWEEP_CHUNK_ABOVE and _SWEEP_CHUNK <= 0) or C >= n:
        return 0
    return C


def _window_flux(pb, cb, dvb, dwb, mb, fb, axis, opts: HydroOptions,
                 first_order: bool):
    """Flux + face velocity on one in-VMEM window (the chunked kernels'
    unit of work)."""
    F, v = _sweep_body(pb, cb, dvb, dwb, axis, opts, first_order)
    if mb is not None:
        # in-VMEM FOFC blend: first-order flux on every face adjacent
        # to a flagged cell (face slot i flags on cells i-1, i) --
        # exactly `advance._blend_fofc` / reference `replaceFluxes`.
        # `fb`, if given, is the state the first-order fluxes come
        # from (stage-2 FOFC uses Ug0's donor-cell fluxes while the
        # high-order sweep runs on Ug1).
        Ff, vf = _sweep_body(pb if fb is None else fb, None, None, None,
                             axis, opts, True)
        flag = jnp.logical_or(sh(mb, -1, axis) > 0, mb > 0)
        F = jnp.where(flag[None], Ff, F)
        v = jnp.where(flag, vf, v)
    return F, v


def _div_only_chunked(prim_blk, chi_blk, dv_blk, dw_blk, mask_blk, fo_blk,
                      axis, opts: HydroOptions, first_order: bool,
                      wall: bool, n_sweep: int, dx_axis,
                      div_ref, dvel_ref, acc_div_ref, acc_dvel_ref,
                      bnd_blk=None, corr_ref=None, acc_corr_ref=None) -> bool:
    """Chunked divergence emission for div_only kernels on long sweep
    axes: each chunk's faces come from a stencil-haloed window and the
    chunk cells' divergence is written STRAIGHT into the output ref slice.
    The chunk-concat formulation keeps every chunk's face output alive
    into the final concatenate (a full-length face array next to the
    double-buffered windows), which overflows VMEM at 512-class extents;
    here only one chunk is live at a time. Bit-identical to the
    whole-axis formulation: same face values (`_wrap_slice` reproduces
    roll semantics; face n on roll-wrap axes equals face 0 bitwise) and
    the same divergence/accumulation expressions. Returns False when the
    axis is short enough for the whole-axis path."""
    n_ext = prim_blk.shape[1 + axis]
    C = _chunk_size(n_ext, mask_blk is not None, axis)
    if not C and bnd_blk is not None and axis != 2 and n_sweep > 128:
        # register-seeding kernels carry an extra output window + the
        # boundary mask: the whole-axis y-sweep overflows VMEM by ~26M at
        # 256^3 (z stays whole -- its blocks are tiny)
        C = 32
    if not C:
        return False
    h = 4
    base = 4 if wall else 0

    def wsl(A, s, e):
        return None if A is None else _wrap_slice(A, axis, s, e)

    def seg(A, a, b):
        idx = [slice(None)] * A.ndim
        idx[A.ndim - 3 + axis] = slice(a, b)
        return A[tuple(idx)]

    for s in range(0, n_sweep, C):
        e = min(n_sweep, s + C)
        L = e - s
        a0, b0 = base + s - h, base + e + h
        Fc, vc = _window_flux(
            wsl(prim_blk, a0, b0), wsl(chi_blk, a0, b0),
            wsl(dv_blk, a0, b0), wsl(dw_blk, a0, b0),
            wsl(mask_blk, a0, b0), wsl(fo_blk, a0, b0),
            axis, opts, first_order,
        )
        # window slot j = face (a0 - base + j); faces s..e at j = h..h+L
        Fd = seg(Fc, h, h + L + 1)
        vd = seg(vc, h, h + L + 1)
        div_c = (seg(Fd, 0, L) - seg(Fd, 1, L + 1)) / dx_axis
        dvel_c = (seg(vd, 1, L + 1) - seg(vd, 0, L)) / dx_axis
        i4 = [slice(None)] * 4
        i4[1 + axis] = slice(s, e)
        i3 = [slice(None)] * 3
        i3[axis] = slice(s, e)
        if acc_div_ref is not None:
            div_c = acc_div_ref[tuple(i4)] + div_c
            dvel_c = acc_dvel_ref[tuple(i3)] + dvel_c
        div_ref[tuple(i4)] = div_c
        dvel_ref[tuple(i3)] = dvel_c
        if corr_ref is not None:
            # flux-register seed: divergence of the BOUNDARY-masked flux
            # (bnd face slot j flags a coarse-fine boundary face); the
            # same blended flux feeds both div and corr, so the register
            # stays exactly consistent with the update
            bm = _wrap_slice(bnd_blk, axis, s, e + 1)  # faces s..e
            dFm = jnp.where(bm[None] > 0.5, Fd, 0.0)
            corr_c = (seg(dFm, 0, L) - seg(dFm, 1, L + 1)) / dx_axis
            if acc_corr_ref is not None:
                corr_c = acc_corr_ref[tuple(i4)] + corr_c
            corr_ref[tuple(i4)] = corr_c
    return True


def _block_spec_4d(nv, X, Y, Z, axis, BT):
    """(block_shape, index_map, grid) for prim-like [NV,X,Y,Z] arrays:
    whole sweep axis + whole lane (z) axis in-block, tile the rest by BT."""
    # The sweep axis stays whole in-block (stencil shifts are in-VMEM rolls);
    # the lane (z) axis is tiled in 128-lane chunks unless it is the sweep
    # axis; the remaining transverse dim is tiled by BT. Blocks must stay
    # ~0.5 MB/component: the kernel body's intermediates also live in VMEM.
    #
    # NB: all index-map components must share the dtype of the grid indices
    # (with jax_enable_x64 bare python 0s become i64 and Mosaic rejects the
    # mixed-type index tuple), hence the explicit zeros_like.
    #
    # Mosaic requires the last block dim to divide into 8/128 sublane/lane
    # tiles OR equal the array dim: tile z by 128 lanes only when it
    # divides evenly, otherwise keep the whole z axis in-block (small or
    # odd-sized domains, e.g. 64^3)
    BZ = 128 if Z % 128 == 0 else Z
    if axis == 0:
        grid = (pl.cdiv(Y, BT), pl.cdiv(Z, BZ))
        shape = (nv, X, BT, BZ)
        imap = lambda j, k: (jnp.zeros_like(j), jnp.zeros_like(j), j, k)
    elif axis == 1:
        grid = (pl.cdiv(X, BT), pl.cdiv(Z, BZ))
        shape = (nv, BT, Y, BZ)
        imap = lambda j, k: (jnp.zeros_like(j), j, jnp.zeros_like(j), k)
    else:
        grid = (pl.cdiv(X, BT), pl.cdiv(Y, BT))
        shape = (nv, BT, BT, Z)
        imap = lambda i, j: (jnp.zeros_like(i), i, j, jnp.zeros_like(j))
    return shape, imap, grid


import os

_BLOCK_TRANSVERSE = int(os.environ.get("QUOKKA_PALLAS_BT", "8"))


def _interpret_mode() -> bool:
    """Run the kernels interpreted off-TPU so CI (CPU) actually executes the
    Pallas path; on TPU they compile through Mosaic as before."""
    return jax.default_backend() != "tpu"


def compute_axis_flux_pallas(
    prim: jnp.ndarray,
    axis: int,
    opts: HydroOptions,
    chi_cell: jnp.ndarray | None,
    dmins: dict,
    first_order: bool = False,
    block_transverse: int | None = None,
    bc_axis: tuple | None = None,
    chi_ghost_axis: tuple | None = None,
    dx_axis: float | None = None,
    avg_with: tuple | None = None,
    emit_avg_flux: bool = False,
    state_is_cons: bool = False,
    acc: tuple | None = None,
    div_only: bool = False,
    fo_mask: jnp.ndarray | None = None,
    fo_from: jnp.ndarray | None = None,
    corr_mask: jnp.ndarray | None = None,
    corr_acc: jnp.ndarray | None = None,
):
    """Single fused kernel: flux + face velocity for one sweep axis.

    ``div_only`` (the LEAN large-domain mode): the kernel emits ONLY the
    divergence pair (div, dvel) -- no face arrays ever reach HBM, which
    both removes ~60% of the write traffic and keeps 512^3-class domains
    inside one chip's HBM (the classic layout's per-axis face dicts are
    3x(nv+1) full fields). Requires ``dx_axis``; composes with ``acc``.

    ``fo_mask`` (lean FOFC): a cell-flag field in the prim layout (same
    dtype, 0/1). The kernel computes BOTH the high-order and the
    first-order (donor-cell + LLF) fluxes in VMEM and selects the
    first-order one on every face adjacent to a flagged cell -- exactly
    `_blend_fofc` (reference `replaceFluxes`), evaluated in-kernel so the
    redo branch stays as lean as the clean path. Wall axes extend the
    mask with zeros (the `_pad_mask` non-periodic fill).

    With ``bc_axis=(lo_kind, hi_kind)`` the input arrays are UNPADDED
    (lane-aligned, no ghost zones): the kernel assembles the wall ghosts
    in VMEM from its own block edges and returns, in addition to the
    256-slot face arrays (slot i = face between cells i-1 and i, so slot 0
    is the lo-wall face), the hi-wall flux/facevel planes that do not fit
    the slot count. Returns (flux, facevel) or
    (flux, facevel, flux_hi, facevel_hi).

    With ``dx_axis`` set, the kernel ALSO emits this axis's cell-centered
    flux-divergence contribution  div(i) = (F(i) - F(i+1))/dx  and the
    face-velocity divergence contribution  dvel(i) = (v(i+1) - v(i))/dx
    (the whole sweep axis lives in VMEM, so the i+1 shift is an in-block
    roll; on wall axes the hi-wall face is used directly). These make the
    common-path RK update purely pointwise: no XLA roll of whole flux
    arrays through HBM (see `advance.rk2_stage`). Appended to the return
    as (..., div, dvel); values are bit-identical to the XLA formulation
    `(F - sh(F,1,ax)) / dx` with the hi-plane patch.

    ``avg_with`` (RK2 stage 2) = (F1, v1) or, on wall axes,
    (F1, v1, F1_hi, v1_hi): the stage-1 face arrays of this axis. The div
    outputs then hold the divergence of the TIME-AVERAGED flux
    0.5*(F1 + F2) -- the average is formed in VMEM, bit-identical to the
    XLA `0.5*(fl1+fl2)` arrays the classic path materializes in HBM --
    while the flux/facevel outputs remain the RAW stage-2 values (the
    cond-gated FOFC fallback re-averages in XLA exactly as before).

    ``emit_avg_flux`` (with ``avg_with``; padded arrays only): ALSO write
    the time-averaged face flux 0.5*(F1+F2) as an output -- what AMR flux
    registers consume (the level update stays pointwise from the fused
    divergence while the averaged flux feeds refluxing,
    reference `YAFluxRegister` semantics).

    ``state_is_cons``: the first array is the CONSERVED state; cons->prim
    runs in-VMEM after wall-ghost assembly (bit-identical to converting
    the ghost-filled array), saving the HBM primitive materialization.

    ``acc`` = (div_acc, dvel_acc): running divergence totals from the
    previous axis sweeps; this kernel ADDS its contribution in-VMEM and
    the outputs alias the acc buffers (`input_output_aliases`), so the
    RK apply reads ONE [nvar]+1 divergence pair instead of one per axis
    (same accumulation order as the XLA `rhs + divs[d]` chain)."""
    nv = prim.shape[0]
    _, X, Y, Z = prim.shape
    if block_transverse is None:
        block_transverse = _BLOCK_TRANSVERSE
        if axis == 1 and max(X, Y, Z) > _SWEEP_CHUNK_ABOVE:
            # large-extent (lean/chunked) kernels: the y-sweep's
            # whole-axis windows (nv, BT, Y, BZ) are the big ones and BT
            # sits on an untiled dim there (axes 0/2 put BT on the
            # sublane dim, where Mosaic requires multiples of 8), so at
            # 512+ it halves to keep (windows + chunk live set + spill
            # slots) under the 128M budget (measured: BT=8 uses 146.5M
            # at 520, BT=4 fits)
            block_transverse = max(4, _BLOCK_TRANSVERSE // 2)
    dtype = prim.dtype

    shape4, imap4, grid = _block_spec_4d(nv, X, Y, Z, axis, block_transverse)
    shape3 = shape4[1:]
    imap3 = (lambda *idx: imap4(*idx)[1:])

    vax, wax = _transverse_axes(axis, max(opts.ndim, 1))
    dminv = dmins.get(vax) if (vax in opts.active_axes and not first_order) else None
    dminw = dmins.get(wax) if (wax in opts.active_axes and not first_order) else None
    use_chi = (chi_cell is not None) and not first_order

    # assemble inputs: prim [+ chi] [+ dminv] [+ dminw]
    inputs = [prim]
    in_specs = [pl.BlockSpec(shape4, imap4, memory_space=pltpu.VMEM)]
    flags = []
    for arr in (chi_cell if use_chi else None, dminv, dminw, fo_mask):
        flags.append(arr is not None)
        if arr is not None:
            inputs.append(arr)
            in_specs.append(pl.BlockSpec(shape3, imap3, memory_space=pltpu.VMEM))
    has_chi, has_v, has_w, has_mask = flags
    has_fo = fo_from is not None
    if has_fo:
        if not has_mask:
            raise ValueError("fo_from requires fo_mask")
        inputs.append(fo_from)
        in_specs.append(pl.BlockSpec(shape4, imap4, memory_space=pltpu.VMEM))

    n_sweep = prim.shape[1 + axis]
    wall = bc_axis is not None
    with_div = dx_axis is not None
    has_avg = avg_with is not None
    if emit_avg_flux and (wall or not has_avg):
        raise ValueError("emit_avg_flux requires avg_with and padded "
                         "(non-wall) arrays -- the AMR reflux path")
    if acc is not None and (not with_div or emit_avg_flux):
        raise ValueError("acc accumulation requires dx_axis and is not "
                         "supported with emit_avg_flux")
    if div_only and (not with_div or has_avg or emit_avg_flux):
        raise ValueError("div_only requires dx_axis and excludes avg_with")
    has_corr = corr_mask is not None
    if has_corr and (not div_only or wall):
        raise ValueError("corr_mask (flux-register seeding) requires the "
                         "div_only ghost-free periodic path")

    # 8-wide window blocks along the sweep axis (width-1 blocks on a tiled
    # dim crash the Mosaic lowering), used for the chi ghost-plane inputs
    # and the hi-wall flux/facevel plane outputs
    if wall:
        pshape4 = tuple(8 if i == 1 + axis else s for i, s in enumerate(shape4))
        pshape3 = pshape4[1:]
        pimap4 = lambda *idx: tuple(
            jnp.zeros_like(idx[0]) if i == 1 + axis else c
            for i, c in enumerate(imap4(*idx))
        )
        pimap3 = lambda *idx: pimap4(*idx)[1:]

    # exact adjacent-ghost chi planes for outflow sides (see
    # precompute_transverse_fields); broadcast to the 8-wide window form
    chi_glo = chi_ghi = None
    if wall and use_chi and chi_ghost_axis is not None:
        glo, ghi = chi_ghost_axis
        full3_win = tuple(
            8 if i == axis else s for i, s in enumerate(chi_cell.shape)
        )
        if glo is not None:
            inputs.append(jnp.broadcast_to(glo, full3_win))
            in_specs.append(pl.BlockSpec(pshape3, pimap3, memory_space=pltpu.VMEM))
            chi_glo = True
        if ghi is not None:
            inputs.append(jnp.broadcast_to(ghi, full3_win))
            in_specs.append(pl.BlockSpec(pshape3, pimap3, memory_space=pltpu.VMEM))
            chi_ghi = True

    # stage-1 face arrays for in-VMEM time averaging (RK2 stage 2).
    # emit_avg_flux kernels skip the v1 input (and average the velocity
    # divergence in XLA instead): the extra averaged-flux output window
    # would otherwise overflow the 128M VMEM budget at 264^3.
    if has_avg:
        inputs.append(avg_with[0])
        in_specs.append(pl.BlockSpec(shape4, imap4, memory_space=pltpu.VMEM))
        if not emit_avg_flux:
            inputs.append(avg_with[1])
            in_specs.append(pl.BlockSpec(shape3, imap3, memory_space=pltpu.VMEM))
        if wall:
            flh1, fvh1 = avg_with[2], avg_with[3]
            w4 = tuple(8 if i == 1 + axis else s
                       for i, s in enumerate((nv, X, Y, Z)))
            inputs.append(jnp.broadcast_to(jnp.expand_dims(flh1, 1 + axis), w4))
            in_specs.append(pl.BlockSpec(pshape4, pimap4, memory_space=pltpu.VMEM))
            inputs.append(jnp.broadcast_to(jnp.expand_dims(fvh1, axis), w4[1:]))
            in_specs.append(pl.BlockSpec(pshape3, pimap3, memory_space=pltpu.VMEM))

    # running divergence accumulators (aliased to the div outputs)
    acc_in_idx = None
    if acc is not None:
        acc_in_idx = len(inputs)
        inputs.append(acc[0])
        in_specs.append(pl.BlockSpec(shape4, imap4, memory_space=pltpu.VMEM))
        inputs.append(acc[1])
        in_specs.append(pl.BlockSpec(shape3, imap3, memory_space=pltpu.VMEM))

    # flux-register seed: per-axis boundary-face mask (+ aliased corr acc)
    corr_acc_in_idx = None
    if has_corr:
        inputs.append(corr_mask)
        in_specs.append(pl.BlockSpec(shape3, imap3, memory_space=pltpu.VMEM))
        if corr_acc is not None:
            corr_acc_in_idx = len(inputs)
            inputs.append(corr_acc)
            in_specs.append(pl.BlockSpec(shape4, imap4,
                                         memory_space=pltpu.VMEM))

    def kernel(*refs):
        idx = 0
        prim_ref = refs[idx]; idx += 1
        chi_ref = refs[idx] if has_chi else None
        idx += int(has_chi)
        dv_ref = refs[idx] if has_v else None
        idx += int(has_v)
        dw_ref = refs[idx] if has_w else None
        idx += int(has_w)
        mask_ref = refs[idx] if has_mask else None
        idx += int(has_mask)
        fo_ref = refs[idx] if has_fo else None
        idx += int(has_fo)
        chi_glo_ref = refs[idx] if chi_glo else None
        idx += int(bool(chi_glo))
        chi_ghi_ref = refs[idx] if chi_ghi else None
        idx += int(bool(chi_ghi))
        F1_ref = v1_ref = flh1_ref = fvh1_ref = None
        if has_avg:
            F1_ref = refs[idx]
            idx += 1
            if not emit_avg_flux:
                v1_ref = refs[idx]
                idx += 1
            if wall:
                flh1_ref, fvh1_ref = refs[idx], refs[idx + 1]
                idx += 2
        acc_div_ref = acc_dvel_ref = None
        if acc is not None:
            acc_div_ref, acc_dvel_ref = refs[idx], refs[idx + 1]
            idx += 2
        bnd_ref = acc_corr_ref = None
        if has_corr:
            bnd_ref = refs[idx]
            idx += 1
            if corr_acc is not None:
                acc_corr_ref = refs[idx]
                idx += 1
        flux_ref = vel_ref = flux_hi_ref = vel_hi_ref = favg_ref = None
        corr_ref = None
        if has_avg or div_only:
            # avg (RK2 stage-2) and div_only (lean) kernels emit ONLY the
            # divergences: the VMEM budget and HBM write traffic of the
            # raw face arrays are saved; the rare FOFC fallback
            # recomputes them (in XLA, or in-kernel via fo_mask).
            # (emit_avg_flux adds the time-averaged flux itself for the
            # AMR flux registers.)
            div_ref, dvel_ref = refs[idx], refs[idx + 1]
            if emit_avg_flux:
                favg_ref = refs[idx + 2]
            if has_corr:
                corr_ref = refs[idx + 2]
        else:
            flux_ref, vel_ref = refs[idx], refs[idx + 1]
            k = idx + 2
            if wall:
                flux_hi_ref, vel_hi_ref = refs[k], refs[k + 1]
                k += 2
            if with_div:
                div_ref, dvel_ref = refs[k], refs[k + 1]

        prim_blk = prim_ref[...]
        chi_blk = chi_ref[...] if chi_ref is not None else None
        dv_blk = dv_ref[...] if dv_ref is not None else None
        dw_blk = dw_ref[...] if dw_ref is not None else None
        mask_blk = mask_ref[...] if mask_ref is not None else None
        fo_blk = fo_ref[...] if fo_ref is not None else None

        if wall:
            lo_k, hi_k = bc_axis
            g = 4
            prim_blk = _assemble_wall_ghosts(
                prim_blk, axis, lo_k, hi_k,
                odd_comp=(MX1 if state_is_cons else PVX1) + axis, g=g
            )
            if chi_blk is not None:
                def _adj(ref):
                    if ref is None:
                        return None
                    i = [slice(None)] * 3
                    i[axis] = slice(0, 1)
                    return ref[...][tuple(i)]

                chi_blk = _assemble_wall_ghosts(
                    chi_blk, axis, lo_k, hi_k, None, g,
                    adj_lo=_adj(chi_glo_ref), adj_hi=_adj(chi_ghi_ref),
                )
            if dv_blk is not None:
                dv_blk = _assemble_wall_ghosts(dv_blk, axis, lo_k, hi_k, None, g)
            if dw_blk is not None:
                dw_blk = _assemble_wall_ghosts(dw_blk, axis, lo_k, hi_k, None, g)
            if mask_blk is not None:
                # mask ghosts are False on wall axes (`_pad_mask`'s
                # non-periodic fill): lo-wall face flags only on cell 0,
                # hi-wall face only on cell n-1
                zshape = list(mask_blk.shape)
                zshape[axis] = g
                z = jnp.zeros(zshape, mask_blk.dtype)
                mask_blk = jnp.concatenate([z, mask_blk, z], axis=axis)
            if fo_blk is not None:
                fo_blk = _assemble_wall_ghosts(
                    fo_blk, axis, lo_k, hi_k,
                    odd_comp=(MX1 if state_is_cons else PVX1) + axis, g=g
                )

        if state_is_cons:
            prim_blk = euler.cons_to_prim(
                prim_blk, opts.eos, opts.reconstruct_eint
            )
            if fo_blk is not None:
                fo_blk = euler.cons_to_prim(
                    fo_blk, opts.eos, opts.reconstruct_eint
                )

        bnd_blk = bnd_ref[...] if bnd_ref is not None else None
        if div_only and _div_only_chunked(
                prim_blk, chi_blk, dv_blk, dw_blk, mask_blk, fo_blk, axis,
                opts, first_order, wall, n_sweep, dx_axis,
                div_ref, dvel_ref, acc_div_ref, acc_dvel_ref,
                bnd_blk=bnd_blk, corr_ref=corr_ref,
                acc_corr_ref=acc_corr_ref):
            return

        F, v = _sweep_body_chunked(prim_blk, chi_blk, dv_blk, dw_blk, axis,
                                   opts, first_order, mask_blk=mask_blk,
                                   fo_blk=fo_blk)

        if wall:
            # assembled face slot g+i = face between cells i-1 and i
            # (slot g = lo wall); slot g+n = hi wall

            def fslice(A, a, b):
                i = [slice(None)] * A.ndim
                i[A.ndim - 3 + axis] = slice(a, b)
                return A[tuple(i)]

            if flux_ref is not None:
                flux_ref[...] = fslice(F, g, g + n_sweep)
                vel_ref[...] = fslice(v, g, g + n_sweep)
                # hi-wall planes are written as an 8-wide tail window along
                # the sweep axis (last entry = the wall face): width-1
                # blocks on a tiled dim crash the Mosaic lowering
                # (lower_to_llo.cc d>>32 check), width 8 satisfies the
                # (8,128) block-shape rule on every axis orientation
                flux_hi_ref[...] = fslice(F, g + n_sweep - 7, g + n_sweep + 1)
                vel_hi_ref[...] = fslice(v, g + n_sweep - 7, g + n_sweep + 1)
            if with_div:
                # the assembled face window holds both faces of every cell
                # (slot g+n is the hi wall), so the divergence needs no
                # hi-plane patch at all. With avg inputs the stage-1 faces
                # are averaged in first (bit-identical to the XLA
                # 0.5*(fl1+fl2) + where-patch formulation).
                Fd = fslice(F, g, g + n_sweep)
                Fh = fslice(F, g + n_sweep, g + n_sweep + 1)
                vd = fslice(v, g, g + n_sweep)
                vh = fslice(v, g + n_sweep, g + n_sweep + 1)
                if has_avg:
                    Fd = 0.5 * (F1_ref[...] + Fd)
                    Fh = 0.5 * (fslice(flh1_ref[...], 7, 8) + Fh)
                    vd = 0.5 * (v1_ref[...] + vd)
                    vh = 0.5 * (fslice(fvh1_ref[...], 7, 8) + vh)
                nax = F.ndim - 3 + axis
                Fall = jnp.concatenate([Fd, Fh], axis=nax)
                vall = jnp.concatenate([vd, vh], axis=axis)
                div_c = (
                    fslice(Fall, 0, n_sweep) - fslice(Fall, 1, n_sweep + 1)
                ) / dx_axis
                dvel_c = (
                    fslice(vall, 1, n_sweep + 1) - fslice(vall, 0, n_sweep)
                ) / dx_axis
                if acc_div_ref is not None:
                    div_c = acc_div_ref[...] + div_c
                    dvel_c = acc_dvel_ref[...] + dvel_c
                div_ref[...] = div_c
                dvel_ref[...] = dvel_c
        else:
            if flux_ref is not None:
                flux_ref[...] = F
                vel_ref[...] = v
            if with_div:
                # same roll-wrap semantics as the XLA path: periodic
                # ghost-free axes wrap correctly, padded axes leave garbage
                # only in ghost cells the caller's interior() discards
                Fd, vd = F, v
                if has_avg:
                    Fd = 0.5 * (F1_ref[...] + F)
                    # emit_avg_flux: dvel stays the RAW stage-2 velocity
                    # divergence (the caller averages it with stage 1's --
                    # divergence is linear, so 0.5*(dvel1+dvel2) equals the
                    # averaged-velocity divergence up to FMA contraction)
                    if v1_ref is not None:
                        vd = 0.5 * (v1_ref[...] + v)
                div_c = (Fd - sh(Fd, 1, 1 + axis)) / dx_axis
                dvel_c = (sh(vd, 1, axis) - vd) / dx_axis
                if acc_div_ref is not None:
                    div_c = acc_div_ref[...] + div_c
                    dvel_c = acc_dvel_ref[...] + dvel_c
                div_ref[...] = div_c
                dvel_ref[...] = dvel_c
                if favg_ref is not None:
                    favg_ref[...] = Fd
                if corr_ref is not None:
                    dFm = jnp.where(bnd_blk[None] > 0.5, Fd, 0.0)
                    corr_c = (dFm - sh(dFm, 1, 1 + axis)) / dx_axis
                    if acc_corr_ref is not None:
                        corr_c = acc_corr_ref[...] + corr_c
                    corr_ref[...] = corr_c

    if has_avg or div_only:
        out_specs = [
            pl.BlockSpec(shape4, imap4, memory_space=pltpu.VMEM),
            pl.BlockSpec(shape3, imap3, memory_space=pltpu.VMEM),
        ]
        out_shape = [
            jax.ShapeDtypeStruct((nv, X, Y, Z), dtype),
            jax.ShapeDtypeStruct((X, Y, Z), dtype),
        ]
        if emit_avg_flux:
            out_specs.append(pl.BlockSpec(shape4, imap4,
                                          memory_space=pltpu.VMEM))
            out_shape.append(jax.ShapeDtypeStruct((nv, X, Y, Z), dtype))
        if has_corr:
            out_specs.append(pl.BlockSpec(shape4, imap4,
                                          memory_space=pltpu.VMEM))
            out_shape.append(jax.ShapeDtypeStruct((nv, X, Y, Z), dtype))
    else:
        out_specs = [
            pl.BlockSpec(shape4, imap4, memory_space=pltpu.VMEM),
            pl.BlockSpec(shape3, imap3, memory_space=pltpu.VMEM),
        ]
        out_shape = [
            jax.ShapeDtypeStruct((nv, X, Y, Z), dtype),
            jax.ShapeDtypeStruct((X, Y, Z), dtype),
        ]
        if wall:
            # hi-wall planes: 8-wide tail window on the sweep axis (sliced
            # to the last entry after the call)
            full4 = tuple(8 if i == 1 + axis else s
                          for i, s in enumerate((nv, X, Y, Z)))
            out_specs += [
                pl.BlockSpec(pshape4, pimap4, memory_space=pltpu.VMEM),
                pl.BlockSpec(pshape3, pimap3, memory_space=pltpu.VMEM),
            ]
            out_shape += [
                jax.ShapeDtypeStruct(full4, dtype),
                jax.ShapeDtypeStruct(full4[1:], dtype),
            ]
        if with_div:
            out_specs += [
                pl.BlockSpec(shape4, imap4, memory_space=pltpu.VMEM),
                pl.BlockSpec(shape3, imap3, memory_space=pltpu.VMEM),
            ]
            out_shape += [
                jax.ShapeDtypeStruct((nv, X, Y, Z), dtype),
                jax.ShapeDtypeStruct((X, Y, Z), dtype),
            ]

    aliases = {}
    if acc is not None:
        div_out_idx = (0 if (has_avg or div_only)
                       else 2 + (2 if wall else 0))
        aliases = {acc_in_idx: div_out_idx, acc_in_idx + 1: div_out_idx + 1}
    if corr_acc_in_idx is not None:
        aliases[corr_acc_in_idx] = 2  # corr output follows (div, dvel)
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        interpret=_interpret_mode(),
        input_output_aliases=aliases,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=127 * 1024 * 1024,
        ),
    )(*inputs)
    if has_avg or div_only:
        if emit_avg_flux:
            return outs[0], outs[1], outs[2]  # (div, dvel, F_avg)
        if has_corr:
            return outs[0], outs[1], outs[2]  # (div, dvel, corr)
        return outs[0], outs[1]  # (div, dvel)
    div_tail = tuple(outs[-2:]) if with_div else ()
    if wall:
        from jax import lax as _lax

        return (
            outs[0],
            outs[1],
            jnp.squeeze(_lax.slice_in_dim(outs[2], 7, 8, axis=1 + axis),
                        axis=1 + axis),
            jnp.squeeze(_lax.slice_in_dim(outs[3], 7, 8, axis=axis),
                        axis=axis),
        ) + div_tail
    return (outs[0], outs[1]) + div_tail


def compute_fluxes_pallas_div(Ug: jnp.ndarray, opts: HydroOptions,
                              bc_kinds: dict | None = None,
                              avg_with: dict | None = None,
                              emit_avg_flux: bool = False,
                              accumulate: bool = False,
                              div_only: bool = False,
                              fo_mask: jnp.ndarray | None = None,
                              fo_from: jnp.ndarray | None = None,
                              acc_init: tuple | None = None,
                              corr_masks: dict | None = None,
                              corr_init: jnp.ndarray | None = None) -> dict:
    """Sweep all axes once, emitting fluxes AND their divergence
    contributions from the same kernels (see `compute_axis_flux_pallas`
    ``dx_axis``). Returns a dict with keys ``fluxes``, ``facevels``,
    ``flux_hi``, ``vel_hi`` (empty when not ghost-free), ``divs``,
    ``dvels`` -- the divs make the common-path RK update pointwise while
    the face arrays remain available for the (cond-gated) FOFC redo.

    ``avg_with`` (RK2 stage 2): dict with the stage-1 results ``fluxes``,
    ``facevels``, ``flux_hi``, ``vel_hi`` -- divs/dvels then hold the
    divergence of the time-averaged flux and the face arrays are NOT
    emitted (fluxes/facevels/hi dicts come back empty; the FOFC fallback
    recomputes the raw stage-2 sweep in that rare branch).

    ``accumulate``: chain the per-axis divergence contributions through
    the kernels via aliased accumulators (same summation order as the XLA
    ``rhs + divs[d]`` chain, but with no per-axis HBM materialization);
    the return then carries single ``div``/``dvel`` totals instead of the
    per-axis ``divs``/``dvels`` dicts. Not available with
    ``emit_avg_flux`` (the AMR reflux path keeps the classic layout).

    ``div_only`` (LEAN mode, large domains): kernels emit ONLY the
    divergence pair -- no face arrays in HBM at all. Implies the caller
    reconstructs everything it needs from divergences (RK2 by linearity)
    or re-sweeps with ``fo_mask`` for the FOFC redo. ``acc_init`` seeds
    the accumulator chain (stage 2 adds onto stage 1's totals in place)."""
    if accumulate and emit_avg_flux:
        raise ValueError("accumulate is not supported with emit_avg_flux")
    in_cons = bool(int(os.environ.get("QUOKKA_PALLAS_CONS_IN_KERNEL", "1")))
    if not in_cons:
        Ug = euler.cons_to_prim(Ug, opts.eos, opts.reconstruct_eint)
        if fo_from is not None:
            fo_from = euler.cons_to_prim(fo_from, opts.eos,
                                         opts.reconstruct_eint)
    dmins, chi_cell, chi_ghost = precompute_transverse_pallas(
        Ug, opts, bc_kinds, state_is_cons=in_cons
    )

    out = {"fluxes": {}, "facevels": {}, "flux_hi": {}, "vel_hi": {},
           "divs": {}, "dvels": {}}
    acc = acc_init
    corr = corr_init
    has_corr = corr_masks is not None
    if has_corr and not (div_only and accumulate):
        raise ValueError("corr_masks requires div_only + accumulate")
    for d in opts.active_axes:
        bc_axis = None if bc_kinds is None else bc_kinds.get(d)
        avg_axis = None
        if avg_with is not None:
            avg_axis = (avg_with["fluxes"][d], avg_with["facevels"][d])
            if bc_axis is not None:
                avg_axis += (avg_with["flux_hi"][d], avg_with["vel_hi"][d])
        res = compute_axis_flux_pallas(
            Ug, d, opts, chi_cell, dmins, False,
            bc_axis=bc_axis, chi_ghost_axis=chi_ghost.get(d),
            dx_axis=opts.dx[d], avg_with=avg_axis,
            emit_avg_flux=emit_avg_flux, state_is_cons=in_cons,
            acc=acc if accumulate else None,
            div_only=div_only, fo_mask=fo_mask, fo_from=fo_from,
            corr_mask=corr_masks[d] if has_corr else None,
            corr_acc=corr if has_corr else None,
        )
        if div_only:
            if has_corr:
                acc = res[:2]
                corr = res[2]
            elif accumulate:
                acc = res
            else:
                out["divs"][d], out["dvels"][d] = res
            continue
        if avg_axis is not None:
            if emit_avg_flux:
                dv, dl, favg = res
                out["fluxes"][d] = favg  # time-averaged: feeds AMR reflux
            else:
                dv, dl = res
        elif bc_axis is None:
            F, v, dv, dl = res
        else:
            F, v, Fh, vh, dv, dl = res
            out["flux_hi"][d] = Fh
            out["vel_hi"][d] = vh
        if avg_axis is None:
            out["fluxes"][d] = F
            out["facevels"][d] = v
        if accumulate:
            acc = (dv, dl)
        else:
            out["divs"][d] = dv
            out["dvels"][d] = dl
    if accumulate:
        out["div"], out["dvel"] = acc
        if has_corr:
            out["corr"] = corr
    return out


def apply_update_pallas(U, Ug0, divs: dict, dvels: dict, dt,
                        opts: HydroOptions):
    """Fused pointwise stage finish: RK apply from the per-axis divergence
    contributions + PdV internal-energy source + EnforceLimits +
    SyncDualEnergy + per-block PRE-floor validity flags, in ONE Pallas
    pass (the XLA formulation runs apply / is_state_valid / finalize as
    separate HBM passes -- ~1/4 of the 256^3 step time).

    Ghost-free unpadded path only (U and Ug0 share the state shape).
    Values are bit-identical to `_apply_from_divs` + `is_state_valid` +
    `enforce_limits` + `sync_dual_energy` evaluated in sequence: same
    elementwise expressions, same `sorted(divs)` accumulation order.

    Returns (U_finalized, ok_flags[grid]) -- ok_flags[b] is True when
    every cell of block b passed `is_state_valid` on the raw (pre-floor)
    updated state; the caller cond-gates the classic FOFC fallback on
    ``any(~ok_flags)`` exactly as it did on ``any(~valid_mask)``."""
    from ..indices import EGAS as _EG, EINT as _EI

    eos = opts.eos
    nv, X, Y, Z = U.shape
    if Z % 128:
        raise ValueError("apply_update_pallas requires Z % 128 == 0")
    dtype = U.dtype
    axes = sorted(divs)
    BTA = 8
    grid = (X // BTA, Y // BTA)
    vspec = lambda n4: pl.BlockSpec((n4, BTA, BTA, Z),
                                    lambda i, j: (0, i, j, 0))
    spec3 = pl.BlockSpec((BTA, BTA, Z), lambda i, j: (i, j, 0))
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    # per-block validity is written as an (8,128) tile of 0.0/1.0 (the
    # minimal VMEM-legal block); the caller reduces with jnp.all
    fspec = pl.BlockSpec((8, 128), lambda i, j: (i, j))

    n_div = len(axes)

    def kernel(*refs):
        U_blk = refs[0][...]
        Ug_blk = refs[1][...]
        div_blk = [refs[2 + k][...] for k in range(n_div)]
        dvel_blk = [refs[2 + n_div + k][...] for k in range(n_div)]
        # explicit f32: under jax_enable_x64 the SMEM scalar load widens
        # to f64 (same landmine as row_gather's i64 slice indices)
        dt_val = jax.lax.convert_element_type(refs[2 + 2 * n_div][0], dtype)
        out_ref = refs[3 + 2 * n_div]
        ok_ref = refs[4 + 2 * n_div]

        rhs = div_blk[0]
        for k in range(1, n_div):
            rhs = rhs + div_blk[k]
        dv = dvel_blk[0]
        for k in range(1, n_div):
            dv = dv + dvel_blk[k]

        # PdV source on the EINT slot (reference `add_internal_energy_pdv`
        # common path); component surgery via concatenate -- Mosaic lowers
        # sliced .at[].set as an unsupported scatter
        P = euler.pressure(Ug_blk, eos)
        parts = [rhs[:_EI], (rhs[_EI] - P * dv)[None]]
        if _EI + 1 < nv:
            parts.append(rhs[_EI + 1:])
        rhs = jnp.concatenate(parts, axis=0)
        U_try = U_blk + dt_val * rhs

        # validity as an (8,128) min-tile: Mosaic supports neither bool
        # reductions nor scalar reductions here, so `is_state_valid` is
        # evaluated in f32 min-arithmetic (same predicate values)
        rho_t = U_try[RHO]
        okb = rho_t > 0.0
        if not eos.is_isothermal:
            ke_t = 0.5 * (U_try[MX1] ** 2 + U_try[MX1 + 1] ** 2
                          + U_try[MX1 + 2] ** 2) / jnp.where(okb, rho_t, 1.0)
            okb = okb & ((U_try[_EG] - ke_t) > 0.0)
        finite = jnp.min(jnp.isfinite(U_try).astype(dtype), axis=0) > 0.5
        okm = (okb & finite).astype(dtype)  # (8,8,Z)
        okm = jnp.min(okm, axis=0)  # (8, Z)
        acc = okm[:, :128]
        for zk in range(1, Z // 128):
            acc = jnp.minimum(acc, okm[:, 128 * zk:128 * (zk + 1)])
        ok_ref[...] = acc

        # EnforceLimits (floors) -- concatenate flavor
        rho = U_try[RHO]
        rho_new = jnp.maximum(rho, opts.density_floor)
        comps = [U_try[c] for c in range(nv)]
        comps[RHO] = rho_new
        if opts.n_scalars > 0:
            scale = jnp.where(rho_new > 0.0, rho / rho_new, 0.0)
            scale = jnp.where(rho < opts.density_floor, scale, 1.0)
            for c in range(SCALAR0, nv):
                comps[c] = comps[c] * scale
        if not eos.is_isothermal and opts.temperature_floor > 0.0:
            ke = 0.5 * (comps[MX1] ** 2 + comps[MX1 + 1] ** 2
                        + comps[MX1 + 2] ** 2) / rho_new
            eint_floor = eos.eint_from_tgas(rho_new, opts.temperature_floor)
            comps[_EG] = ke + jnp.maximum(comps[_EG] - ke, eint_floor)
            comps[_EI] = jnp.maximum(comps[_EI], eint_floor)

        if opts.use_dual_energy and not eos.is_isothermal:
            ke = 0.5 * (comps[MX1] ** 2 + comps[MX1 + 1] ** 2
                        + comps[MX1 + 2] ** 2) / comps[RHO]
            Etot = comps[_EG]
            Eint_cons = Etot - ke
            use_cons = Eint_cons > 1.0e-3 * Etot
            comps[_EI] = jnp.where(use_cons, Eint_cons, comps[_EI])
            comps[_EG] = jnp.where(use_cons, Etot, comps[_EI] + ke)

        out_ref[...] = jnp.stack(comps)

    inputs = [U, Ug0] + [divs[d] for d in axes] + [dvels[d] for d in axes]
    in_specs = [vspec(nv), vspec(nv)] + [vspec(nv)] * n_div \
        + [spec3] * n_div + [smem]
    inputs.append(jnp.asarray([dt], dtype))
    # thread-local x64 override (same as pallas_substep.py): with
    # jax_enable_x64 on, python-float constants trace as weak f64 and
    # Mosaic cannot legalize them; the state here is f32
    from jax._src.config import enable_x64 as _en64

    with _en64(False):
        U_fin, ok = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=in_specs,
            out_specs=(vspec(nv), fspec),
            out_shape=(jax.ShapeDtypeStruct((nv, X, Y, Z), dtype),
                       jax.ShapeDtypeStruct((grid[0] * 8, grid[1] * 128),
                                            dtype)),
            interpret=_interpret_mode(),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=127 * 1024 * 1024,
            ),
        )(*inputs)
    # fold each (8,128) block tile to one bool -> [gx, gy] flags
    ok_blocks = jnp.min(
        ok.reshape(grid[0], 8, grid[1], 128), axis=(1, 3)
    ) > 0.5
    return U_fin, ok_blocks


def compute_fluxes_pallas(Ug: jnp.ndarray, opts: HydroOptions, first_order: bool = False,
                          bc_kinds: dict | None = None):
    """Drop-in replacement for `advance.compute_fluxes` using the fused
    Pallas sweep kernels.

    With `bc_kinds` = {axis: (lo_kind, hi_kind) | None} the input is an
    UNPADDED (ghost-free) state: periodic axes (None entries) use roll
    wrap, wall axes get in-kernel ghost assembly, and the return gains
    per-axis hi-wall plane dicts: (fluxes, facevels, flux_hi, vel_hi).

    This classic path keeps cons->prim OUTSIDE the kernels: it is the
    contraction-stable formulation that the bitwise ghost-free-vs-padded
    parity tests pin (the in-VMEM conversion of the fused-divergence path
    shifts FMA-contraction sites between the padded and wall-assembled
    kernel shapes, moving results by ~1 ulp)."""
    prim = euler.cons_to_prim(Ug, opts.eos, opts.reconstruct_eint)
    chi_ghost = {}
    if first_order:
        dmins, chi_cell = {}, None
    else:
        dmins, chi_cell, chi_ghost = precompute_transverse_pallas(
            prim, opts, bc_kinds
        )

    fluxes, facevels = {}, {}
    if bc_kinds is None:
        for d in opts.active_axes:
            F, v = compute_axis_flux_pallas(
                prim, d, opts, chi_cell, dmins, first_order
            )
            fluxes[d] = F
            facevels[d] = v
        return fluxes, facevels

    flux_hi, vel_hi = {}, {}
    for d in opts.active_axes:
        bc_axis = bc_kinds.get(d)
        if bc_axis is None:
            F, v = compute_axis_flux_pallas(
                prim, d, opts, chi_cell, dmins, first_order
            )
        else:
            F, v, Fh, vh = compute_axis_flux_pallas(
                prim, d, opts, chi_cell, dmins, first_order, bc_axis=bc_axis,
                chi_ghost_axis=chi_ghost.get(d),
            )
            flux_hi[d] = Fh
            vel_hi[d] = vh
        fluxes[d] = F
        facevels[d] = v
    return fluxes, facevels, flux_hi, vel_hi
