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
from . import reconstruct
from .advance import HydroOptions, _transverse_axes
from .riemann import FaceState, hllc, llf


def precompute_transverse_fields(prim: jnp.ndarray, opts: HydroOptions):
    """Cheap fused XLA pass: per active axis t, the one-sided min velocity
    difference field dmin_t(c) = min(v_t(c+1_t) - v_t(c), v_t(c) - v_t(c-1_t))
    (used by the carbuncle dw and CW84 artificial viscosity), plus the
    combined flattening coefficient chi_cell = min over axes of the 3-point
    min of chi_t (reference `FlattenShocks`)."""
    dmins = {}
    for t in opts.active_axes:
        v = prim[PVX1 + t]
        d_plus = sh(v, 1, t) - v
        d_minus = v - sh(v, -1, t)
        dmins[t] = jnp.minimum(d_plus, d_minus)

    chi_cell = None
    if opts.use_flattening and opts.reconstruction_order == 3:
        for t in opts.active_axes:
            chi_t = reconstruct.flattening_chi(prim, t, opts.eos, opts.reconstruct_eint)
            m = jnp.minimum(jnp.minimum(sh(chi_t, -1, t), chi_t), sh(chi_t, 1, t))
            chi_cell = m if chi_cell is None else jnp.minimum(chi_cell, m)
    return dmins, chi_cell


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
            cs = eos.sound_speed(rho, P)
            E = eos.eint_from_pres(rho, P) + ke
        else:
            P = q[PPRES]
            Eint = q[PEINT]
            cs = eos.sound_speed(rho, P)
            E = eos.eint_from_pres(rho, P) + ke
        scalars = q[SCALAR0:] if q.shape[0] > SCALAR0 else None
        return FaceState(rho=rho, u=u, v=v, w=w, P=P, cs=cs, E=E, Eint=Eint, scalars=scalars)

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

    facevel = jnp.where(Fout[RHO] >= 0.0, Fout[RHO] / sR.rho, Fout[RHO] / sL.rho)
    return Fout, facevel


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
    BZ = 128
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


def compute_axis_flux_pallas(
    prim: jnp.ndarray,
    axis: int,
    opts: HydroOptions,
    chi_cell: jnp.ndarray | None,
    dmins: dict,
    first_order: bool = False,
    block_transverse: int | None = None,
):
    if block_transverse is None:
        block_transverse = _BLOCK_TRANSVERSE
    """Single fused kernel: flux + face velocity for one sweep axis."""
    nv = prim.shape[0]
    _, X, Y, Z = prim.shape
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
    for arr in (chi_cell if use_chi else None, dminv, dminw):
        flags.append(arr is not None)
        if arr is not None:
            inputs.append(arr)
            in_specs.append(pl.BlockSpec(shape3, imap3, memory_space=pltpu.VMEM))
    has_chi, has_v, has_w = flags

    def kernel(*refs):
        idx = 0
        prim_ref = refs[idx]; idx += 1
        chi_ref = refs[idx] if has_chi else None
        idx += int(has_chi)
        dv_ref = refs[idx] if has_v else None
        idx += int(has_v)
        dw_ref = refs[idx] if has_w else None
        idx += int(has_w)
        flux_ref, vel_ref = refs[idx], refs[idx + 1]

        prim_blk = prim_ref[...]
        chi_blk = chi_ref[...] if chi_ref is not None else None
        dv_blk = dv_ref[...] if dv_ref is not None else None
        dw_blk = dw_ref[...] if dw_ref is not None else None

        F, v = _sweep_body(prim_blk, chi_blk, dv_blk, dw_blk, axis, opts, first_order)
        flux_ref[...] = F
        vel_ref[...] = v

    flux, facevel = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec(shape4, imap4, memory_space=pltpu.VMEM),
            pl.BlockSpec(shape3, imap3, memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((nv, X, Y, Z), dtype),
            jax.ShapeDtypeStruct((X, Y, Z), dtype),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=127 * 1024 * 1024,
        ),
    )(*inputs)
    return flux, facevel


def compute_fluxes_pallas(Ug: jnp.ndarray, opts: HydroOptions, first_order: bool = False):
    """Drop-in replacement for `advance.compute_fluxes` using the fused
    Pallas sweep kernels."""
    from . import euler

    prim = euler.cons_to_prim(Ug, opts.eos, opts.reconstruct_eint)
    if first_order:
        dmins, chi_cell = {}, None
    else:
        dmins, chi_cell = precompute_transverse_fields(prim, opts)

    fluxes, facevels = {}, {}
    for d in opts.active_axes:
        F, v = compute_axis_flux_pallas(prim, d, opts, chi_cell, dmins, first_order)
        fluxes[d] = F
        facevels[d] = v
    return fluxes, facevels
