"""Fused Pallas TPU kernel for the radiation transport sweep.

Same design as the hydro sweep kernel (`hydro/pallas_sweep.py`): one VMEM
pass per direction computing PPM/PLM reconstruction of the (E, f) primitive
radiation variables, the donor-cell admissibility fallback, and the
frozen-Eddington HLL flux for every photon group. The sweep axis and the
lane axis stay whole inside each block so all stencil shifts are in-VMEM
rolls; the kernel reuses the exact `_hll_group_flux` math of the XLA path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..hydro import reconstruct
from ..hydro.pallas_sweep import _block_spec_4d, _interpret_mode
from ..stencil import sh


def compute_rad_axis_flux_pallas(prim_flat, cons_flat, axis, opts, G,
                                 block_transverse: int = 8):
    """Flux [G, 4, X, Y, Z] for one sweep axis via a fused kernel.
    prim_flat/cons_flat: [4G, X, Y, Z] padded arrays."""
    from .system import _hll_group_flux

    nv = prim_flat.shape[0]
    _, X, Y, Z = prim_flat.shape
    dtype = prim_flat.dtype

    shape4, imap4, grid = _block_spec_4d(nv, X, Y, Z, axis, block_transverse)

    def kernel(prim_ref, cons_ref, flux_ref):
        prim_blk = prim_ref[...]
        cons_blk = cons_ref[...]
        ax = axis + 1
        qL, qR = reconstruct.reconstruct_faces(prim_blk, axis, opts.reconstruction_order)
        cL = sh(cons_blk, -1, ax)
        cR = cons_blk
        bs = prim_blk.shape[1:]
        qLg = qL.reshape(G, 4, *bs)
        qRg = qR.reshape(G, 4, *bs)
        cLg = cL.reshape(G, 4, *bs)
        cRg = cR.reshape(G, 4, *bs)
        Fs = [
            _hll_group_flux(qLg[g], qRg[g], cLg[g], cRg[g], axis, opts)
            for g in range(G)
        ]
        flux_ref[...] = jnp.stack(Fs).reshape(nv, *bs)

    flux = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(shape4, imap4, memory_space=pltpu.VMEM),
            pl.BlockSpec(shape4, imap4, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(shape4, imap4, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nv, X, Y, Z), dtype),
        interpret=_interpret_mode(),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=127 * 1024 * 1024,
        ),
    )(prim_flat, cons_flat)
    return flux.reshape(G, 4, X, Y, Z)


def compute_rad_div_pallas(cons_flat, axis, opts, G, dx_axis,
                           block_transverse: int = 8):
    """Per-axis flux-divergence contribution [4G, X, Y, Z] (padded coords)
    for the radiation transport, fused into one kernel.

    Compared to `compute_rad_axis_flux_pallas` + an XLA divergence pass,
    this derives the primitive (E, f) variables in-kernel from the
    conserved block (halving the HBM input traffic) and differences the
    face fluxes along the sweep axis inside VMEM (the whole sweep axis is
    in-block), eliminating the separate divergence pass. The top padded
    cell along the sweep axis wraps and is garbage; callers slice the
    interior as with the XLA path.
    """
    from .system import _hll_group_flux

    nv = cons_flat.shape[0]
    _, X, Y, Z = cons_flat.shape
    dtype = cons_flat.dtype
    c = opts.c
    inv_dx = 1.0 / dx_axis

    shape4, imap4, grid = _block_spec_4d(nv, X, Y, Z, axis, block_transverse)

    def kernel(cons_ref, div_ref):
        cons_blk = cons_ref[...]
        ax = axis + 1
        bs = cons_blk.shape[1:]
        consg = cons_blk.reshape(G, 4, *bs)
        E = consg[:, 0:1]
        f = consg[:, 1:4] / (c * E)
        prim_blk = jnp.concatenate([E, f], axis=1).reshape(nv, *bs)

        qL, qR = reconstruct.reconstruct_faces(prim_blk, axis, opts.reconstruction_order)
        cL = sh(cons_blk, -1, ax)
        cR = cons_blk
        qLg = qL.reshape(G, 4, *bs)
        qRg = qR.reshape(G, 4, *bs)
        cLg = cL.reshape(G, 4, *bs)
        cRg = cR.reshape(G, 4, *bs)
        F = jnp.stack([
            _hll_group_flux(qLg[g], qRg[g], cLg[g], cRg[g], axis, opts)
            for g in range(G)
        ]).reshape(nv, *bs)
        div_ref[...] = (F - sh(F, 1, ax)) * inv_dx

    div = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec(shape4, imap4, memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(shape4, imap4, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nv, X, Y, Z), dtype),
        interpret=_interpret_mode(),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=127 * 1024 * 1024,
        ),
    )(cons_flat)
    return div.reshape(G, 4, X, Y, Z)
