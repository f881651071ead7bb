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
from ..hydro.pallas_sweep import _block_spec_4d
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
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=127 * 1024 * 1024,
        ),
    )(prim_flat, cons_flat)
    return flux.reshape(G, 4, X, Y, Z)
