"""Fused Pallas TPU kernel for the constrained-transport MHD sweep.

Same design as the hydro/radiation sweep kernels (`hydro/pallas_sweep.py`,
`radiation/pallas_sweep.py`): one VMEM pass per direction computing the
PLM/PPM reconstruction of the 8-component MHD primitive state, the HLLD
flux (`hydro/riemann.py:229` -- the Miyoshi & Kusano 2005 solver the
reference ships as dead code, ``src/hydro/HLLD.hpp:43``), and this axis's
cell-centered flux-divergence contribution, all inside one kernel. The
sweep axis and the lane (z) axis stay whole in-block so every stencil
shift is an in-VMEM roll whose wrap IS the periodic boundary (the CT
driver is ghost-free, `mhd/advance.py` module docstring).

Per sweep axis the kernel emits one [8, X, Y, Z] array:

  rows 0..4   d(state)/dt contribution in STATE order [rho, mx, my, mz, E]
              = (F - sh(F, 1, axis)) / dx  (canonical->state mapped)
  row  5      mass flux F_rho on the lo faces (GS05 upwinding input)
  row  6      F[by'] = canonical transverse-1 induction flux (-E_wax)
  row  7      F[bz'] = canonical transverse-2 induction flux (+E_vax)

so the XLA corner-EMF assembly (`mhd/advance._corner_emf`, a cheap
13-point stencil) consumes the face rows directly, while the hydro state
update becomes pointwise -- no face array for the momentum/energy block
ever reaches HBM.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..hydro import reconstruct
from ..hydro.pallas_sweep import _block_spec_4d, _interpret_mode
from ..hydro.riemann import FaceState, hlld
from ..stencil import sh

# thread-local x64 override (same as radiation/pallas_source.py): under
# jax_enable_x64, scalar-only jnp expressions inside the kernel (e.g.
# hlld's `where(bx > 0, 1.0, -1.0)`) produce f64 values, which crash the
# Mosaic layout pass (bitwidth <= 32 CHECK); the state here is f32
from jax._src.config import enable_x64 as _enable_x64

# canonical frames, kept in sync with mhd.advance._FRAMES
_FRAMES = {0: (1, 2), 1: (2, 0), 2: (0, 1)}


def compute_mhd_axis_pallas(prim_flat, bxf, axis, opts,
                            block_transverse: int = 8):
    """Fused div + face-EMF kernel for one MHD sweep axis.

    prim_flat: [8, X, Y, Z] primitives [rho, vx, vy, vz, P, Bx, By, Bz]
    bxf:       [X, Y, Z] staggered normal field ON the axis faces
    Returns [8, X, Y, Z] per the module-docstring row layout.
    """
    nv = prim_flat.shape[0]
    _, X, Y, Z = prim_flat.shape
    dtype = prim_flat.dtype
    vax, wax = _FRAMES[axis]
    gamma = opts.gamma
    inv_dx = 1.0 / opts.dx[axis]

    shape4, imap4, grid = _block_spec_4d(nv, X, Y, Z, axis, block_transverse)
    imap3 = lambda *idx: imap4(*idx)[1:]
    shape3 = shape4[1:]

    def face_state(q):
        zero = jnp.zeros_like(q[0])
        return FaceState(
            rho=jnp.maximum(q[0], opts.density_floor)
            if opts.density_floor > 0.0 else q[0],
            u=q[1 + axis], v=q[1 + vax], w=q[1 + wax],
            P=jnp.maximum(q[4], opts.pressure_floor)
            if opts.pressure_floor > 0.0 else q[4],
            cs=zero, E=zero, Eint=zero,
            by=q[5 + vax], bz=q[5 + wax],
        )

    def kernel(prim_ref, bx_ref, out_ref):
        prim_blk = prim_ref[...]
        bx_blk = bx_ref[...]
        ax = axis + 1
        qL, qR = reconstruct.reconstruct_faces(
            prim_blk, axis, opts.reconstruction_order
        )
        F = hlld(face_state(qL), face_state(qR), gamma, bx_blk)
        # canonical [rho, m_ax, m_vax, m_wax, E] -> state order
        comps = {0: F[0], 1 + axis: F[1], 1 + vax: F[2], 1 + wax: F[3],
                 4: F[4]}
        rows = jnp.stack([comps[i] for i in range(5)])
        div = (rows - sh(rows, 1, ax)) * inv_dx
        out_ref[...] = jnp.concatenate(
            [div, F[0][None], F[6][None], F[7][None]], axis=0
        )

    with _enable_x64(False):
        out = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec(shape4, imap4, memory_space=pltpu.VMEM),
                pl.BlockSpec(shape3, imap3, memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(shape4, imap4, memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((nv, X, Y, Z), dtype),
            interpret=_interpret_mode(),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=127 * 1024 * 1024,
            ),
        )(prim_flat, bxf)
    return out
