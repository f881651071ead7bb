"""Fully-fused Pallas TPU kernels for one radiation IMEX substep stage.

The single-group radhydro hot path (periodic ghost-free unigrid, f32,
single chip) spends each substep on 2x(3 per-axis transport kernels) +
2 Newton-coupling kernels plus the XLA predict/combine glue between them
-- every stage re-reads and re-writes the radiation block from HBM several
times. Here each IMEX stage is ONE kernel:

  stage 1:  divF0 = div F(R0);  R1 = amend(R0 + dt divF0);
            (gas, R1) <- implicit matter coupling       [Newton, in-VMEM]
  stage 2:  divF1 = div F(R1');
            R2 = amend((1-a32) R0 + a32 R1' + dt(0.5-a32) divF0
                       + dt/2 divF1);
            (gas, R2) <- implicit matter coupling

(reference PredictStep / AddFluxesRK2 / AddSourceTermsSingleGroup,
``src/radiation/radiation_system.hpp:668-772`` and
``source_terms_single_group.hpp``; the math here is *imported* from
`system.py` / `source_terms.py`, not re-derived).

The 3-axis transport stencil inside one kernel needs spatial halos in the
two tiled dimensions. The radiation block is pre-padded (periodic wrap)
by H cells in x and y, and each kernel instance reads an overlapping
(BT+2H, BT+2H) window via per-dimension `Element` indexing while the lane
(z) axis stays whole in-block so z-stencil shifts are in-VMEM rolls whose
wrap IS the periodic boundary. H = reconstruction stencil radius (PLM 2,
PPM 3). The matter coupling is pointwise, so it needs no halo at all.

HBM traffic per substep drops from ~12 radiation-block traversals + 2
full-state round trips to: two 4-component pad copies, two overlapping
window reads (~(1+2H/BT)^2 x 4 components), and one full-state
read/write per stage.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
import jax._src.pallas.core as pc

# thread-local x64 override: same trick as pallas_source.py -- with
# jax_enable_x64 on, python floats trace as weak f64 scalars and Mosaic
# cannot legalize the f64->f32 truncf; the state here is f32
from jax._src.config import enable_x64 as _enable_x64

from ..hydro import reconstruct
from ..hydro.pallas_sweep import _interpret_mode
from ..stencil import sh
from .source_terms import add_source_terms_single_group
from .system import IMEX_A32, _hll_group_flux, amend_rad_state

_BT = int(os.environ.get("QUOKKA_RAD_SUBSTEP_BT", "8"))


def _halo(order: int) -> int:
    """Stencil radius of the face reconstruction: face f reads cells
    [f-1-r, f+r] with r = order-1 (donor 0, PLM 1, PPM 2) -> computing
    faces [s, s+BT] needs cells [s-order, s+BT+order-1], i.e. H = order.
    Rounded up to 4 so the windowed (second-to-last) block dim BT+2H is a
    sublane multiple (Mosaic requires last-two block dims of 8x128 tiles);
    the extra halo cells are computed and discarded."""
    return 4


def _axis_div_windowed(W, axis, opts, inv_dx, H, BT):
    """Divergence contribution of `axis` for the central BT cells of a
    window that carries H halo cells on each side of that axis.
    W: [4, ...] conserved radiation window (single group)."""
    ax = axis + 1
    E = W[0:1]
    f = W[1:4] / (opts.c * E)
    prim = jnp.concatenate([E, f], axis=0)
    qL, qR = reconstruct.reconstruct_faces(prim, axis, opts.reconstruction_order)
    F = _hll_group_flux(qL, qR, sh(W, -1, ax), W, axis, opts)
    lo = [slice(None)] * W.ndim
    hi = [slice(None)] * W.ndim
    lo[ax] = slice(H, H + BT)
    hi[ax] = slice(H + 1, H + BT + 1)
    return (F[tuple(lo)] - F[tuple(hi)]) * inv_dx


def _axis_div_wrapped(C, axis, opts, inv_dx):
    """Divergence contribution of `axis` via in-block rolls (the whole
    axis lives in the block; the roll wrap is the periodic BC)."""
    ax = axis + 1
    E = C[0:1]
    f = C[1:4] / (opts.c * E)
    prim = jnp.concatenate([E, f], axis=0)
    qL, qR = reconstruct.reconstruct_faces(prim, axis, opts.reconstruction_order)
    F = _hll_group_flux(qL, qR, sh(C, -1, ax), C, axis, opts)
    return (F - sh(F, 1, ax)) * inv_dx


def _pad_xy(R, H):
    """Periodic wrap pad of [4, X, Y, Z] along x and y by H cells."""
    return jnp.pad(R, ((0, 0), (H, H), (H, H), (0, 0)), mode="wrap")


def fused_substep_pallas(U, rad_src, dt, opts, eos, kappa_p, kappa_e,
                         kappa_f, rad_start, dx):
    """One full IMEX PD-ARS radiation substep (both transport stages and
    both implicit couplings) as two fused Pallas kernels.

    U: [nvar, X, Y, Z] unpadded f32 state (periodic ghost-free path);
    rad_src: [X, Y, Z] user energy source. Returns (U_new, stats)."""
    nv, X, Y, Z = U.shape
    dtype = U.dtype
    H = _halo(opts.reconstruction_order)
    BT = _BT
    while X % BT or Y % BT:
        BT //= 2
    inv_dx = tuple(1.0 / d for d in dx)

    grid = (X // BT, Y // BT)
    # Mosaic requires Element indexing on ALL dims or none, so the
    # component and z dims are Element-indexed whole extents at offset 0
    win = lambda n4: pl.BlockSpec(
        (pc.Element(n4), pc.Element(BT + 2 * H), pc.Element(BT + 2 * H),
         pc.Element(Z)),
        lambda i, j: (0, i * BT, j * BT, 0),
    )
    blk3 = pl.BlockSpec((BT, BT, Z), lambda i, j: (i, j, 0))
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    vspec = lambda n4: pl.BlockSpec((n4, BT, BT, Z),
                                    lambda i, j: (0, i, j, 0))

    def divF_of(W, C):
        """Total transport divergence for the central block: x/y from the
        haloed window, z from in-block rolls."""
        d = _axis_div_windowed(W, 0, opts, inv_dx[0], H, BT)
        d = d[:, :, H:H + BT] + _axis_div_windowed(
            W[:, H:H + BT], 1, opts, inv_dx[1], H, BT
        )
        return d + _axis_div_wrapped(C, 2, opts, inv_dx[2])

    def source(U_blk, src_blk, dt_val, stage):
        out, _ = add_source_terms_single_group(
            U_blk, src_blk, dt_val, stage, opts, eos,
            kappa_p, kappa_e, kappa_f, rad_start, unroll_iters=None,
        )
        return out

    def amend1(R):
        """amend_rad_state on a groupless [4, ...] block."""
        return amend_rad_state(R[None], opts)[0]

    def k1(Rp_ref, U_ref, src_ref, dt_ref, U1_ref, div_ref):
        W = Rp_ref[...]
        U_blk = U_ref[...]
        dt_val = dt_ref[0]
        divF0 = divF_of(W, U_blk[rad_start:])
        R1 = amend1(U_blk[rad_start:] + dt_val * divF0)
        # concatenate, not .at[].set: the scatter lowering of a sliced
        # set is unimplemented in Mosaic
        U1 = jnp.concatenate([U_blk[:rad_start], R1], axis=0)
        U1_ref[...] = source(U1, src_ref[...], dt_val, 1)
        div_ref[...] = divF0

    def k2(Rp1_ref, U1_ref, R0_ref, div0_ref, src_ref, dt_ref, U2_ref):
        W1 = Rp1_ref[...]
        U1_blk = U1_ref[...]
        dt_val = dt_ref[0]
        a32 = IMEX_A32
        divF1 = divF_of(W1, U1_blk[rad_start:])
        R2 = amend1(
            (1.0 - a32) * R0_ref[...]
            + a32 * U1_blk[rad_start:]
            + dt_val * (0.5 - a32) * div0_ref[...]
            + dt_val * 0.5 * divF1
        )
        U2 = jnp.concatenate([U1_blk[:rad_start], R2], axis=0)
        U2_ref[...] = source(U2, src_ref[...], dt_val, 2)

    cparams = pltpu.CompilerParams(vmem_limit_bytes=127 * 1024 * 1024)
    dt_arr = jnp.asarray([dt], dtype=dtype)
    R0 = U[rad_start:]

    with _enable_x64(False):
        U1, div0 = pl.pallas_call(
            k1,
            grid=grid,
            in_specs=[win(4), vspec(nv), blk3, smem],
            out_specs=[vspec(nv), vspec(4)],
            out_shape=[
                jax.ShapeDtypeStruct((nv, X, Y, Z), dtype),
                jax.ShapeDtypeStruct((4, X, Y, Z), dtype),
            ],
            interpret=_interpret_mode(),
            compiler_params=cparams,
        )(_pad_xy(R0, H), U, rad_src, dt_arr)

        U2 = pl.pallas_call(
            k2,
            grid=grid,
            in_specs=[win(4), vspec(nv), vspec(4), vspec(4), blk3, smem],
            out_specs=vspec(nv),
            out_shape=jax.ShapeDtypeStruct((nv, X, Y, Z), dtype),
            interpret=_interpret_mode(),
            compiler_params=cparams,
        )(_pad_xy(U1[rad_start:], H), U1, R0, div0, rad_src, dt_arr)

    return U2, {"newton_iters_max": jnp.int32(0)}
