"""Fused Pallas TPU kernel for the implicit gas-radiation coupling.

The Newton-Raphson matter-coupling solve is purely per-cell (no stencils),
so it tiles perfectly: each kernel instance solves its block entirely in
VMEM -- Newton while-loop, implicit flux/momentum update, and the lagged
work-term outer iteration -- reusing `add_source_terms_single_group`
verbatim as the kernel body. This removes the ~25 HBM round-trips per
Newton iteration of the XLA formulation (the same fragmentation tax the
hydro sweep kernels eliminated).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Thread-local x64 override: with jax_enable_x64 on (the framework default
# for CGS robustness), python-float literals trace as weak f64[] scalars,
# and Mosaic cannot legalize the resulting f64->f32 `tpu.truncf`. The state
# here is f32, so the kernel is traced with x64 off. The config state is
# part of the jit cache key, so this composes with the outer jit trace.
from jax._src.config import enable_x64 as _enable_x64

from ..hydro.pallas_sweep import _interpret_mode
from .source_terms import add_source_terms_single_group

_BT = int(os.environ.get("QUOKKA_PALLAS_SOURCE_BT", "8"))


def source_update_pallas(U, rad_src, dt, stage, opts, eos,
                         kappa_p, kappa_e, kappa_f, rad_start):
    """Drop-in Pallas replacement for `add_source_terms_single_group`
    (single group; interior arrays, no halos needed)."""
    nv, X, Y, Z = U.shape
    dtype = U.dtype
    BT = _BT

    grid = (pl.cdiv(X, BT), pl.cdiv(Y, BT))
    shape4 = (nv, BT, BT, Z)
    imap4 = lambda i, j: (jnp.zeros_like(i), i, j, jnp.zeros_like(j))
    shape3 = (BT, BT, Z)
    imap3 = lambda i, j: (i, j, jnp.zeros_like(j))

    def kernel(U_ref, src_ref, dt_ref, out_ref):
        U_blk = U_ref[...]
        src_blk = src_ref[...]
        dt_val = dt_ref[0]
        out, _stats = add_source_terms_single_group(
            U_blk, src_blk, dt_val, stage, opts, eos,
            kappa_p, kappa_e, kappa_f, rad_start, unroll_iters=None,
        )
        out_ref[...] = out

    with _enable_x64(False):
        out = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec(shape4, imap4, memory_space=pltpu.VMEM),
                pl.BlockSpec(shape3, imap3, memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec(shape4, imap4, memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((nv, X, Y, Z), dtype),
            interpret=_interpret_mode(),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=127 * 1024 * 1024,
            ),
        )(U, rad_src, jnp.asarray([dt], dtype=dtype))
    return out, {"newton_iters_max": jnp.int32(0)}
