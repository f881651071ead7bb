"""Inter-level grid operators: restriction, prolongation, mask morphology.

TPU-native equivalents of AMReX's coarse-fine machinery used by the
reference: conservative average-down (`amrex::average_down`, reference
`AverageDown`, ``src/simulation.hpp:1939-1964``), limited linear
conservative interpolation (`amrex::lincc_interp`, the reference's default
`amrInterpMethod_=1`, ``src/simulation.hpp:166``), and the tag-buffering /
nesting morphology of the regrid step.

All operators act on full-domain dense level arrays (see `amr.hierarchy`)
with refinement ratio 2 along the active axes, as pure reshapes/rolls that
XLA fuses -- no gather/scatter.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp

from ..stencil import sh


def restrict(U: jnp.ndarray, active_axes: Sequence[int]) -> jnp.ndarray:
    """Conservative average-down by factor 2 along the active axes.
    U: [..., nx, ny, nz] (spatial = last three axes)."""
    out = U
    for d in active_axes:
        ax = out.ndim - 3 + d
        shape = list(out.shape)
        n = shape[ax]
        new_shape = shape[:ax] + [n // 2, 2] + shape[ax + 1:]
        out = out.reshape(new_shape).mean(axis=ax + 1)
    return out


def _mc_slope(U: jnp.ndarray, ax: int) -> jnp.ndarray:
    """Monotonized-central limited slope along array axis `ax` (the limiter
    behavior of AMReX cell_cons/lincc interpolation)."""
    dp = sh(U, 1, ax) - U
    dm = U - sh(U, -1, ax)
    dc = 0.5 * (dp + dm)
    s = jnp.sign(dc)
    mag = jnp.minimum(jnp.abs(dc), 2.0 * jnp.minimum(jnp.abs(dp), jnp.abs(dm)))
    return jnp.where(dp * dm > 0.0, s * mag, 0.0)


def prolong(U: jnp.ndarray, active_axes: Sequence[int]) -> jnp.ndarray:
    """Limited-linear conservative interpolation to the 2x finer grid
    (lincc-style): fine child value = coarse + sum_d (+-1/4) slope_d.
    Conservative by construction (children average to the parent).

    Multi-dimensional limiting (AMReX `CellConservativeLinear` semantics):
    per-axis MC slopes can still overshoot at a corner child, where all
    d slope contributions add (e.g. a 10^6 density contrast at a sphere
    edge produced NEGATIVE prolonged densities); rescale each cell's
    slopes by a common factor so every child stays within the 3^d
    neighborhood's min/max."""
    slopes = {d: _mc_slope(U, U.ndim - 3 + d) for d in active_axes}

    if len(active_axes) > 1:
        mn = U
        mx = U
        for d in active_axes:
            ax = U.ndim - 3 + d
            mn = jnp.minimum(mn, jnp.minimum(sh(mn, 1, ax), sh(mn, -1, ax)))
            mx = jnp.maximum(mx, jnp.maximum(sh(mx, 1, ax), sh(mx, -1, ax)))
        s_sum = sum(jnp.abs(slopes[d]) for d in active_axes) * 0.25
        # guard the division with a SELECT, not a finfo.tiny clamp: the
        # minimum normal f64 is not representable on the TPU's f32-pair
        # f64 emulation (flushes to 0 -> 0/0 = NaN on flat cells), and a
        # miscompiled XLA:CPU AOT cache was observed flushing it on CPU
        # hosts too. With s_sum == 0 every slope is zero, so alpha = 1 is
        # exact.
        flat = s_sum <= 0.0
        denom = jnp.where(flat, 1.0, s_sum)
        alpha = jnp.minimum(1.0, jnp.minimum(U - mn, mx - U) / denom)
        alpha = jnp.where(flat, 1.0, jnp.maximum(alpha, 0.0))
        slopes = {d: alpha * s for d, s in slopes.items()}
    out = U
    out_slopes = dict(slopes)
    for d in active_axes:
        ax = out.ndim - 3 + d
        n = out.shape[ax]
        # interleave (parent - s/4, parent + s/4) along this axis
        s = out_slopes.pop(d)
        lo = out - 0.25 * s
        hi = out + 0.25 * s
        stacked = jnp.stack([lo, hi], axis=ax + 1)
        new_shape = list(out.shape)
        new_shape[ax] = 2 * n
        out = stacked.reshape(new_shape)
        # other slopes must be refined along this axis too (piecewise const)
        out_slopes = {
            e: jnp.repeat(se, 2, axis=ax) for e, se in out_slopes.items()
        }
    return out


def prolong_mask(mask: jnp.ndarray, active_axes: Sequence[int]) -> jnp.ndarray:
    """Refine a boolean mask to the fine grid (each parent -> 2^d children)."""
    out = mask
    for d in active_axes:
        ax = out.ndim - 3 + d
        out = jnp.repeat(out, 2, axis=ax)
    return out


def restrict_mask_any(mask: jnp.ndarray, active_axes: Sequence[int]) -> jnp.ndarray:
    """Coarsen a boolean mask: parent is set if ANY child is set."""
    out = mask
    for d in active_axes:
        ax = out.ndim - 3 + d
        n = out.shape[ax]
        shape = list(out.shape)
        new_shape = shape[:ax] + [n // 2, 2] + shape[ax + 1:]
        out = out.reshape(new_shape).any(axis=ax + 1)
    return out


def dilate(mask: jnp.ndarray, n: int, active_axes: Sequence[int],
           periodic: Sequence[bool]) -> jnp.ndarray:
    """Binary dilation by `n` cells along the active axes (the reference's
    `amr.n_error_buf` tag buffering). Non-periodic edges do not wrap."""
    out = mask
    for _ in range(n):
        grown = out
        for d in active_axes:
            ax = out.ndim - 3 + d
            up = sh(out, 1, ax)
            dn = sh(out, -1, ax)
            if not periodic[d]:
                # zero the wrapped slabs
                idx_lo = [slice(None)] * out.ndim
                idx_lo[ax] = slice(-1, None)
                idx_hi = [slice(None)] * out.ndim
                idx_hi[ax] = slice(0, 1)
                up = up.at[tuple(idx_lo)].set(False)
                dn = dn.at[tuple(idx_hi)].set(False)
            grown = grown | up | dn
        out = grown
    return out


def mask_face_flux(F: jnp.ndarray, mask: jnp.ndarray, axis: int,
                   ng: Sequence[int]) -> jnp.ndarray:
    """Zero a level's face fluxes on faces NOT adjacent to any active
    (mask=True) cell. The dense-mask design's inactive region may evolve
    unphysically within a substep (its STATE is re-imposed from prolonged
    coarse data afterwards, so that is harmless by contract) -- but its
    fluxes would otherwise leak into the parent's flux register through
    `restrict_face_flux`'s transverse averaging. Masks are coarse-aligned
    (children come in 2^d blocks), so every coarse-fine BOUNDARY face's
    underlying fine faces have exactly one active neighbor and keep their
    values; interior-garbage faces contribute nothing (the reflux ignores
    non-boundary faces anyway). F: [nc, padded spatial]; mask: interior."""
    m_p = jnp.pad(mask, [(g, g) for g in ng])
    # face i sits between cells i-1 and i (padded coords)
    ok = jnp.logical_or(m_p, sh(m_p, -1, axis))
    return jnp.where(ok[None], F, 0.0)


def restrict_face_flux(F: jnp.ndarray, axis: int, active_axes: Sequence[int],
                       ng_f: Sequence[int], ng_c: Sequence[int]) -> jnp.ndarray:
    """Restrict a fine-level face-flux array (padded face coords) to coarse
    faces: pick fine faces at even indices along `axis` (the coarse face
    positions), average over the 2^k fine faces covering each coarse face
    transversely. Returns a coarse-padded-coords face array (zeros in the
    ghost faces)."""
    nd = F.ndim
    # slice to interior faces: along `axis` keep N+1 faces [g, g+N]; along
    # transverse axes keep the N interior cells.
    idx = [slice(None)] * (nd - 3)
    for d in range(3):
        g = ng_f[d]
        n = F.shape[nd - 3 + d] - 2 * g
        if d == axis:
            idx.append(slice(g, g + n + 1))
        elif g > 0:
            idx.append(slice(g, g + n))
        else:
            idx.append(slice(None))
    out = F[tuple(idx)]

    for d in active_axes:
        ax = nd - 3 + d
        n = out.shape[ax]
        if d == axis:
            sub = [slice(None)] * nd
            sub[ax] = slice(0, n, 2)
            out = out[tuple(sub)]
        else:
            shape = list(out.shape)
            new_shape = shape[:ax] + [n // 2, 2] + shape[ax + 1:]
            out = out.reshape(new_shape).mean(axis=ax + 1)

    # re-pad into coarse padded coords: along `axis` the N_c+1 faces sit at
    # [g_c, g_c+N_c], so the high pad is g_c - 1.
    pad = [(0, 0)] * (nd - 3)
    for d in range(3):
        g = ng_c[d]
        if d == axis:
            pad.append((g, max(g - 1, 0)))
        else:
            pad.append((g, g))
    return jnp.pad(out, pad)
