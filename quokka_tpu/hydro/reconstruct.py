"""Reconstruction operators: donor-cell, PLM (minmod/MC), PPM + flattening.

TPU-native rebuild of `HyperbolicSystem` (reference
``src/hyperbolic_system.hpp:44-432``: donor-cell `:72`, PLM `:84`, PPM
Colella-Woodward 1984 with Mignone 2014 monotonicity `:297-430`) and of the
Miller & Colella 2002 shock flattening (reference
``src/hydro/hydro_system.hpp:531-696``).

All operators are axis-parameterized fused stencils on the full padded array
(see `quokka_tpu.stencil`); direction handling replaces the reference's
`ArrayView` index-permutation trick. Face arrays use the "face f lies between
cells f-1 and f" convention.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp

from ..eos import IdealGasEOS
from ..indices import PPRES, PRHO, PVX1
from ..stencil import sh
from .euler import pressure_from_prim


# ----------------------------------------------------------- slope limiters
def minmod(a, b):
    return 0.5 * (jnp.sign(a) + jnp.sign(b)) * jnp.minimum(jnp.abs(a), jnp.abs(b))


def mc_limiter(a, b):
    """Monotonized-central limiter (reference `MC`,
    ``src/hyperbolic_system.hpp:58-61``)."""
    return (
        0.5
        * (jnp.sign(a) + jnp.sign(b))
        * jnp.minimum(0.5 * jnp.abs(a + b), jnp.minimum(2.0 * jnp.abs(a), 2.0 * jnp.abs(b)))
    )


# ------------------------------------------------------------ reconstruction
def donor_cell_faces(P: jnp.ndarray, axis: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """First-order: face f gets the adjacent cell averages."""
    ax = axis + 1
    return sh(P, -1, ax), P


def plm_faces(P: jnp.ndarray, axis: int, limiter: str = "minmod"):
    """Piecewise-linear with limited slopes (reference `ReconstructStatesPLM`)."""
    ax = axis + 1
    lim = minmod if limiter == "minmod" else mc_limiter
    slope = lim(sh(P, 1, ax) - P, P - sh(P, -1, ax))
    qL = sh(P, -1, ax) + 0.5 * sh(slope, -1, ax)
    qR = P - 0.5 * slope
    return qL, qR


def ppm_faces(P: jnp.ndarray, axis: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """PPM interface states (CW84 + Mignone 2014 monotonicity), matching the
    reference's scheme (``src/hyperbolic_system.hpp:339-432``):

    1. 4th-order interface estimate a_{i-1/2} = 7/12(a_i + a_{i-1})
       - 1/12(a_{i+1} + a_{i-2}), grouped for FP symmetry;
    2. clamp interfaces to the [min,max] of the 3-cell neighborhood;
    3. monotonicity: at local extrema fall back to PLM with the MC slope
       (Balsara 2017); otherwise apply the CW84 overshoot resets.

    Returns (qL, qR) at faces: qL(f) from cell f-1, qR(f) from cell f.
    """
    ax = axis + 1
    q = lambda k: sh(P, k, ax)
    qm2, qm1, q0, qp1, qp2 = q(-2), q(-1), P, q(1), q(2)

    lo = jnp.minimum(jnp.minimum(qm1, q0), qp1)
    hi = jnp.maximum(jnp.maximum(qm1, q0), qp1)

    c1 = 7.0 / 12.0
    c2 = -1.0 / 12.0
    # grouped to preserve exact FP symmetry (Athena++-style)
    a_minus = (c1 * q0 + c2 * qp1) + (c1 * qm1 + c2 * qm2)
    a_plus = (c1 * qp1 + c2 * qp2) + (c1 * q0 + c2 * qm1)

    a_minus = jnp.clip(a_minus, lo, hi)
    a_plus = jnp.clip(a_plus, lo, hi)

    dq_minus = q0 - a_minus
    dq_plus = a_plus - q0
    extremum = (dq_plus * dq_minus) <= 0.0

    dq0 = mc_limiter(qp1 - q0, q0 - qm1)
    # extremum branch: PLM fallback
    ext_minus = q0 - 0.5 * dq0
    ext_plus = q0 + 0.5 * dq0

    # overshoot resets (CW84 eq. 1.10)
    reset_minus = jnp.abs(dq_minus) >= 2.0 * jnp.abs(dq_plus)
    reset_plus = jnp.abs(dq_plus) >= 2.0 * jnp.abs(dq_minus)
    mono_minus = jnp.where(reset_minus, q0 - 2.0 * dq_plus, a_minus)
    mono_plus = jnp.where(reset_plus, q0 + 2.0 * dq_minus, a_plus)

    new_minus = jnp.where(extremum, ext_minus, mono_minus)
    new_plus = jnp.where(extremum, ext_plus, mono_plus)

    qL = sh(new_plus, -1, ax)  # left state at face f comes from cell f-1
    qR = new_minus
    return qL, qR


def reconstruct_faces(P: jnp.ndarray, axis: int, order: int):
    if order == 3:
        return ppm_faces(P, axis)
    if order == 2:
        return plm_faces(P, axis, "minmod")
    if order == 1:
        return donor_cell_faces(P, axis)
    raise ValueError(f"invalid reconstruction order {order}")


# ---------------------------------------------------------------- flattening
def flattening_chi(
    prim: jnp.ndarray,
    axis: int,
    eos: IdealGasEOS,
    reconstruct_eint: bool,
    bc_axis=None,
) -> jnp.ndarray:
    """Per-cell flattening coefficient chi for sweeps along `axis`
    (reference `ComputeFlatteningCoefficients`,
    ``src/hydro/hydro_system.hpp:531-640``; Miller & Colella 2002 eqs 74-77).

    `bc_axis=(lo_kind, hi_kind)` enables wall-corrected stencil reads on a
    ghost-free (unpadded) array; None keeps the plain roll semantics for
    ghost-padded inputs.
    """
    beta_max, beta_min = 0.85, 0.75
    Zmax, Zmin = 0.75, 0.25
    ax = axis  # Pg/vel are 3D spatial fields (no component axis)

    if bc_axis is None:
        shp = lambda A, k, odd=False: sh(A, k, ax)
    else:
        from ..stencil import sh_bc

        lo_k, hi_k = bc_axis
        shp = lambda A, k, odd=False: sh_bc(A, k, ax, lo_k, hi_k, odd)

    Pg = pressure_from_prim(prim, eos, reconstruct_eint)
    Pp1, Pm1 = shp(Pg, 1), shp(Pg, -1)
    Pp2, Pm2 = shp(Pg, 2), shp(Pg, -2)

    beta_denom = jnp.abs(Pp2 - Pm2)
    beta = jnp.where(beta_denom != 0.0, jnp.abs(Pp1 - Pm1) / jnp.where(beta_denom != 0.0, beta_denom, 1.0), 0.0)
    chi_min = jnp.clip((beta_max - beta) / (beta_max - beta_min), 0.0, 1.0)

    rho = prim[PRHO]
    if eos.is_isothermal:
        K_S = rho * eos.cs_isothermal**2
    else:
        K_S = eos.sound_speed(rho, Pg) ** 2 * rho
    Z = jnp.abs(Pp1 - Pm1) / K_S

    vel = prim[PVX1 + axis]
    converging = shp(vel, 1, odd=True) < shp(vel, -1, odd=True)
    chi_conv = jnp.maximum(chi_min, jnp.minimum(1.0, (Zmax - Z) / (Zmax - Zmin)))
    return jnp.where(converging, chi_conv, 1.0)


def flatten_faces(
    qL: jnp.ndarray,
    qR: jnp.ndarray,
    prim: jnp.ndarray,
    chis: Sequence[jnp.ndarray],
    active_axes: Sequence[int],
    axis: int,
):
    """Blend interface states toward the cell average by the multidimensional
    flattening coefficient (reference `FlattenShocks`,
    ``src/hydro/hydro_system.hpp:642-696``; MC02 eqs 78, 70a/b).

    chi_cell = min over active axes e of chi_e at cells {-1, 0, +1} along e.
    """
    chi_cell = None
    for e, chi_e in zip(active_axes, chis):
        # chi_e is a 3D spatial field: shift along spatial axis e
        m = jnp.minimum(jnp.minimum(sh(chi_e, -1, e), chi_e), sh(chi_e, 1, e))
        chi_cell = m if chi_cell is None else jnp.minimum(chi_cell, m)

    chi_m1 = sh(chi_cell, -1, axis)[None]  # chi of cell f-1, broadcast over nvar
    chi_0 = chi_cell[None]
    qL_new = chi_m1 * qL + (1.0 - chi_m1) * sh(prim, -1, axis + 1)
    qR_new = chi_0 * qR + (1.0 - chi_0) * prim
    return qL_new, qR_new
