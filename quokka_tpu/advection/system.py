"""Linear scalar advection system (the reference's pedagogical solver path).

TPU-native rebuild of `LinearAdvectionSystem` + `AdvectionSimulation`
(reference ``src/linear_advection/linear_advection.hpp`` and
``AdvectionSimulation.hpp``): constant-velocity scalar advection with the
shared reconstruction operators (donor-cell/PLM/PPM) and exact upwind
fluxes, advanced with RK2-SSP. Used for convergence testing the
reconstruction machinery in isolation.
"""

from __future__ import annotations

from typing import Callable, Sequence, Tuple

import jax.numpy as jnp

from ..hydro import reconstruct
from ..stencil import interior, sh


def compute_advection_fluxes(
    ug: jnp.ndarray,
    vel: Tuple[float, float, float],
    active_axes: Sequence[int],
    order: int,
):
    """Upwind fluxes F = v * u_face per active axis (padded face coords).
    ug: padded scalar field(s) [ncomp, X, Y, Z]."""
    fluxes = {}
    for d in active_axes:
        qL, qR = reconstruct.reconstruct_faces(ug, d, order)
        v = vel[d]
        u_face = qL if v >= 0.0 else qR  # exact upwinding for constant v
        fluxes[d] = v * u_face
    return fluxes


def advance_advection_rk2(
    u: jnp.ndarray,
    dt,
    vel: Tuple[float, float, float],
    dx: Tuple[float, float, float],
    active_axes: Sequence[int],
    order: int,
    fill_fn: Callable,
    ng: Sequence[int],
):
    """RK2-SSP advance of the scalar field u [ncomp, nx, ny, nz]."""

    def rhs(uu):
        ug = fill_fn(uu)
        fluxes = compute_advection_fluxes(ug, vel, active_axes, order)
        out = None
        for d, F in fluxes.items():
            contrib = (F - sh(F, 1, d + 1)) / dx[d]
            out = contrib if out is None else out + contrib
        return interior(out, ng)

    u1 = u + dt * rhs(u)
    u2 = 0.5 * u + 0.5 * (u1 + dt * rhs(u1))
    return u2
