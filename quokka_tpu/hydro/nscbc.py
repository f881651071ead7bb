"""NSCBC: Navier-Stokes characteristic boundary conditions (subsonic outflow).

TPU-native rebuild of the reference's NSCBC subsonic outflow
(``src/hydro/NSCBC_outflow.hpp:36-345``): the boundary-normal primitive
gradient is replaced by the characteristic-consistent dQ/dx (with the
Poinsot-Lele pressure-relaxation term K (P - P_t), K = c (1 - M^2)/(4 L),
and transverse terms scaled by (beta - 1), beta = M), then the four ghost
cells are filled by the reference's polynomial extrapolation that is
consistent with that gradient at the boundary.

Vectorized over the whole boundary plane on the padded array; transverse
derivatives use periodic neighbors (the common channel configuration;
the reference zeroes them at non-periodic transverse edges).
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp

from ..eos import IdealGasEOS
from ..indices import EGAS, EINT, MX1, RHO, SCALAR0
from ..stencil import sh


def _prim_plane(Uplane, eos: IdealGasEOS):
    """Primitive variables (rho, vx, vy, vz, P, Eint_aux, scalars...) of a
    boundary plane [nvar, ...] (reference `ComputePrimVars`)."""
    rho = Uplane[RHO]
    v = [Uplane[MX1 + n] / rho for n in range(3)]
    ke = 0.5 * rho * (v[0] ** 2 + v[1] ** 2 + v[2] ** 2)
    P = eos.pressure(rho, Uplane[EGAS] - ke)
    out = [rho, v[0], v[1], v[2], P, Uplane[EINT]]
    for n in range(Uplane.shape[0] - SCALAR0):
        out.append(Uplane[SCALAR0 + n])
    return jnp.stack(out)


def _cons_plane(Q, eos: IdealGasEOS):
    """Inverse of `_prim_plane` (reference `ComputeConsVars`)."""
    rho, vx, vy, vz, P, eint_aux = Q[0], Q[1], Q[2], Q[3], Q[4], Q[5]
    ke = 0.5 * rho * (vx * vx + vy * vy + vz * vz)
    comps = [rho, rho * vx, rho * vy, rho * vz, eos.eint_from_pres(rho, P) + ke, eint_aux]
    for n in range(Q.shape[0] - 6):
        comps.append(Q[6 + n])
    return jnp.stack(comps)


def set_outflow_boundary(
    Ug: jnp.ndarray,
    axis: int,
    side: int,
    P_t: float,
    grid,
    ng: Sequence[int],
    eos: IdealGasEOS,
) -> jnp.ndarray:
    """Overwrite the ghost slabs of `axis`/`side` in the padded state with
    NSCBC subsonic-outflow values. side: 0 = lower, 1 = upper."""
    g = ng[axis]
    ax = axis + 1
    n_int = Ug.shape[ax] - 2 * g
    L_box = grid.prob_hi[axis] - grid.prob_lo[axis]
    dx = grid.dx[axis]

    def plane(idx):
        from jax import lax

        return lax.index_in_dim(Ug, idx, axis=ax, keepdims=False)

    if side == 1:
        ibr, step = g + n_int - 1, -1
    else:
        ibr, step = g, +1

    Q_i = _prim_plane(plane(ibr), eos)
    Q_im1 = _prim_plane(plane(ibr + step), eos)
    Q_im2 = _prim_plane(plane(ibr + 2 * step), eos)

    # one-sided normal derivative, oriented outward->inward sign convention
    dQ_dn = (Q_im2 - 4.0 * Q_im1 + 3.0 * Q_i) / (2.0 * dx)
    dQ_dn = dQ_dn * (1.0 if side == 1 else -1.0)

    # transverse central derivatives at the boundary plane (periodic wrap)
    taxes = [a for a in range(3) if a != axis and grid.n_cell[a] > 1]

    def transverse_deriv(t):
        # Q_i has shape [nprim, (other two spatial dims)]; spatial axes of
        # the plane correspond to the non-`axis` dims in order
        plane_axes = [a for a in range(3) if a != axis]
        pax = plane_axes.index(t) + 1
        return (sh(Q_i, 1, pax) - sh(Q_i, -1, pax)) / (2.0 * grid.dx[t])

    zeros = jnp.zeros_like(Q_i)
    dQ_dt = {t: transverse_deriv(t) for t in taxes}

    # permute to canonical (u = normal); transverse order (t1, t2)
    perm = [axis] + [a for a in range(3) if a != axis]

    def vel(Q, comp):
        return Q[1 + perm[comp]]

    rho = Q_i[0]
    u = vel(Q_i, 0)
    v = vel(Q_i, 1)
    w = vel(Q_i, 2)
    P = Q_i[4]
    c = eos.sound_speed(rho, P)
    M = jnp.clip(jnp.sqrt(u * u + v * v + w * w) / c, 0.0, 1.0)
    beta = M
    K = 0.25 * c * (1.0 - M * M) / L_box

    t1 = perm[1]
    t2 = perm[2]
    dQ_t1 = dQ_dt.get(t1, zeros)
    dQ_t2 = dQ_dt.get(t2, zeros)

    dP_dy, du_dy, dv_dy = dQ_t1[4], vel(dQ_t1, 0), vel(dQ_t1, 1)
    dP_dz, du_dz, dw_dz = dQ_t2[4], vel(dQ_t2, 0), vel(dQ_t2, 2)
    drho_dx, du_dx, dP_dx = dQ_dn[0], vel(dQ_dn, 0), dQ_dn[4]

    c2 = c * c
    crho = c * rho
    x3 = du_dx * crho
    rc2 = rho * c2

    # characteristic-consistent dQ/dx (reference dQ_dx_outflow,
    # NSCBC_outflow.hpp:64-101; SymPy-derived closed forms)
    if side == 1:  # upper
        x1 = c - u
        x5 = K * (P - P_t) + (beta - 1.0) * (
            dP_dy * v + dP_dz * w - du_dy * v * crho - du_dz * w * crho
            + dv_dy * rc2 + dw_dz * rc2
        )
        x6 = 0.5 / x1
        x7 = dP_dx + x3
        d_rho = x6 * (x1 * (-dP_dx + 2.0 * drho_dx * c2 + x3) - x5) / c2
        d_u = x6 * (x1 * x7 + x5) / crho
        d_P = x6 * (x1 * x7 - x5)
    else:  # lower
        x1 = c + u
        x5 = K * (P - P_t) + (beta - 1.0) * (
            dP_dy * v + dP_dz * w + du_dy * v * crho + du_dz * w * crho
            + dv_dy * rc2 + dw_dz * rc2
        )
        x6 = 0.5 / x1
        x7 = -dP_dx + x3
        d_rho = x6 * (x1 * (-dP_dx + 2.0 * drho_dx * c2 - x3) + x5) / c2
        d_u = x6 * (x1 * x7 + x5) / crho
        d_P = x6 * (-x1 * x7 + x5)

    dQ_dx = dQ_dn
    dQ_dx = dQ_dx.at[0].set(d_rho)
    dQ_dx = dQ_dx.at[1 + axis].set(d_u)
    dQ_dx = dQ_dx.at[4].set(d_P)
    # transverse velocities + Eint_aux + scalars keep the one-sided data
    # gradient (reference dQ_dx[2], dQ_dx[3], dQ_dx[5], scalars)

    # ghost extrapolation (reference NSCBC_outflow.hpp:323-328)
    sgn = 1.0 if side == 1 else -1.0
    dQ = sgn * dQ_dx
    Q_ip1 = Q_im1 + 2.0 * dx * dQ
    Q_ip2 = -2.0 * Q_im1 - 3.0 * Q_i + 6.0 * Q_ip1 - 6.0 * dx * dQ
    Q_ip3 = 3.0 * Q_im1 + 10.0 * Q_i - 18.0 * Q_ip1 + 6.0 * Q_ip2 + 12.0 * dx * dQ
    Q_ip4 = -2.0 * Q_im1 - 13.0 * Q_i + 24.0 * Q_ip1 - 12.0 * Q_ip2 + 4.0 * Q_ip3 - 12.0 * dx * dQ

    ghosts = [Q_ip1, Q_ip2, Q_ip3, Q_ip4][:g]
    out = Ug
    for m, Qg in enumerate(ghosts):
        cons = _cons_plane(Qg, eos)
        idx = ibr - step * (m + 1)
        sl = [slice(None)] * Ug.ndim
        sl[ax] = idx
        out = out.at[tuple(sl)].set(cons)
    return out


def set_inflow_boundary(
    Ug: jnp.ndarray,
    axis: int,
    side: int,
    targets,
    grid,
    ng: Sequence[int],
    eos: IdealGasEOS,
) -> jnp.ndarray:
    """Overwrite the ghost slabs with NSCBC subsonic-inflow values
    (reference `NSCBC::setInflowX1Lower`, ``src/hydro/NSCBC_inflow.hpp``:
    incoming characteristic amplitudes relax the boundary state toward the
    target (T_t, u_t, v_t, w_t, s_t) with relaxation coefficients eta = 2;
    the outgoing acoustic wave passes through).

    `targets` is (T_t, u_t, v_t, w_t, s_t-tuple); the normal velocity
    target u_t is in the INWARD direction (positive = entering the domain
    on either side).
    """
    T_t, u_t, v_t, w_t, s_t = targets
    g = ng[axis]
    ax = axis + 1
    n_int = Ug.shape[ax] - 2 * g
    L_box = grid.prob_hi[axis] - grid.prob_lo[axis]
    dx = grid.dx[axis]

    def plane(idx):
        from jax import lax

        return lax.index_in_dim(Ug, idx, axis=ax, keepdims=False)

    if side == 1:
        ibr, step = g + n_int - 1, -1
    else:
        ibr, step = g, +1

    Q_i = _prim_plane(plane(ibr), eos)
    Q_ip1 = _prim_plane(plane(ibr + step), eos)
    Q_ip2 = _prim_plane(plane(ibr + 2 * step), eos)

    # one-sided inward derivative; for the upper side, work in a mirrored
    # frame where the inward normal is +x (u -> -u)
    dQ_dn = (-3.0 * Q_i + 4.0 * Q_ip1 - Q_ip2) / (2.0 * dx)

    perm = [axis] + [a for a in range(3) if a != axis]

    def vel(Q, comp):
        return Q[1 + perm[comp]]

    mirror = -1.0 if side == 1 else 1.0
    rho = Q_i[0]
    u = mirror * vel(Q_i, 0)
    v = vel(Q_i, 1)
    w = vel(Q_i, 2)
    P = Q_i[4]
    eint_aux = Q_i[5]
    c = eos.sound_speed(rho, P)
    M = jnp.clip(jnp.sqrt(u * u + v * v + w * w) / c, 0.0, 1.0)
    T = eos.tgas_from_eint(rho, eos.eint_from_pres(rho, P))
    eint_aux_t = eos.eint_from_tgas(rho, T_t)

    du_dx = mirror * vel(dQ_dn, 0)
    dP_dx = dQ_dn[4]

    eta = 2.0
    R_gas = eos.boltzmann_constant / eos.mean_molecular_weight
    Lx = L_box
    c2 = c * c
    cpu = c + u
    u_safe = jnp.where(jnp.abs(u) > 1e-30, u, jnp.where(u >= 0, 1e-30, -1e-30))
    m2m1 = M * M - 1.0

    # reference dQ_dx_inflow_x1_lower (SymPy-derived closed forms)
    d_rho = 0.5 * (
        Lx * u * cpu * (-c * du_dx * rho + dP_dx)
        - 2.0 * R_gas * c * eta * rho * cpu * (T - T_t)
        - c2 * eta * rho * u * m2m1 * (u - u_t)
    ) / (Lx * c2 * u_safe * cpu)
    d_u = 0.5 * (
        Lx * cpu * (c * du_dx * rho - dP_dx)
        - c2 * eta * rho * m2m1 * (u - u_t)
    ) / (Lx * c * rho * cpu)
    d_v = c * eta * (v - v_t) / (Lx * u_safe)
    d_w = c * eta * (w - w_t) / (Lx * u_safe)
    d_P = 0.5 * (
        Lx * cpu * (-c * du_dx * rho + dP_dx)
        - c2 * eta * rho * m2m1 * (u - u_t)
    ) / (Lx * cpu)
    d_eaux = c * eta * (eint_aux - eint_aux_t) / (Lx * u_safe)

    # u == 0 degenerate limits (reference :89-99)
    u0 = jnp.abs(u) <= 1e-30
    d_rho0 = 0.5 * (Lx * c * (-c * du_dx * rho + dP_dx)
                    + c2 * eta * rho * u_t * m2m1) / (Lx * c * c2)
    d_u0 = 0.5 * (Lx * c * (c * du_dx * rho - dP_dx)
                  + c2 * eta * rho * u_t * m2m1) / (Lx * c2 * rho)
    d_P0 = 0.5 * (Lx * c * (-c * du_dx * rho + dP_dx)
                  + c2 * eta * rho * u_t * m2m1) / (Lx * c)
    zero = jnp.zeros_like(rho)
    d_rho = jnp.where(u0, d_rho0, d_rho)
    d_u = jnp.where(u0, d_u0, d_u)
    d_v = jnp.where(u0, zero, d_v)
    d_w = jnp.where(u0, zero, d_w)
    d_P = jnp.where(u0, d_P0, d_P)
    d_eaux = jnp.where(u0, zero, d_eaux)

    dQ_dx = dQ_dn
    dQ_dx = dQ_dx.at[0].set(d_rho)
    dQ_dx = dQ_dx.at[1 + perm[0]].set(mirror * d_u)
    dQ_dx = dQ_dx.at[1 + perm[1]].set(d_v)
    dQ_dx = dQ_dx.at[1 + perm[2]].set(d_w)
    dQ_dx = dQ_dx.at[4].set(d_P)
    dQ_dx = dQ_dx.at[5].set(d_eaux)
    for n in range(Q_i.shape[0] - 6):
        s_target = s_t[n] if n < len(s_t) else 0.0
        d_s = c * eta * (Q_i[6 + n] - s_target) / (Lx * u_safe)
        dQ_dx = dQ_dx.at[6 + n].set(jnp.where(u0, zero, d_s))

    # ghost extrapolation consistent with dQ/dx at the face (reference
    # NSCBC_inflow.hpp:130-136); dQ_dx is in the inward (+) frame of the
    # lower side -- flip for the upper side
    dQ = (-1.0 if side == 1 else 1.0) * dQ_dx
    Q_m1 = Q_ip1 - 2.0 * dx * dQ
    Q_m2 = -2.0 * Q_ip1 - 3.0 * Q_i + 6.0 * Q_m1 + 6.0 * dx * dQ
    Q_m3 = 3.0 * Q_ip1 + 10.0 * Q_i - 18.0 * Q_m1 + 6.0 * Q_m2 - 12.0 * dx * dQ
    Q_m4 = (-2.0 * Q_ip1 - 13.0 * Q_i + 24.0 * Q_m1 - 12.0 * Q_m2
            + 4.0 * Q_m3 + 12.0 * dx * dQ)

    ghosts = [Q_m1, Q_m2, Q_m3, Q_m4][:g]
    out = Ug
    for m, Qg in enumerate(ghosts):
        cons = _cons_plane(Qg, eos)
        idx = ibr - step * (m + 1)
        sl = [slice(None)] * Ug.ndim
        sl[ax] = idx
        out = out.at[tuple(sl)].set(cons)
    return out
