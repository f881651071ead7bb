"""Compressible Euler solver kernels (cons<->prim, floors, dual energy).

TPU-native rebuild of `HydroSystem<problem_t>` per-cell kernels (reference
``src/hydro/hydro_system.hpp:47``): every AMReX `ParallelFor` GPU lambda
becomes a fused jnp array expression over the whole (padded) level array.

State layout: ``U[nvar, nx, ny, nz]`` with components rho, mx, my, mz,
E_total, rho*e_aux [, scalars...] (see `quokka_tpu.indices`).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp

from ..eos import IdealGasEOS
from ..indices import EGAS, EINT, MX1, MX2, MX3, PEINT, PPRES, PRHO, PSCALAR0, PVX1, RHO, SCALAR0


def mixture_gamma(eos, arr: jnp.ndarray, scalar0: int):
    """Per-cell effective gamma when `eos` is composition-dependent
    (`MixtureHydroEOS.gamma_of_scalars`) and `arr` carries the species
    partial densities at [scalar0 : scalar0+n_species]; None otherwise
    (the fixed-gamma paths are left structurally untouched -- this is a
    trace-time dispatch, reference ``src/hydro/EOS.hpp:82-112`` routing
    every hydro EOS call through the chem EOS when the network is on)."""
    fn = getattr(eos, "gamma_of_scalars", None)
    if fn is None or arr.shape[0] < scalar0 + eos.n_species:
        return None
    return fn(arr[scalar0:scalar0 + eos.n_species])


def cons_to_prim(U: jnp.ndarray, eos: IdealGasEOS, reconstruct_eint: bool) -> jnp.ndarray:
    """Conserved -> primitive variables (reference `ConservedToPrimitive`,
    ``src/hydro/hydro_system.hpp:138-196``).

    Primitive components: rho, vx, vy, vz, (P or e_spec), (rho*e_aux or
    e_aux_spec), scalars... depending on `reconstruct_eint`.
    """
    rho = U[RHO]
    inv_rho = 1.0 / rho
    vx = U[MX1] * inv_rho
    vy = U[MX2] * inv_rho
    vz = U[MX3] * inv_rho
    ke = 0.5 * rho * (vx * vx + vy * vy + vz * vz)
    Eint_cons = U[EGAS] - ke
    Eint_aux = U[EINT]

    if reconstruct_eint:
        p_slot = Eint_cons * inv_rho  # specific internal energy
        e_slot = Eint_aux * inv_rho  # aux specific internal energy
    else:
        gam = mixture_gamma(eos, U, SCALAR0)
        if gam is not None and not eos.is_isothermal:
            p_slot = (gam - 1.0) * Eint_cons
        else:
            p_slot = eos.pressure(rho, Eint_cons)
        e_slot = Eint_aux

    prim = jnp.stack([rho, vx, vy, vz, p_slot, e_slot])
    if U.shape[0] > SCALAR0:
        prim = jnp.concatenate([prim, U[SCALAR0:]], axis=0)
    return prim


def pressure_from_prim(prim: jnp.ndarray, eos: IdealGasEOS, reconstruct_eint: bool):
    """Gas pressure from the primitive array (slot meaning depends on mode)."""
    rho = prim[PRHO]
    if eos.is_isothermal:
        return rho * eos.cs_isothermal**2
    if reconstruct_eint:
        gam = mixture_gamma(eos, prim, PSCALAR0)
        if gam is not None:
            return (gam - 1.0) * rho * prim[PPRES]
        return eos.pressure(rho, rho * prim[PPRES])
    return prim[PPRES]


def pressure(U: jnp.ndarray, eos: IdealGasEOS) -> jnp.ndarray:
    """Gas pressure from conserved variables (from E - KE)."""
    rho = U[RHO]
    ke = 0.5 * (U[MX1] ** 2 + U[MX2] ** 2 + U[MX3] ** 2) / rho
    if eos.is_isothermal:
        return rho * eos.cs_isothermal**2
    gam = mixture_gamma(eos, U, SCALAR0)
    if gam is not None:
        return (gam - 1.0) * (U[EGAS] - ke)
    return eos.pressure(rho, U[EGAS] - ke)


def max_signal_speed(U: jnp.ndarray, eos: IdealGasEOS) -> jnp.ndarray:
    """|v| + cs per cell (reference `ComputeMaxSignalSpeed`,
    ``src/hydro/hydro_system.hpp:223-253``)."""
    rho = U[RHO]
    vx = U[MX1] / rho
    vy = U[MX2] / rho
    vz = U[MX3] / rho
    vmag = jnp.sqrt(vx * vx + vy * vy + vz * vz)
    P = pressure(U, eos)
    gam = mixture_gamma(eos, U, SCALAR0)
    if gam is not None and not eos.is_isothermal:
        cs = jnp.sqrt(gam * P / rho)
    else:
        cs = eos.sound_speed(rho, P)
    return cs + vmag


def is_state_valid(U: jnp.ndarray, eos: IdealGasEOS) -> jnp.ndarray:
    """Per-cell validity mask (reference `isStateValid`,
    ``src/hydro/hydro_system.hpp:424-454``): positive density (+ positive
    conserved internal energy for non-isothermal EOS, + finite values)."""
    rho = U[RHO]
    ok = rho > 0.0
    if not eos.is_isothermal:
        ke = 0.5 * (U[MX1] ** 2 + U[MX2] ** 2 + U[MX3] ** 2) / jnp.where(ok, rho, 1.0)
        ok = ok & ((U[EGAS] - ke) > 0.0)
    ok = ok & jnp.all(jnp.isfinite(U), axis=0)
    return ok


def enforce_limits(
    U: jnp.ndarray,
    eos: IdealGasEOS,
    density_floor: float,
    temperature_floor: float,
    n_scalars: int = 0,
    speed_ceiling: float | None = None,
) -> jnp.ndarray:
    """Apply density/temperature floors (reference `EnforceLimits`,
    ``src/hydro/hydro_system.hpp:698-775``).

    - density floor: raise rho, rescale passive scalars (energies untouched)
    - temperature floor: applied independently to E_total - KE and to the
      auxiliary internal energy
    """
    rho = U[RHO]
    rho_new = jnp.maximum(rho, density_floor)
    out = U.at[RHO].set(rho_new)
    if n_scalars > 0:
        scale = jnp.where(rho_new > 0.0, rho / rho_new, 0.0)
        # rescale only where the floor actually engaged
        scale = jnp.where(rho < density_floor, scale, 1.0)
        out = out.at[SCALAR0:].multiply(scale[None])

    if not eos.is_isothermal and temperature_floor > 0.0:
        ke = 0.5 * (out[MX1] ** 2 + out[MX2] ** 2 + out[MX3] ** 2) / rho_new
        eint_floor = eos.eint_from_tgas(rho_new, temperature_floor)

        eint_cons = out[EGAS] - ke
        out = out.at[EGAS].set(ke + jnp.maximum(eint_cons, eint_floor))
        out = out.at[EINT].set(jnp.maximum(out[EINT], eint_floor))
    return out


def sync_dual_energy(U: jnp.ndarray, eta: float = 1.0e-3) -> jnp.ndarray:
    """Li et al. dual-energy sync after each RK stage (reference
    `SyncDualEnergy`, ``src/hydro/hydro_system.hpp:816-850``):
    if (E - KE) > eta*E, set Eint_aux = E - KE (conservative branch);
    else set E = Eint_aux + KE (non-conservative sync from aux)."""
    rho = U[RHO]
    ke = 0.5 * (U[MX1] ** 2 + U[MX2] ** 2 + U[MX3] ** 2) / rho
    Etot = U[EGAS]
    Eint_cons = Etot - ke
    use_cons = Eint_cons > eta * Etot
    new_eint = jnp.where(use_cons, Eint_cons, U[EINT])
    new_etot = jnp.where(use_cons, Etot, U[EINT] + ke)
    return U.at[EINT].set(new_eint).at[EGAS].set(new_etot)
