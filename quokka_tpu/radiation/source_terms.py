"""Gas-radiation matter coupling: per-cell implicit Newton-Raphson solve.

TPU-native rebuild of `RadSystem::AddSourceTermsSingleGroup` (reference
``src/radiation/source_terms_single_group.hpp:10-565``), the Howell &
Greenough 2003 scheme as modified by He, Wibking & Krumholz 2024:

  - Newton-Raphson in the variables (Egas, R) with R = D*tau the
    energy-exchange increment, residuals
      F_G = Egas - Egas0 + (c/chat) R
      F_D = Erad - Erad0 - (R + Src)
    and the 2x2 Jacobian of the reference (kappa_P/kappa_E assumed
    T-independent, which only affects convergence rate);
  - velocity-dependent work term v.F (2 kappa_E - kappa_F) chat/c^2 dt,
    lagged via an outer iteration (max 5) with the reference's convergence
    tests;
  - implicit flux/momentum update with the frozen Eddington tensor;
  - stage-dependent gas_update_factor (IMEX_a32) and dt scaling.

TPU-first formulation: the data-dependent per-cell Newton loops become
whole-array `lax.while_loop`s with per-cell convergence masks -- all cells
iterate until the slowest converges (the reference's GPU warps behave the
same way within a block), and the iteration/failure telemetry of the
reference's GPU counters comes back as reduced scalars.

Supported here: single-group, beta_order in {0, 1}, no dust (the
dust/photoelectric branches live in `radiation/dust.py` when built).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax

from ..indices import EGAS, EINT, MX1, RHO
from .system import IMEX_A32, RadOptions

RESID_TOL = 1.0e-11  # reference source_terms_single_group.hpp:158
MAX_NEWTON_ITER = 100
MAX_OUTER_ITER = 5
LAG_TOL = 1.0e-13


def add_source_terms_single_group(
    U: jnp.ndarray,
    rad_src: jnp.ndarray,
    dt_radiation,
    stage: int,
    opts: RadOptions,
    eos,
    kappa_p,
    kappa_e,
    kappa_f,
    rad_start: int,
    unroll_iters: int | None = None,
):
    """Apply the implicit matter-coupling update in place on the interior
    state U [nvar, nx, ny, nz]. Returns (U_new, stats).

    kappa_p/e/f: callables (rho, T) -> opacity [cm^2/g] (problem hooks,
    reference `ComputePlanckOpacity` etc. specializations).
    rad_src: radiation energy source field (user hook; 0 by default).

    With opts.mixed_precision_coupling and an f32 state, the whole solve
    is promoted to f64 (TPU: double-double emulation; the coupling is
    pointwise, so this costs far less than an all-f64 step) and the
    result cast back -- f32 state, f64 residuals/Jacobian.
    """
    if opts.mixed_precision_coupling and U.dtype == jnp.float32:
        out64, stats = add_source_terms_single_group(
            U.astype(jnp.float64), rad_src.astype(jnp.float64),
            dt_radiation, stage,
            dataclasses.replace(opts, mixed_precision_coupling=False),
            eos, kappa_p, kappa_e, kappa_f, rad_start,
            unroll_iters=unroll_iters,
        )
        return out64.astype(jnp.float32), stats

    c = opts.c
    chat = opts.chat
    cscale = c / chat
    dt = dt_radiation if stage == 1 else (1.0 - IMEX_A32) * dt_radiation
    gas_update_factor = IMEX_A32 if stage == 1 else 1.0

    iE = rad_start
    iFx, iFy, iFz = rad_start + 1, rad_start + 2, rad_start + 3

    rho = U[RHO]
    mom0 = U[MX1:MX1 + 3]
    Egastot0 = U[EGAS]
    Erad0 = U[iE]
    Frad0 = jnp.stack([U[iFx], U[iFy], U[iFz]])

    Src = rad_src * dt * chat

    ke0 = 0.5 * jnp.sum(mom0 * mom0, axis=0) / rho
    Egas0 = Egastot0 - ke0
    Etot0 = Egas0 + cscale * (Erad0 + Src)

    isothermal = eos.is_isothermal

    if not isothermal:
        Egas_guess, Erad_guess, R, work, kappaP, kappaE, kappaF, T_gas, fourPiBoverC, n_iter_max = _newton_energy_exchange(
            Egas0, Erad0, rho, mom0, Frad0, Src, Etot0, dt, opts, eos,
            kappa_p, kappa_e, kappa_f, unroll_iters=unroll_iters,
        )
    else:
        T_gas = jnp.zeros_like(rho)
        kappaF = kappa_f(rho, T_gas)
        Egas_guess, Erad_guess = Egas0, Erad0
        fourPiBoverC = jnp.zeros_like(rho)
        kappaP = kappa_p(rho, T_gas)
        kappaE = kappa_e(rho, T_gas)
        work = jnp.zeros_like(rho)
        n_iter_max = jnp.int32(0)

    # ---- outer (work-term) iteration: flux/momentum update + work lag
    include_work = (not isothermal) and opts.beta_order != 0 and opts.include_work_term

    def flux_update(Egas_g, Erad_g, work_g, kP, kE, kF, fourPiB):
        """Implicit flux update + momentum deposition (reference
        source_terms_single_group.hpp:389-478, beta_order <= 1)."""
        if opts.beta_order != 0 and not isothermal:
            erad = Erad_g
            fx = Frad0[0] / (c * erad)
            fy = Frad0[1] / (c * erad)
            fz = Frad0[2] / (c * erad)
            from .system import eddington_tensor

            Tedd = eddington_tensor(fx, fy, fz)
            F_coeff = chat * rho * kF * dt
            Planck_term = kP * fourPiB + (kF - kE) * erad
            Frad_t1 = []
            for n in range(3):
                p_term = Planck_term * chat * dt * mom0[n]
                pressure_term = jnp.zeros_like(erad)
                for z in range(3):
                    pressure_term = pressure_term + mom0[z] * Tedd[n][z] * erad
                pressure_term = pressure_term * chat * dt * kF
                Frad_t1.append((Frad0[n] + p_term + pressure_term) / (1.0 + F_coeff))
            Frad_t1 = jnp.stack(Frad_t1)
        else:
            denom = 1.0 + rho * kF * chat * dt
            Frad_t1 = Frad0 / denom[None]
        dMom = -(Frad_t1 - Frad0) / (c * chat)
        return Frad_t1, dMom

    if not include_work:
        Frad_t1, dMom = flux_update(Egas_guess, Erad_guess, work, kappaP, kappaE, kappaF, fourPiBoverC)
        n_outer = jnp.int32(1)
    else:
        # outer loop: lag the work term, re-solving the energy exchange
        def outer_cond(carry):
            ite, done, *_ = carry
            return jnp.logical_and(ite < MAX_OUTER_ITER, jnp.min(done) < 0.5)

        def outer_body(carry):
            ite, done_f, Egas_g, Erad_g, R_g, work_g, Frad_g, dMom_g = carry
            done = done_f > 0.5
            # redo Newton with the current work term
            Egas_n, Erad_n, R_n, _w, kP, kE, kF, Tg, fourPiB, _ni = _newton_energy_exchange(
                Egas0, Erad0, rho, mom0, Frad0, Src, Etot0, dt, opts, eos,
                kappa_p, kappa_e, kappa_f, work_init=work_g,
                unroll_iters=unroll_iters,
            )
            Frad_n, dMom_n = flux_update(Egas_n, Erad_n, work_g, kP, kE, kF, fourPiB)

            # work-term correction to internal energy (include_work scheme:
            # work done by radiation goes to kinetic energy, remove from Eint)
            mom1 = mom0 + dMom_n
            ke1 = 0.5 * jnp.sum(mom1 * mom1, axis=0) / rho
            # (reference: Egas stays; step 3 skipped under include_work)

            # updated work term from new flux and velocity
            work_new = (
                jnp.sum(mom1 * Frad_n, axis=0)
                * chat / (c * c) * (2.0 * kE - kF) * dt
            )
            dwork = jnp.abs(work_new - work_g)
            conv = (
                (jnp.abs(work_new) == 0.0)
                | (cscale * dwork < LAG_TOL * Etot0)
                | (dwork <= LAG_TOL * jnp.abs(R_n))
                | (dwork <= 1.0e-8 * jnp.abs(work_new))
            )
            done_new = done | conv
            # frozen cells keep old values
            keep = done[None]
            Egas_g = jnp.where(done, Egas_g, Egas_n)
            Erad_g = jnp.where(done, Erad_g, Erad_n)
            R_g = jnp.where(done, R_g, R_n)
            work_g = jnp.where(done, work_g, work_new)
            Frad_g = jnp.where(keep, Frad_g, Frad_n)
            dMom_g = jnp.where(keep, dMom_g, dMom_n)
            return (ite + 1, done_new.astype(done_f.dtype), Egas_g, Erad_g,
                    R_g, work_g, Frad_g, dMom_g)

        Frad_i, dMom_i = flux_update(Egas_guess, Erad_guess, work, kappaP, kappaE, kappaF, fourPiBoverC)
        mom1_i = mom0 + dMom_i
        work_i = (
            jnp.sum(mom1_i * Frad_i, axis=0) * chat / (c * c) * (2.0 * kappaE - kappaF) * dt
        )
        dwork_i = jnp.abs(work_i - work)
        done_i = (
            (jnp.abs(work_i) == 0.0)
            | (cscale * dwork_i < LAG_TOL * Etot0)
            | (dwork_i <= LAG_TOL * jnp.abs(R))
            | (dwork_i <= 1.0e-8 * jnp.abs(work_i))
        )
        carry = (jnp.int32(1), done_i.astype(work.dtype), Egas_guess,
                 Erad_guess, R, jnp.where(done_i, work, work_i), Frad_i, dMom_i)
        if unroll_iters is not None:
            for _ in range(2):  # work-term lag converges in 1-2 iterations
                carry = outer_body(carry)
            n_outer, _done, Egas_guess, Erad_guess, R, work, Frad_t1, dMom = carry
        else:
            n_outer, _done, Egas_guess, Erad_guess, R, work, Frad_t1, dMom = lax.while_loop(
                outer_cond, outer_body, carry
            )

    # ---- final state update with the stage factor (assembled as a
    # component list so the whole function lowers inside Pallas kernels)
    mom1 = mom0 + dMom * gas_update_factor
    comps = [U[i] for i in range(U.shape[0])]
    comps[MX1] = mom1[0]
    comps[MX1 + 1] = mom1[1]
    comps[MX1 + 2] = mom1[2]
    if not isothermal:
        Egas_final = Egas0 + (Egas_guess - Egas0) * gas_update_factor
        ke1 = 0.5 * jnp.sum(mom1 * mom1, axis=0) / rho
        comps[EINT] = Egas_final
        comps[EGAS] = Egas_final + ke1
        comps[iE] = Erad_guess
    comps[iFx] = Frad_t1[0]
    comps[iFy] = Frad_t1[1]
    comps[iFz] = Frad_t1[2]
    out = jnp.stack(comps)

    stats = {"newton_iters_max": n_iter_max}
    return out, stats


def _newton_energy_exchange(
    Egas0, Erad0, rho, mom0, Frad0, Src, Etot0, dt, opts: RadOptions, eos,
    kappa_p, kappa_e, kappa_f, work_init=None, unroll_iters: int | None = None,
):
    """Whole-array Newton-Raphson for the (Egas, R) system (reference
    source_terms_single_group.hpp:104-360, single group, no dust).

    Returns (Egas, Erad, R, work, kappaP, kappaE, kappaF, T_gas,
    fourPiBoverC, max_iters)."""
    c, chat = opts.c, opts.chat
    cscale = c / chat
    arad = opts.arad

    # --- iteration 0 quantities
    T0 = eos.tgas_from_eint(rho, Egas0)
    fourPiB0 = arad * T0**4
    kP0 = kappa_p(rho, T0)
    kE0 = kappa_e(rho, T0)
    kF0 = kappa_f(rho, T0)
    kPoE0 = jnp.where(kE0 > 0.0, kP0 / kE0, 1.0)

    if work_init is None:
        if opts.beta_order != 0 and opts.include_work_term:
            work = (
                jnp.sum(mom0 * Frad0, axis=0)
                * (2.0 * kE0 - kF0) * chat / (c * c) * dt
            )
        else:
            work = jnp.zeros_like(rho)
    else:
        work = work_init

    tau0 = dt * rho * kP0 * chat
    R = (fourPiB0 - Erad0 / kPoE0) * tau0 + work

    # convergence tolerance scales with the working precision: the reference
    # 1e-11 is unreachable in f32 (or the f32 components of TPU double-double
    # round-off paths) and would spin the loop to maxIter
    resid_tol = max(RESID_TOL, 50.0 * float(jnp.finfo(jnp.asarray(Egas0).dtype).eps))

    def residuals(Egas_g, Erad_g, R_g):
        F_G = Egas_g - Egas0 + cscale * R_g
        F_D = Erad_g - Erad0 - (R_g + Src)
        return F_G, F_D

    # `done` is carried as a 0/1 float mask, not bool: Mosaic's while-loop
    # lowering cannot yield i1 vector carries (scf.yield fails to legalize)
    def cond(carry):
        n, done, *_ = carry
        return jnp.logical_and(n < MAX_NEWTON_ITER, jnp.min(done) < 0.5)

    def body(carry):
        n, done, Egas_g, Erad_g, R_g, T_g, fourPiB, kP, kE, kF, kPoE, tau = carry

        F_G, F_D = residuals(Egas_g, Erad_g, R_g)
        F_D_abs = jnp.where(tau > 0.0, jnp.abs(F_D), jnp.abs(F_D + R_g))
        conv = (jnp.abs(F_G) < resid_tol * Etot0) & (cscale * F_D_abs < resid_tol * Etot0)
        done_new = (done > 0.5) | conv

        c_v = eos.eint_temp_derivative(rho, T_g)
        d_fourpiB_dT = 4.0 * opts.arad * T_g**3
        dEg_dT = kPoE * d_fourpiB_dT

        J00 = jnp.ones_like(rho)
        J01 = jnp.full_like(rho, cscale)
        J10 = dEg_dT / c_v
        J11 = jnp.where(tau > 0.0, -kPoE / jnp.where(tau > 0.0, tau, 1.0) - 1.0, -1.0e100)

        det = J00 * J11 - J01 * J10
        y0 = -F_G
        y1 = -F_D
        dEgas = (J11 * y0 - J01 * y1) / det
        dR = (J00 * y1 - J10 * y0) / det

        # enable_dE_constrain (reference :323-335): if the temperature jump
        # exceeds max(T_gas, T_rad), clamp to the radiation temperature
        T_rad = jnp.sqrt(jnp.sqrt(jnp.maximum(Erad_g, 0.0) / opts.arad))
        constrain = dEgas / c_v > jnp.maximum(T_g, T_rad)
        Egas_new = jnp.where(constrain, eos.eint_from_tgas(rho, T_rad), Egas_g + dEgas)
        R_new = jnp.where(constrain, R_g, R_g + dR)

        # freeze converged cells
        Egas_new = jnp.where(done_new, Egas_g, Egas_new)
        R_new = jnp.where(done_new, R_g, R_new)

        # recompute T-dependent quantities and Erad from R (reference :213-216)
        T_new = eos.tgas_from_eint(rho, Egas_new)
        fourPiB_new = opts.arad * T_new**4
        kP_new = kappa_p(rho, T_new)
        kE_new = kappa_e(rho, T_new)
        kPoE_new = jnp.where(kE_new > 0.0, kP_new / kE_new, 1.0)
        tau_new = dt * rho * kP_new * chat
        Erad_new = jnp.where(
            tau_new > 0.0,
            kPoE_new * (fourPiB_new - (R_new - work) / jnp.where(tau_new > 0.0, tau_new, 1.0)),
            Erad_g,
        )
        Erad_new = jnp.where(done_new, Erad_g, Erad_new)
        T_new = jnp.where(done_new, T_g, T_new)
        fourPiB_new = jnp.where(done_new, fourPiB, fourPiB_new)
        kP_new = jnp.where(done_new, kP, kP_new)
        kE_new = jnp.where(done_new, kE, kE_new)
        kPoE_new = jnp.where(done_new, kPoE, kPoE_new)
        tau_new = jnp.where(done_new, tau, tau_new)

        return (n + 1, done_new.astype(done.dtype), Egas_new, Erad_new, R_new,
                T_new, fourPiB_new, kP_new, kE_new, kF, kPoE_new, tau_new)

    done0 = jnp.zeros_like(rho)
    carry0 = (jnp.int32(0), done0, Egas0, Erad0, R, T0, fourPiB0,
              kP0, kE0, kF0, kPoE0, tau0)
    if unroll_iters is not None:
        # fixed-unroll variant (Pallas kernels: no 64-bit scalar predicate
        # reductions; converged cells are frozen by the masks)
        carry = carry0
        for _ in range(unroll_iters):
            carry = body(carry)
        n_final, done, Egas_g, Erad_g, R_g, T_g, fourPiB, kP, kE, kF, kPoE, tau = carry
    else:
        n_final, done, Egas_g, Erad_g, R_g, T_g, fourPiB, kP, kE, kF, kPoE, tau = lax.while_loop(
            cond, body, carry0
        )

    # kappaF at the final temperature (reference :363-366)
    kF = kappa_f(rho, T_g)
    return Egas_g, Erad_g, R_g, work, kP, kE, kF, T_g, fourPiB, n_final
