"""Multigroup gas-radiation matter coupling.

TPU-native rebuild of `RadSystem::AddSourceTermsMultiGroup` +
`SolveGasRadiationEnergyExchange` + `UpdateFlux` (reference
``src/radiation/source_terms_multi_group.hpp``): the Newton-Raphson solve in
(Egas, R_g) with the group-resolved Jacobian

    J00 = 1,  J0g = c/chat,  Jg0 = (kappaP/kappaE)_g dB_g/dT / c_v,
    Jgg = -(kappaP/kappaE)_g / tau_g - 1

reduced in closed form (the reference's `SolveLinearEqs`):

    dx0 = (sum_g (J0g/Jgg) Fg - F0) / (J00 - sum_g (J0g/Jgg) Jg0)
    dRg = (-Fg - Jg0 dx0) / Jgg

plus the per-group implicit flux/momentum update and the lagged v.F work
term. Opacity model: piecewise-constant per group (the reference's
`OpacityModel::piecewise_constant_opacity`; PPL spectra slot in behind the
same hook). Group emission uses the tabulated Planck fractions.

Whole-array formulation: fields carry a leading group axis [G, nx, ny, nz];
the Newton loop is one `lax.while_loop` with per-cell convergence masks.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from ..indices import EGAS, EINT, MX1, RHO
from .planck import planck_energy_fractions
from .system import IMEX_A32, RadOptions, eddington_tensor

RESID_TOL = 1.0e-11
MAX_NEWTON_ITER = 100
MAX_OUTER_ITER = 5
LAG_TOL = 1.0e-13


def make_opacity_model_fns(opts, problem, boundaries, rho, spatial,
                           boltzmann_constant):
    """(opacity_PE, opacity_F) closures for the configured opacity model
    (reference ComputeModelDependentKappaEAndKappaP /
    ComputeModelDependentKappaFAndDeltaTerms, source_terms_multi_group.hpp).
    Shared by the multigroup and the gas-dust-radiation solvers."""
    G = opts.n_groups
    opacity_model = opts.opacity_model
    ppl = opacity_model in ("ppl_fixed_slope", "ppl_full_spectrum")
    if ppl:
        from .opacity import (
            boundary_ratios,
            diffusion_flux_mean_opacity,
            edge_delta_terms,
            group_mean_opacity,
            rad_quantity_exponents,
        )

        energy_unit = getattr(problem.rad, "energy_unit", 1.0)
        _r = boundary_ratios(boundaries)
        ratios_b = jnp.asarray(_r).reshape((G,) + (1,) * len(spatial))

        def expo_lower(T):
            return problem.define_opacity_exponents_and_lower_values(
                boundaries, rho, T
            )

    # alpha freeze: the full-spectrum model re-estimates the spectral
    # exponents only during the first iterations (reference
    # max_iter_to_update_alpha_E = 5)
    MAX_ALPHA_UPDATE_ITER = 5

    def opacity_PE(T, Erad_g, B_g, alpha_E_prev, alpha_P_prev, n):
        """(kappaP, kappaE, kappaPoverE, alpha_E, alpha_P) at temperature T."""
        if opacity_model == "piecewise_constant":
            kP = problem.compute_group_opacities(boundaries, rho, T)
            return kP, kP, jnp.ones_like(kP), alpha_E_prev, alpha_P_prev
        alpha_k, k_lower = expo_lower(T)
        if opacity_model == "ppl_fixed_slope":
            aq = jnp.full_like(B_g, -1.0)
            kP = group_mean_opacity(alpha_k, k_lower, ratios_b, aq)
            kE = kP
            aE, aP = alpha_E_prev, alpha_P_prev
        else:
            aE = jnp.where(n < MAX_ALPHA_UPDATE_ITER,
                           rad_quantity_exponents(Erad_g, boundaries), alpha_E_prev)
            aP = jnp.where(n < MAX_ALPHA_UPDATE_ITER,
                           rad_quantity_exponents(B_g, boundaries), alpha_P_prev)
            kE = group_mean_opacity(alpha_k, k_lower, ratios_b, aE)
            kP = group_mean_opacity(alpha_k, k_lower, ratios_b, aP)
        kPoE = jnp.where(kE > 0.0, kP / jnp.where(kE > 0.0, kE, 1.0), 1.0)
        return kP, kE, kPoE, aE, aP

    def opacity_F(T, B_g, kP, kE):
        """(kappaF, delta(nu kappa B) at edges, alpha_kappa) at temperature T."""
        if opacity_model == "piecewise_constant":
            return kP, jnp.zeros_like(B_g), jnp.zeros_like(B_g)
        alpha_k, k_lower = expo_lower(T)
        d_nkB, d_nB = edge_delta_terms(
            boundaries, T, alpha_k, k_lower, boltzmann_constant, opts.arad,
            energy_unit,
        )
        kF = diffusion_flux_mean_opacity(kP, kE, B_g, d_nkB, d_nB, alpha_k)
        return kF, d_nkB, alpha_k

    return opacity_PE, opacity_F


def add_source_terms_multi_group(
    U, rad_src, dt_radiation, stage, opts: RadOptions, eos, problem, rad_start,
    boundaries, boltzmann_constant,
):
    """Multigroup analog of `add_source_terms_single_group`. `rad_src` is
    [G, nx, ny, nz]; `boundaries` a (G+1)-tuple of group edges.

    opts.mixed_precision_coupling promotes the solve to f64 around an f32
    state, exactly like the single-group path."""
    if opts.mixed_precision_coupling and U.dtype == jnp.float32:
        import dataclasses

        out64, stats = add_source_terms_multi_group(
            U.astype(jnp.float64), rad_src.astype(jnp.float64),
            dt_radiation, stage,
            dataclasses.replace(opts, mixed_precision_coupling=False),
            eos, problem, rad_start, boundaries, boltzmann_constant,
        )
        return out64.astype(jnp.float32), stats

    G = opts.n_groups
    c, chat = opts.c, opts.chat
    cscale = c / chat
    dt = dt_radiation if stage == 1 else (1.0 - IMEX_A32) * dt_radiation
    gas_update_factor = IMEX_A32 if stage == 1 else 1.0

    spatial = U.shape[1:]
    R_state = U[rad_start:].reshape(G, 4, *spatial)
    Erad0 = R_state[:, 0]  # [G, ...]
    Frad0 = R_state[:, 1:4]  # [G, 3, ...]

    rho = U[RHO]
    mom0 = U[MX1:MX1 + 3]  # [3, ...]
    Egastot0 = U[EGAS]
    ke0 = 0.5 * jnp.sum(mom0 * mom0, axis=0) / rho
    Egas0 = Egastot0 - ke0

    Src = rad_src * dt * chat  # [G, ...]
    Etot0 = Egas0 + cscale * (jnp.sum(Erad0 + Src, axis=0))

    def fourPiB_groups(T):
        fr = planck_energy_fractions(boundaries, T, boltzmann_constant,
                                     getattr(problem.rad, "energy_unit", 1.0))
        B = opts.arad * T**4 * fr
        return jnp.maximum(B, opts.erad_floor / G)

    # ---- opacity model (shared closures)
    ppl = opts.opacity_model in ("ppl_fixed_slope", "ppl_full_spectrum")
    opacity_PE, opacity_F = make_opacity_model_fns(
        opts, problem, boundaries, rho, spatial, boltzmann_constant
    )

    include_work = opts.beta_order != 0 and opts.include_work_term

    # ---- Newton solve in (Egas, R_g)
    resid_tol = max(RESID_TOL, 50.0 * float(jnp.finfo(jnp.asarray(Egas0).dtype).eps))

    def newton(work):
        T0 = eos.tgas_from_eint(rho, Egas0)
        B0 = fourPiB_groups(T0)
        aE0 = jnp.zeros_like(B0)
        aP0 = jnp.zeros_like(B0)
        kP0, kE0, kPoE0, aE0, aP0 = opacity_PE(T0, Erad0, B0, aE0, aP0, jnp.int32(0))
        tau0 = dt * rho[None] * kP0 * chat
        Rvec = (B0 - Erad0 / kPoE0) * tau0 + work

        def cond(carry):
            n, done, *_ = carry
            return jnp.logical_and(n < MAX_NEWTON_ITER, jnp.logical_not(jnp.all(done)))

        def body(carry):
            (n, done, Egas_g, Erad_g, R_g, T_g, B_g, kP, kPoE, tau,
             aE, aP) = carry

            F0 = Egas_g - Egas0 + cscale * jnp.sum(R_g, axis=0)
            Fg = Erad_g - Erad0 - (R_g + Src)
            Fg_abs_sum = jnp.sum(jnp.where(tau > 0.0, jnp.abs(Fg), 0.0), axis=0)
            conv = (jnp.abs(F0) < resid_tol * Etot0) & (cscale * Fg_abs_sum < resid_tol * Etot0)
            done_new = done | conv

            c_v = eos.eint_temp_derivative(rho, T_g)
            dB_dT = 4.0 * opts.arad * T_g**3 * (B_g / jnp.maximum(opts.arad * T_g**4, 1e-300))
            dEg_dT = kPoE * dB_dT

            J0g = jnp.full_like(R_g, cscale)
            Jg0 = dEg_dT / c_v[None]
            Jgg = jnp.where(tau > 0.0, -kPoE / jnp.where(tau > 0.0, tau, 1.0) - 1.0, -1.0e100)

            ratios = J0g / Jgg
            dx0 = (jnp.sum(ratios * Fg, axis=0) - F0) / (
                1.0 - jnp.sum(ratios * Jg0, axis=0)
            )
            dR = (-Fg - Jg0 * dx0[None]) / Jgg

            # dE constraint (reference enable_dE_constrain)
            T_rad = jnp.sqrt(jnp.sqrt(jnp.maximum(jnp.sum(Erad_g, axis=0), 0.0) / opts.arad))
            constrain = dx0 / c_v > jnp.maximum(T_g, T_rad)
            Egas_new = jnp.where(constrain, eos.eint_from_tgas(rho, T_rad), Egas_g + dx0)
            R_new = jnp.where(constrain[None], R_g, R_g + dR)

            Egas_new = jnp.where(done_new, Egas_g, Egas_new)
            R_new = jnp.where(done_new[None], R_g, R_new)

            T_new = eos.tgas_from_eint(rho, Egas_new)
            B_new = fourPiB_groups(T_new)
            kP_new, kE_new, kPoE_new, aE_new, aP_new = opacity_PE(
                T_new, Erad_g, B_new, aE, aP, n + 1
            )
            tau_new = dt * rho[None] * kP_new * chat
            Erad_new = jnp.where(
                tau_new > 0.0,
                kPoE_new * (B_new - (R_new - work) / jnp.where(tau_new > 0.0, tau_new, 1.0)),
                Erad_g,
            )
            Erad_new = jnp.where(done_new[None], Erad_g, Erad_new)
            T_new = jnp.where(done_new, T_g, T_new)
            B_new = jnp.where(done_new[None], B_g, B_new)
            kP_new = jnp.where(done_new[None], kP, kP_new)
            kPoE_new = jnp.where(done_new[None], kPoE, kPoE_new)
            tau_new = jnp.where(done_new[None], tau, tau_new)

            return (n + 1, done_new, Egas_new, Erad_new, R_new, T_new, B_new,
                    kP_new, kPoE_new, tau_new, aE_new, aP_new)

        done0 = jnp.zeros_like(rho, dtype=bool)
        carry0 = (jnp.int32(0), done0, Egas0, Erad0, Rvec, T0, B0, kP0, kPoE0,
                  tau0, aE0, aP0)
        out = lax.while_loop(cond, body, carry0)
        (_n, _done, Egas_g, Erad_g, R_g, T_g, B_g, kP, kPoE, tau,
         aE, aP) = out
        kE = jnp.where(kPoE > 0.0, kP / jnp.where(kPoE > 0.0, kPoE, 1.0), kP)
        kF, d_nkB, alpha_k = opacity_F(T_g, B_g, kP, kE)
        return Egas_g, Erad_g, R_g, T_g, B_g, kP, kE, kF, d_nkB, alpha_k, _n

    def flux_update(Egas_g, Erad_g, T_g, B_g, kP, kE, kF, d_nkB, alpha_k):
        """Per-group implicit flux + momentum update (reference `UpdateFlux`,
        ``source_terms_multi_group.hpp:430-490``). For PPL models the
        emission term subtracts the inter-group transport (1/3) d(nu kappa B)
        and the pressure term carries the (1 + alpha_kappa) factor."""
        if opts.beta_order == 0 or eos.is_isothermal:
            denom = 1.0 + rho[None, None] * kF[:, None] * chat * dt
            Frad_t1 = Frad0 / denom
        else:
            erad = Erad_g  # [G,...]
            f = Frad0 / (c * erad[:, None])
            Frad_list = []
            for g in range(G):
                Tedd = eddington_tensor(f[g, 0], f[g, 1], f[g, 2])
                F_coeff = chat * rho * kF[g] * dt
                emission = kP[g] * B_g[g]
                if ppl:
                    emission = emission - d_nkB[g] / 3.0
                    press_k = (1.0 + alpha_k[g]) * kE[g]
                else:
                    press_k = kE[g]
                comps = []
                for n in range(3):
                    planck_term = emission * chat * dt * mom0[n]
                    pressure_term = jnp.zeros_like(rho)
                    for z in range(3):
                        pressure_term = pressure_term + mom0[z] * Tedd[n][z] * erad[g]
                    pressure_term = pressure_term * chat * dt * press_k
                    comps.append((Frad0[g, n] + planck_term + pressure_term) / (1.0 + F_coeff))
                Frad_list.append(jnp.stack(comps))
            Frad_t1 = jnp.stack(Frad_list)
        dMom = -jnp.sum(Frad_t1 - Frad0, axis=0) / (c * chat)
        return Frad_t1, dMom

    def work_chi(kF, alpha_k):
        """Opacity factor of the v.F work term: kappaF, with the
        (1 + alpha_kappa) PPL spectral correction (reference
        ``source_terms_multi_group.hpp:510-527``)."""
        return (1.0 + alpha_k) * kF if ppl else kF

    if not include_work:
        work = jnp.zeros_like(Erad0)
        Egas_g, Erad_g, R_g, T_g, B_g, kP, kE, kF, d_nkB, alpha_k, n_it = newton(work)
        Frad_t1, dMom = flux_update(Egas_g, Erad_g, T_g, B_g, kP, kE, kF, d_nkB, alpha_k)
    else:
        # initial work from the old state (first outer iteration)
        T_init = eos.tgas_from_eint(rho, Egas0)
        B_init = fourPiB_groups(T_init)
        kP_i, kE_i, _kPoE_i, _aE, _aP = opacity_PE(
            T_init, Erad0, B_init, jnp.zeros_like(B_init),
            jnp.zeros_like(B_init), jnp.int32(0),
        )
        kF0, _d, alpha0 = opacity_F(T_init, B_init, kP_i, kE_i)
        vel_times_F = jnp.sum(mom0[None] * Frad0, axis=1)  # [G,...]
        work = vel_times_F * work_chi(kF0, alpha0) * chat / (c * c) * dt

        def outer_cond(carry):
            ite, done, *_ = carry
            return jnp.logical_and(ite < MAX_OUTER_ITER, jnp.logical_not(jnp.all(done)))

        def outer_step(work_g):
            Egas_g, Erad_g, R_g, T_g, B_g, kP, kE, kF, d_nkB, alpha_k, _n = newton(work_g)
            Frad_n, dMom_n = flux_update(Egas_g, Erad_g, T_g, B_g, kP, kE, kF, d_nkB, alpha_k)
            mom1 = mom0 + dMom_n
            work_new = jnp.sum(mom1[None] * Frad_n, axis=1) * work_chi(kF, alpha_k) * chat / (c * c) * dt
            return Egas_g, Erad_g, R_g, Frad_n, dMom_n, work_new

        def outer_body(carry):
            ite, done, Egas_g, Erad_g, R_g, Frad_g, dMom_g, work_g = carry
            Egas_n, Erad_n, R_n, Frad_n, dMom_n, work_new = outer_step(work_g)
            dwork = jnp.sum(jnp.abs(work_new - work_g), axis=0)
            conv = (
                (jnp.sum(jnp.abs(work_new), axis=0) == 0.0)
                | (cscale * dwork < LAG_TOL * Etot0)
                | (dwork <= 1.0e-8 * jnp.sum(jnp.abs(work_new), axis=0))
            )
            done_new = done | conv
            keepG = done[None]
            return (
                ite + 1,
                done_new,
                jnp.where(done, Egas_g, Egas_n),
                jnp.where(keepG, Erad_g, Erad_n),
                jnp.where(keepG, R_g, R_n),
                jnp.where(done[None, None], Frad_g, Frad_n),
                jnp.where(done[None], dMom_g, dMom_n),
                jnp.where(keepG, work_g, work_new),
            )

        Egas_g, Erad_g, R_g, Frad_t1, dMom, work_1 = outer_step(work)
        dwork = jnp.sum(jnp.abs(work_1 - work), axis=0)
        done_i = (cscale * dwork < LAG_TOL * Etot0) | (
            dwork <= 1.0e-8 * jnp.maximum(jnp.sum(jnp.abs(work_1), axis=0), 1e-300)
        )
        carry = (jnp.int32(1), done_i, Egas_g, Erad_g, R_g, Frad_t1, dMom,
                 jnp.where(done_i[None], work, work_1))
        (_ite, _done, Egas_g, Erad_g, R_g, Frad_t1, dMom, work) = lax.while_loop(
            outer_cond, outer_body, carry
        )

    # ---- final state update with the stage factor
    mom1 = mom0 + dMom * gas_update_factor
    out = U
    for n in range(3):
        out = out.at[MX1 + n].set(mom1[n])
    if not eos.is_isothermal:
        Egas_final = Egas0 + (Egas_g - Egas0) * gas_update_factor
        ke1 = 0.5 * jnp.sum(mom1 * mom1, axis=0) / rho
        out = out.at[EINT].set(Egas_final)
        out = out.at[EGAS].set(Egas_final + ke1)

    R_new = R_state
    R_new = R_new.at[:, 0].set(Erad_g if not eos.is_isothermal else R_state[:, 0])
    R_new = R_new.at[:, 1:4].set(Frad_t1)
    out = out.at[rad_start:].set(R_new.reshape(G * 4, *spatial))
    return out, {"newton_iters_max": jnp.int32(0)}
