"""Gas-dust-radiation thermal coupling with optional photoelectric heating.

TPU-native rebuild of the reference's dust-coupled matter-radiation solvers
(``src/radiation/radiation_dust_system.hpp``): radiation couples to the
DUST temperature T_d (emission B(T_d)), and dust couples to the gas through
the collisional rate Lambda_gd = coeff n_H^2 sqrt(T_gas)(T_gas - T_d)
(Bate & Keto 2015). The solve also carries per-group net line cooling,
cosmic-ray heating, and (optionally) photoelectric heating by the last
("FUV") photon group.

Two regimes, selected per cell by the coupling-strength threshold
(reference `SolveGasDustRadiationEnergyExchange:260-292`):

  - coupled (dust_model = 1): Newton unknowns (Egas, R_g); T_d follows
    from the instantaneous dust balance T_d = T_gas - sum(R)/(N sqrt(T)).
  - decoupled (dust_model = 2): gas-dust exchange is frozen at
    lambda_gd dt; Newton unknowns are (T_d, R_g), and the gas energy is
    updated afterwards by a scalar backward-Euler solve with the cooling
    terms.

Whole-array formulation: one Newton loop with per-cell masks selecting the
regime; the bordered linear solves are closed-form (the reference's
`SolveLinearEqs` / `SolveLinearEqsWithLastColumn`).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from ..indices import EGAS, EINT, MX1, RHO
from .planck import planck_energy_fractions
from .system import IMEX_A32, RadOptions, eddington_tensor
from .multigroup import make_opacity_model_fns

RESID_TOL = 1.0e-11
MAX_NEWTON_ITER = 100
MAX_OUTER_ITER = 5
LAG_TOL = 1.0e-13
BIG = 1.0e100

# eager-mode diagnostics sink (set to a dict by debug scripts; never used
# under jit in production)
DEBUG_STASH = None


def _stash(**kwargs):
    """Record eager-mode diagnostics; no-op under tracing."""
    import jax

    if DEBUG_STASH is None:
        return
    if any(isinstance(v, jax.core.Tracer) for v in kwargs.values()):
        return
    DEBUG_STASH.update(kwargs)


def _dust_temperature(T_gas, rho, Erad0, coeff_n, dt, opts, fourPiB_fn,
                      opacity_PE):
    """Initial dust temperature from the Bate & Keto balance
    0 = chat dt rho sum(kE E - kP B(T_d)) + N sqrt(T_gas)(T_gas - T_d)
    (reference `ComputeDustTemperatureBateKeto`,
    ``radiation_system.hpp:1421-1487``).

    The residual is monotone decreasing in T_d with F(0) > 0, so the root
    is bracketed and solved by whole-array bisection -- robust across the
    extreme stiffness range (tau per step can exceed 1e7 in the reference's
    dusty Marshak test, where the equilibrium T_d is ~1e-5 T_gas)."""
    chat = opts.chat

    def resid(T_d):
        B = fourPiB_fn(T_d)
        zeros = jnp.zeros_like(B)
        kP, kE, _kPoE, _aE, _aP = opacity_PE(T_d, Erad0, B, zeros, zeros,
                                             jnp.int32(0))
        return (chat * dt * rho * jnp.sum(kE * Erad0 - kP * B, axis=0)
                + coeff_n * jnp.sqrt(T_gas) * (T_gas - T_d))

    # upper bracket: grow from max(T_gas, T_rad-equilibrium) until F < 0
    T_rad_eq = (jnp.sum(Erad0, axis=0) / opts.arad) ** 0.25
    hi0 = 2.0 * jnp.maximum(T_gas, T_rad_eq)

    def grow_cond(carry):
        n, hi = carry
        return jnp.logical_and(n < 10, jnp.any(resid(hi) > 0.0))

    def grow_body(carry):
        n, hi = carry
        return n + 1, jnp.where(resid(hi) > 0.0, 2.0 * hi, hi)

    _n, hi = lax.while_loop(grow_cond, grow_body, (jnp.int32(0), hi0))
    lo = jnp.zeros_like(T_gas)

    def bis_body(i, carry):
        lo, hi = carry
        mid = 0.5 * (lo + hi)
        pos = resid(mid) > 0.0
        return jnp.where(pos, mid, lo), jnp.where(pos, hi, mid)

    lo, hi = lax.fori_loop(0, 60, bis_body, (lo, hi))
    return 0.5 * (lo + hi)


def add_source_terms_gas_dust(
    U, rad_src, dt_radiation, stage, opts: RadOptions, eos, problem,
    rad_start, boundaries, boltzmann_constant,
):
    """Dust-coupled analog of `add_source_terms_multi_group`; handles any
    number of groups (G = 1 included). Requires
    `problem.ism.enable_dust_gas_thermal_coupling_model`."""
    G = opts.n_groups
    ism = problem.ism
    c, chat = opts.c, opts.chat
    cscale = c / chat
    dt = dt_radiation if stage == 1 else (1.0 - IMEX_A32) * dt_radiation
    gas_update_factor = IMEX_A32 if stage == 1 else 1.0
    with_pe = bool(ism.enable_photoelectric_heating)

    spatial = U.shape[1:]
    R_state = U[rad_start:].reshape(G, 4, *spatial)
    Erad0 = R_state[:, 0]
    Frad0 = R_state[:, 1:4]

    rho = U[RHO]
    mom0 = U[MX1:MX1 + 3]
    Egastot0 = U[EGAS]
    ke0 = 0.5 * jnp.sum(mom0 * mom0, axis=0) / rho
    Egas0 = Egastot0 - ke0

    Src = rad_src * dt * chat
    n_H = rho / ism.mean_molecular_mass
    coeff_n = dt * ism.dust_gas_coeff * n_H * n_H / cscale

    def fourPiB_groups(T):
        # problem override (modified blackbody; reference RadDustMG
        # specializes ComputeThermalRadiationMultiGroup to B = a_rad T fr)
        B_hook = problem.compute_thermal_radiation_multigroup(T, boundaries)
        if B_hook is not None:
            return jnp.maximum(B_hook, opts.erad_floor / G)
        if G == 1:
            return (opts.arad * T**4)[None]
        fr = planck_energy_fractions(boundaries, T, boltzmann_constant,
                                     getattr(problem.rad, "energy_unit", 1.0))
        B = opts.arad * T**4 * fr
        return jnp.maximum(B, opts.erad_floor / G)

    def dB_dT_groups(T, B_g):
        dB_hook = problem.compute_thermal_radiation_temp_derivative_multigroup(
            T, boundaries)
        if dB_hook is not None:
            return dB_hook
        # default 4 a T^3 scaled by the group fractions (B/(a T^4))
        return 4.0 * opts.arad * T**3 * (
            B_g / jnp.maximum(opts.arad * T**4, 1e-300))

    ppl = opts.opacity_model in ("ppl_fixed_slope", "ppl_full_spectrum")
    opacity_PE, opacity_F = make_opacity_model_fns(
        opts, problem, boundaries, rho, spatial, boltzmann_constant
    )

    resid_tol = max(RESID_TOL, 50.0 * float(jnp.finfo(jnp.asarray(Egas0).dtype).eps))

    # ---- regime selection (reference :260-292)
    T_gas0 = eos.tgas_from_eint(rho, Egas0)
    T_d0 = _dust_temperature(T_gas0, rho, Erad0, coeff_n, dt, opts,
                             fourPiB_groups, opacity_PE)
    max_gamma_gd = coeff_n * jnp.maximum(jnp.sqrt(T_gas0) * T_gas0,
                                         jnp.sqrt(T_d0) * T_d0)
    coupled = cscale * max_gamma_gd >= ism.gas_dust_coupling_threshold * Egas0
    lambda_gd_dt = coeff_n * jnp.sqrt(T_gas0) * (T_gas0 - T_d0)

    Etot0_coupled = Egas0 + cscale * jnp.sum(Erad0 + Src, axis=0)
    Etot0_dec = (jnp.abs(lambda_gd_dt) + jnp.sum(fourPiB_groups(T_d0), axis=0)
                 + jnp.sum(Erad0 + Src, axis=0))
    Etot0 = jnp.where(coupled, Etot0_coupled, Etot0_dec)

    cool0 = problem.define_net_cooling_rate(T_gas0, n_H) * dt
    cr_heat = problem.define_cosmic_ray_heating_rate(n_H) * dt

    def pe_deriv(T_gas):
        if not with_pe:
            return jnp.zeros_like(T_gas)
        return problem.define_photoelectric_heating_E1_derivative(T_gas, n_H) * dt

    def newton(work):
        B0 = fourPiB_groups(T_d0)
        zeros = jnp.zeros_like(B0)
        kP0, kE0, kPoE0, aE0, aP0 = opacity_PE(T_d0, Erad0, B0, zeros, zeros,
                                               jnp.int32(0))
        tau0 = dt * rho[None] * kP0 * chat
        Rvec = (B0 - Erad0 / kPoE0) * tau0 + work

        def cond(carry):
            n, done, *_ = carry
            return jnp.logical_and(n < MAX_NEWTON_ITER, jnp.logical_not(jnp.all(done)))

        def body(carry):
            (n, done, Egas_g, Erad_g, R_g, T_d, aE, aP) = carry

            T_gas = eos.tgas_from_eint(rho, Egas_g)
            # coupled cells: T_d from the instantaneous dust balance
            # T_d = T_gas - sum(R)/(N sqrt(T_gas)); this constraint closes
            # the dust energy budget (sum R = lambda_gd identically), so it
            # must be kept exactly -- robustness is handled by damping the
            # Newton step below instead
            T_d_c = T_gas - jnp.sum(R_g, axis=0) / (coeff_n * jnp.sqrt(T_gas))
            T_d = jnp.where(coupled & (n > 0), jnp.maximum(T_d_c, 0.0), T_d)

            B_g = fourPiB_groups(T_d)
            kP, kE, kPoE, aE, aP = opacity_PE(T_d, Erad_g, B_g, aE, aP, n)
            tau = dt * rho[None] * kP * chat
            Erad_new = jnp.where(
                tau > 0.0,
                kPoE * (B_g - (R_g - work) / jnp.where(tau > 0.0, tau, 1.0)),
                Erad_g,
            )
            Erad_g = jnp.where(n > 0, Erad_new, Erad_g)

            dB_dT = dB_dT_groups(T_d, B_g)
            c_v = eos.eint_temp_derivative(rho, T_gas)
            cool = problem.define_net_cooling_rate(T_gas, n_H) * dt
            cool_dT = problem.define_net_cooling_rate_temp_derivative(T_gas, n_H) * dt
            pe_d = pe_deriv(T_gas)

            # ---- residuals
            F0_c = (Egas_g - Egas0 + cscale * jnp.sum(R_g, axis=0)
                    + jnp.sum(cool, axis=0) - cr_heat)
            if with_pe:
                F0_c = F0_c - pe_d * Erad_g[G - 1]
            F0_d = jnp.sum(R_g, axis=0) - lambda_gd_dt
            F0 = jnp.where(coupled, F0_c, F0_d)
            Fg = Erad_g - Erad0 - (R_g + Src)
            Fg_abs = jnp.sum(jnp.where(tau > 0.0, jnp.abs(Fg),
                                       jnp.abs(Fg + R_g)), axis=0)
            conv = (jnp.abs(F0) < resid_tol * Etot0) & (
                cscale * Fg_abs < resid_tol * Etot0)
            done_new = done | conv

            # ---- Jacobian (reference ComputeJacobianForGasAndDust[WithPE] /
            # ...Decoupled, radiation_dust_system.hpp:23-197)
            dEg_dT = kPoE * dB_dT
            d_Eg_d_Rg = jnp.where(tau > 0.0,
                                  -kPoE / jnp.where(tau > 0.0, tau, 1.0), -BIG)
            Jgg = d_Eg_d_Rg - 1.0

            J00_c = 1.0 + jnp.sum(cool_dT, axis=0) / c_v
            d_Td_dT = 1.5 - T_d / (2.0 * T_gas)
            dTd_dRg = -1.0 / (coeff_n * jnp.sqrt(T_gas))
            rg = kPoE * dB_dT * dTd_dRg[None]
            Jg0_c = (dEg_dT * d_Td_dT[None] / c_v[None]
                     - cool_dT / cscale - rg * J00_c[None] / cscale)
            # row reduction of the T_d(R) dependence (coupled cells)
            Fg = jnp.where(coupled[None], Fg - rg * F0[None] / cscale, Fg)

            J00 = jnp.where(coupled, J00_c, 0.0)
            J0g = jnp.where(coupled[None], jnp.full_like(R_g, cscale),
                            jnp.ones_like(R_g))
            Jg0 = jnp.where(coupled[None], Jg0_c, dEg_dT)

            if with_pe:
                # PE couples F0 to Erad[G-1] = f(R_{G-1}): adjust the last
                # column / diagonal and solve the bordered system with the
                # extra column (reference SolveLinearEqsWithLastColumn)
                J0g = J0g.at[G - 1].add(
                    jnp.where(coupled, -pe_d * d_Eg_d_Rg[G - 1], 0.0))
                Jgg_pe = Jgg.at[G - 1].add(jnp.where(
                    coupled,
                    rg[G - 1] - (rg[G - 1] / cscale) * pe_d * d_Eg_d_Rg[G - 1],
                    0.0))
                Jg1 = jnp.where(coupled[None],
                                rg - rg * J0g[G - 1][None] / cscale,
                                jnp.zeros_like(rg))
                ratios = J0g / Jgg_pe
                a00 = J00 - jnp.sum(ratios * Jg0, axis=0)
                y0 = F0 - jnp.sum(ratios * Fg, axis=0)
                a01 = (J0g[G - 1] - jnp.sum(ratios * Jg1, axis=0)
                       + ratios[G - 1] * Jg1[G - 1]
                       - ratios[G - 1] * Jgg_pe[G - 1])
                a10 = Jg0[G - 1]
                a11 = Jgg_pe[G - 1]
                y1 = Fg[G - 1]
                x0 = (y0 - a01 / a11 * y1) / (a00 - a01 / a11 * a10)
                x1 = (y1 - a10 * x0) / a11
                dx0 = -x0
                dR_last = -x1
                dR = (Fg - Jg0 * x0[None] - Jg1 * x1[None]) / Jgg_pe
                dR = -dR
                dR = dR.at[G - 1].set(dR_last)
            else:
                ratios = J0g / Jgg
                dx0 = (jnp.sum(ratios * Fg, axis=0) - F0) / (
                    J00 - jnp.sum(ratios * Jg0, axis=0))
                dR = (-Fg - Jg0 * dx0[None]) / Jgg

            # damped Newton: the T_d(R) constraint makes the system
            # violently nonlinear (dT_d/dR = -1/(N sqrt(T)) can be ~1e5);
            # scale the step so the implied dust-temperature move per
            # iteration stays within the physical scale, which keeps a
            # strongly FUV-heated cell from flinging T_d (and a T_d^4)
            # into overflow while preserving the Newton fixed point
            T_rad = jnp.sqrt(jnp.sqrt(
                jnp.maximum(jnp.sum(Erad_g, axis=0), 0.0) / opts.arad))
            dTd_step = jnp.abs(jnp.sum(dR, axis=0)) / (
                coeff_n * jnp.sqrt(T_gas))
            Td_limit = jnp.maximum(jnp.maximum(T_gas, T_d), T_rad)
            damp = jnp.minimum(
                1.0, Td_limit / jnp.maximum(dTd_step, 1e-300))
            damp = jnp.where(coupled, damp, 1.0)
            dx0 = dx0 * damp
            dR = dR * damp[None]
            constrain = coupled & (dx0 / c_v > jnp.maximum(T_gas, T_rad))
            Egas_new = jnp.where(
                coupled,
                jnp.where(constrain, eos.eint_from_tgas(rho, T_rad),
                          Egas_g + dx0),
                Egas_g,
            )
            T_d_new = jnp.where(coupled, T_d, T_d + dx0)
            R_new = jnp.where(constrain[None], R_g, R_g + dR)

            Egas_new = jnp.where(done_new, Egas_g, Egas_new)
            T_d_new = jnp.where(done_new, T_d, T_d_new)
            R_new = jnp.where(done_new[None], R_g, R_new)
            Erad_g = jnp.where(done_new[None], Erad_g, Erad_g)

            return (n + 1, done_new, Egas_new, Erad_g, R_new, T_d_new, aE, aP)

        done0 = jnp.zeros_like(rho, dtype=bool)
        carry0 = (jnp.int32(0), done0, Egas0, Erad0, Rvec, T_d0,
                  jnp.zeros_like(B0), jnp.zeros_like(B0))
        out = lax.while_loop(cond, body, carry0)
        _n, _done, Egas_g, Erad_g, R_g, T_d, aE, aP = out

        # ---- globalized fallback: bisection on T_d for coupled cells the
        # damped Newton failed to converge (the reference's per-cell loop
        # converges these; the whole-array Newton can stall or overflow in
        # the tau >> 1 instant-equilibrium front cell of RadMarshakDust
        # with kappa_IR = 1e10).  The reduced system is solved exactly for
        # a trial dust temperature -- per-group radiation equilibrium
        # (F_g = 0 closed form), implicit gas energy (fixed point over
        # cooling/PE), with the dust energy balance
        #     sum_g R_g = Lambda_gd = N sqrt(T_gas) (T_gas - T_d)
        # as the master residual, which brackets in T_d on
        # [0, 2^k max(T_gas, T_rad)] and is solved to machine precision by
        # fixed-count bisection (guaranteed convergence, jit-stable).
        bad = jnp.logical_not(_done)
        bad = bad | jnp.logical_not(jnp.isfinite(Egas_g))
        bad = bad | jnp.logical_not(jnp.all(jnp.isfinite(Erad_g), axis=0))
        bad = bad | jnp.logical_not(jnp.isfinite(T_d))
        need_fb = bad

        if DEBUG_STASH is not None:
            _stash(
                n_iters=_n, done=_done, coupled=coupled, need_fb=need_fb,
                Egas_newton=Egas_g, Erad_newton=Erad_g, R_newton=R_g,
                T_d_newton=T_d, T_d0=T_d0, lambda_gd_dt=lambda_gd_dt,
                coeff_n=coeff_n, Etot0=Etot0, Egas0=Egas0, Erad0=Erad0,
            )

        def fb_eval(T_d_try):
            B_g = fourPiB_groups(T_d_try)
            z_ = jnp.zeros_like(B_g)
            kP, kE, kPoE, _a, _b = opacity_PE(T_d_try, Erad0, B_g, z_, z_,
                                              jnp.int32(0))
            tau = dt * rho[None] * kP * chat
            Erad_eq = (Erad0 + Src + work + tau * B_g) / (1.0 + tau / kPoE)
            Erad_eq = jnp.maximum(Erad_eq, 0.0)
            R_eq = Erad_eq - Erad0 - Src
            sumR = jnp.sum(R_eq, axis=0)

            def gas_fp(_i, E):
                T = eos.tgas_from_eint(rho, jnp.maximum(E, 1e-300))
                cool = problem.define_net_cooling_rate(T, n_H) * dt
                pe = (pe_deriv(T) * Erad_eq[G - 1]) if with_pe else 0.0
                return jnp.maximum(
                    Egas0 - cscale * sumR - jnp.sum(cool, axis=0)
                    + cr_heat + pe, 1e-300)

            Egas_t = lax.fori_loop(0, 8, gas_fp,
                                   jnp.maximum(Egas0 - cscale * sumR, 1e-300))
            T_gas_t = eos.tgas_from_eint(rho, Egas_t)
            # dust balance: coupled cells close with the implicit gas
            # temperature; decoupled cells use the frozen lambda_gd
            # (reference dust_model = 2, radiation_dust_system.hpp:381-397)
            lam = jnp.where(
                coupled,
                coeff_n * jnp.sqrt(jnp.maximum(T_gas_t, 1e-300))
                * (T_gas_t - T_d_try),
                lambda_gd_dt,
            )
            resid = sumR - lam
            Egas_t = jnp.where(coupled, Egas_t, Egas0)
            return resid, Egas_t, Erad_eq, R_eq

        if True:  # fallback is cheap relative to the Newton; always compiled
            T_rad0 = (jnp.maximum(jnp.sum(Erad0 + Src, axis=0), 0.0)
                      / opts.arad) ** 0.25
            hi0 = 2.0 * jnp.maximum(T_gas0, T_rad0) + 1e-30

            def grow_body(_i, hi):
                r, *_ = fb_eval(hi)
                return jnp.where(r < 0.0, 2.0 * hi, hi)

            hi = lax.fori_loop(0, 20, grow_body, hi0)
            lo = jnp.zeros_like(hi)

            def bis_body(_i, carry):
                lo, hi = carry
                mid = 0.5 * (lo + hi)
                r, *_ = fb_eval(mid)
                lo_new = jnp.where(r < 0.0, mid, lo)
                hi_new = jnp.where(r < 0.0, hi, mid)
                return lo_new, hi_new

            lo, hi = lax.fori_loop(0, 80, bis_body, (lo, hi))
            T_d_fb = 0.5 * (lo + hi)
            _r, Egas_fb, Erad_fb, R_fb = fb_eval(T_d_fb)

            Egas_g = jnp.where(need_fb, Egas_fb, Egas_g)
            Erad_g = jnp.where(need_fb[None], Erad_fb, Erad_g)
            R_g = jnp.where(need_fb[None], R_fb, R_g)
            T_d = jnp.where(need_fb, T_d_fb, T_d)

            if DEBUG_STASH is not None:
                _stash(T_d_fb=T_d_fb, Egas_fb=Egas_fb, R_fb=R_fb, fb_resid=_r)

        # ---- decoupled cells: scalar backward-Euler gas update with the
        # frozen gas-dust exchange + cooling (reference :515-545)
        T_gas_f = eos.tgas_from_eint(rho, Egas_g)
        cool_f = problem.define_net_cooling_rate(T_gas_f, n_H) * dt

        # PE heating also applies to decoupled cells (reference
        # SolveGasDustRadiationEnergyExchangeWithPE's dust_model == 2 gas
        # update, radiation_dust_system.hpp:874-885, draws
        # PE_deriv * Erad[G-1] from the converged FUV group)
        pe_heat_dec = (pe_deriv(T_gas_f) * Erad_g[G - 1]) if with_pe else 0.0

        def egas_body(carry):
            n, done, E = carry
            T = eos.tgas_from_eint(rho, E)
            cool = problem.define_net_cooling_rate(T, n_H) * dt
            cool_dT = problem.define_net_cooling_rate_temp_derivative(T, n_H) * dt
            F = (E - Egas0 + cscale * lambda_gd_dt
                 + jnp.sum(cool, axis=0) - cr_heat - pe_heat_dec)
            J = 1.0 + jnp.sum(cool_dT, axis=0)
            compare = (jnp.abs(E) + cscale * jnp.abs(lambda_gd_dt)
                       + jnp.sum(jnp.abs(cool), axis=0) + jnp.abs(cr_heat)
                       + jnp.abs(pe_heat_dec))
            conv = jnp.abs(F) < 1e-10 * jnp.maximum(compare, 1e-300)
            E_new = jnp.where(done | conv, E, E - F / J)
            return n + 1, done | conv, E_new

        def egas_cond(carry):
            n, done, _ = carry
            return jnp.logical_and(n < 50, jnp.logical_not(jnp.all(done)))

        _n2, _d2, Egas_dec = lax.while_loop(
            egas_cond, egas_body,
            (jnp.int32(0), jnp.zeros_like(rho, bool), Egas0))
        Egas_g = jnp.where(coupled, Egas_g, Egas_dec)

        # line cooling energy goes to the radiation field (reference
        # add_line_cooling_to_radiation, :546-551)
        T_gas_f = eos.tgas_from_eint(rho, Egas_g)
        cool_f = problem.define_net_cooling_rate(T_gas_f, n_H) * dt
        Erad_g = Erad_g + cool_f / cscale

        # conserving radiation floor (reference force_rad_floor_in_iteration,
        # radiation_dust_system.hpp:418-426): tiny negative Erad from the
        # converged kPoE (B - R/tau) expression would poison the next
        # transport stage's E-division
        floor = opts.erad_floor / G
        deficit = jnp.maximum(floor - Erad_g, 0.0)
        Erad_g = Erad_g + deficit
        Egas_g = Egas_g - cscale * jnp.sum(deficit, axis=0)

        B_f = fourPiB_groups(T_d)
        zeros = jnp.zeros_like(B_f)
        kP, kE, kPoE, _aE, _aP = opacity_PE(T_d, Erad_g, B_f, aE, aP,
                                            jnp.int32(MAX_NEWTON_ITER))
        kF, d_nkB, alpha_k = opacity_F(T_d, B_f, kP, kE)
        return Egas_g, Erad_g, R_g, T_d, B_f, kP, kE, kF, d_nkB, alpha_k

    # ---- flux/momentum update (same structure as the multigroup solver,
    # with emission at the dust temperature)
    def flux_update(Erad_g, B_g, kP, kE, kF, d_nkB, alpha_k):
        if opts.beta_order == 0 or eos.is_isothermal:
            denom = 1.0 + rho[None, None] * kF[:, None] * chat * dt
            Frad_t1 = Frad0 / denom
        else:
            f = Frad0 / (c * Erad_g[:, None])
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
                        pressure_term = pressure_term + mom0[z] * Tedd[n][z] * Erad_g[g]
                    pressure_term = pressure_term * chat * dt * press_k
                    comps.append((Frad0[g, n] + planck_term + pressure_term)
                                 / (1.0 + F_coeff))
                Frad_list.append(jnp.stack(comps))
            Frad_t1 = jnp.stack(Frad_list)
        dMom = -jnp.sum(Frad_t1 - Frad0, axis=0) / (c * chat)
        return Frad_t1, dMom

    def work_chi(kF, alpha_k):
        return (1.0 + alpha_k) * kF if ppl else kF

    include_work = opts.beta_order != 0 and opts.include_work_term

    if not include_work:
        work = jnp.zeros_like(Erad0)
        Egas_g, Erad_g, R_g, T_d, B_g, kP, kE, kF, d_nkB, alpha_k = newton(work)
        Frad_t1, dMom = flux_update(Erad_g, B_g, kP, kE, kF, d_nkB, alpha_k)
    else:
        B_i = fourPiB_groups(T_d0)
        zeros = jnp.zeros_like(B_i)
        kP_i, kE_i, _k, _a, _b = opacity_PE(T_d0, Erad0, B_i, zeros, zeros,
                                            jnp.int32(0))
        kF0, _d, alpha0 = opacity_F(T_d0, B_i, kP_i, kE_i)
        vel_times_F = jnp.sum(mom0[None] * Frad0, axis=1)
        work = vel_times_F * work_chi(kF0, alpha0) * chat / (c * c) * dt

        def outer_step(work_g):
            Egas_g, Erad_g, R_g, T_d, B_g, kP, kE, kF, d_nkB, alpha_k = newton(work_g)
            Frad_n, dMom_n = flux_update(Erad_g, B_g, kP, kE, kF, d_nkB, alpha_k)
            mom1 = mom0 + dMom_n
            work_new = (jnp.sum(mom1[None] * Frad_n, axis=1)
                        * work_chi(kF, alpha_k) * chat / (c * c) * dt)
            return Egas_g, Erad_g, R_g, Frad_n, dMom_n, work_new

        def outer_cond(carry):
            ite, done, *_ = carry
            return jnp.logical_and(ite < MAX_OUTER_ITER,
                                   jnp.logical_not(jnp.all(done)))

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
                ite + 1, done_new,
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
