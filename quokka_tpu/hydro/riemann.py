"""Riemann solvers: HLLC (with low-dissipation corrections) and LLF.

TPU-native rebuild of `quokka::Riemann::{HLLC,LLF}` (reference
``src/hydro/HLLC.hpp:22`` and ``src/hydro/LLF.hpp:16``): the same math as the
reference's per-interface GPU lambdas, vectorized over whole face arrays.

Canonical frame: `u` is the velocity normal to the face, `v`/`w` the
transverse components; the caller permutes momentum fluxes back to x/y/z.
Flux component order (canonical): [rho, mom_u, mom_v, mom_w, E, Eint,
scalars...].
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax.numpy as jnp

from ..eos import IdealGasEOS


@dataclass
class FaceState:
    """Primitive state on one side of a face (arrays over all faces).
    Mirrors `quokka::HydroState` (reference ``src/hydro/HydroState.hpp``)."""

    rho: jnp.ndarray
    u: jnp.ndarray  # normal velocity
    v: jnp.ndarray
    w: jnp.ndarray
    P: jnp.ndarray
    cs: jnp.ndarray
    E: jnp.ndarray  # total energy density
    Eint: jnp.ndarray  # auxiliary internal energy density (rho*e)
    scalars: Optional[jnp.ndarray] = None  # [nscal, ...faces]
    by: jnp.ndarray | float = 0.0  # transverse B (MHD / HLLD only)
    bz: jnp.ndarray | float = 0.0
    # per-face effective gamma (composition-dependent mixture EOS only;
    # None selects the fixed-trait gamma paths unchanged)
    gamma: Optional[jnp.ndarray] = None
    # cached reciprocal density: the TPU VPU's divide is a multi-op
    # sequence, and the HLLC pipeline divides by rho in five places --
    # callers that can afford one reciprocal per side set this and the
    # solver multiplies instead (ulp-level difference only)
    rinv: Optional[jnp.ndarray] = None

    def rho_inv(self):
        return self.rinv if self.rinv is not None else 1.0 / self.rho

    def conserved_list(self) -> list:
        comps = [self.rho, self.rho * self.u, self.rho * self.v, self.rho * self.w, self.E, self.Eint]
        if self.scalars is not None and self.scalars.shape[0] > 0:
            comps += [self.scalars[i] for i in range(self.scalars.shape[0])]
        return comps

    def flux_list(self) -> list:
        """Canonical physical flux F = u*U + P*D, as a component list
        (built without scatter ops so it lowers inside Pallas kernels)."""
        U = self.conserved_list()
        F = [self.u * u for u in U]
        F[1] = F[1] + self.P
        F[4] = F[4] + self.P * self.u
        return F

    def conserved(self) -> jnp.ndarray:
        """Canonical conserved vector [rho, rho*u, rho*v, rho*w, E, Eint, scalars...]."""
        return jnp.stack(self.conserved_list())

    def flux(self) -> jnp.ndarray:
        return jnp.stack(self.flux_list())


def llf(sL: FaceState, sR: FaceState) -> jnp.ndarray:
    """Local Lax-Friedrichs / Rusanov flux (reference ``src/hydro/LLF.hpp:16``;
    Toro eq. 10.56). Used for first-order flux correction."""
    Sp = jnp.maximum(jnp.abs(sL.u) + sL.cs, jnp.abs(sR.u) + sR.cs)
    U_L, U_R = sL.conserved_list(), sR.conserved_list()
    F_L, F_R = sL.flux_list(), sR.flux_list()
    return jnp.stack([
        0.5 * (fl + fr) - 0.5 * Sp * (ur - ul)
        for fl, fr, ul, ur in zip(F_L, F_R, U_L, U_R)
    ])


def hllc(
    sL: FaceState,
    sR: FaceState,
    eos: IdealGasEOS,
    du: jnp.ndarray,
    dw: jnp.ndarray,
) -> jnp.ndarray:
    """HLLC flux following Toro/Balsara, with the reference's refinements
    (``src/hydro/HLLC.hpp:22-160``):

    - Roe-averaged wavespeeds with the Kershaw+1998 general-EOS sound speed;
    - Rider 1999 nonlinear wavespeed correction in compressions (the
      fundamental-derivative terms), which suppresses slow-moving-shock
      oscillations;
    - Minoshima & Miyoshi 2021 carbuncle suppression: the pressure jump in
      the S* estimate is scaled by theta(du, dw), and the star-state pressure
      uses the low-dissipation phi correction.

    `du` = normal velocity difference across the face (q_i - q_{i-1});
    `dw` = min transverse velocity difference (see caller).
    """
    gamma = eos.gamma
    mix = sL.gamma is not None  # composition-dependent per-face gamma
    rinv_L = sL.rho_inv()
    rinv_R = sR.rho_inv()

    wl = jnp.sqrt(sL.rho)
    wr = jnp.sqrt(sR.rho)
    norm = 1.0 / (wl + wr)
    u_t = (wl * sL.u + wr * sR.u) * norm
    v_t = (wl * sL.v + wr * sR.v) * norm
    w_t = (wl * sL.w + wr * sR.w) * norm
    vsq_t = u_t * u_t + v_t * v_t + w_t * w_t
    H_L = (sL.E + sL.P) * rinv_L
    H_R = (sR.E + sR.P) * rinv_R
    H_t = (wl * H_L + wr * H_R) * norm

    dU = sL.u - sR.u  # positive in compression

    if mix or gamma != 1.0:
        # gamma-law closed-form derivatives (reference
        # `EOS::ComputeOtherDerivatives`, ``src/hydro/EOS.hpp:244-297``;
        # per-face mixture gamma when the chem EOS is on), expressed via
        # the cached reciprocal densities:
        #   de/drho|_P = -P/((g-1) rho^2),  de/dP|_rho = 1/((g-1) rho),
        #   drho/dP|_e = rho/P,             G = (g+1)/2
        def derivs(g, rho, P, rinv):
            inv_gm1 = 1.0 / (g - 1.0)
            dedr = -P * inv_gm1 * (rinv * rinv)
            dedp = inv_gm1 * rinv
            drdp = rho / P
            return dedr, dedp, drdp, 0.5 * (g + 1.0)

        g_L = sL.gamma if mix else gamma
        g_R = sR.gamma if mix else gamma
        dedr_L, dedp_L, drdp_L, G_L = derivs(g_L, sL.rho, sL.P, rinv_L)
        dedr_R, dedp_R, drdp_R, G_R = derivs(g_R, sR.rho, sR.P, rinv_R)

        # Kershaw+1998 eqs A.5a/A.5b, 4.12 (uses the *auxiliary* specific
        # internal energy carried by the interface states, as the reference does)
        e_L = sL.Eint * rinv_L
        e_R = sR.Eint * rinv_R
        C_rho = 0.5 * (e_L + e_R + sL.rho * dedr_L + sR.rho * dedr_R)
        C_P = 0.5 * (e_L * drdp_L + e_R * drdp_R + sL.rho * dedp_L + sR.rho * dedp_R)

        cs_exp = H_t - 0.5 * vsq_t - C_rho
        cs_avg = 0.5 * (sL.cs + sR.cs)
        cs_t = jnp.where(cs_exp > 0.0, jnp.sqrt(jnp.abs(cs_exp) / C_P), cs_avg)

        s_NL = 0.5 * G_L * jnp.maximum(dU, 0.0)
        s_NR = 0.5 * G_R * jnp.maximum(dU, 0.0)
    else:
        cs_t = 0.5 * (sL.cs + sR.cs)
        s_NL = 0.5 * 1.0 * jnp.maximum(dU, 0.0)
        s_NR = s_NL

    # Batten et al. 1997 wavespeed bounds
    S_L = jnp.minimum(sL.u - (sL.cs + s_NL), u_t - (cs_t + s_NL))
    S_R = jnp.maximum(sR.u + (sR.cs + s_NR), u_t + (cs_t + s_NR))

    # carbuncle correction [Minoshima & Miyoshi 2021, eq. 10]
    cs_max = jnp.maximum(sL.cs, sR.cs)
    tp = jnp.minimum(
        1.0, (cs_max - jnp.minimum(du, 0.0)) / (cs_max - jnp.minimum(dw, 0.0))
    )
    theta = tp**4

    denom = sL.rho * (S_L - sL.u) - sR.rho * (S_R - sR.u)
    S_star = (
        theta * (sR.P - sL.P)
        + (sL.rho * sL.u * (S_L - sL.u) - sR.rho * sR.u * (S_R - sR.u))
    ) / denom

    # low-dissipation pressure correction phi [M&M 2021, eq. 23]
    # (max of the magnitudes == sqrt of the max of the squares: one sqrt)
    vsq_L = sL.u**2 + sL.v**2 + sL.w**2
    vsq_R = sR.u**2 + sR.v**2 + sR.w**2
    chi = jnp.minimum(1.0, jnp.sqrt(jnp.maximum(vsq_L, vsq_R)) / cs_max)
    phi = chi * (2.0 - chi)

    P_LR = 0.5 * (sL.P + sR.P) + 0.5 * phi * (
        sL.rho * (S_L - sL.u) * (S_star - sL.u) + sR.rho * (S_R - sR.u) * (S_star - sR.u)
    )

    U_L, U_R = sL.conserved_list(), sR.conserved_list()
    F_L, F_R = sL.flux_list(), sR.flux_list()

    # D_star has 1 in the normal-momentum slot and S_star in the energy slot:
    # F* = (S*(S U - F) + S P_LR D*) / (S - S*)
    def star_flux(S, U, F):
        coef = 1.0 / (S - S_star)
        Fs = [(S_star * (S * u - f)) * coef for u, f in zip(U, F)]
        Fs[1] = Fs[1] + S * P_LR * coef
        Fs[4] = Fs[4] + S * P_LR * S_star * coef
        return Fs

    F_starL = star_flux(S_L, U_L, F_L)
    F_starR = star_flux(S_R, U_R, F_R)

    # open the Riemann fan
    in_L = S_L > 0.0
    in_sL = S_star > 0.0
    in_sR = S_R >= 0.0
    F = [
        jnp.where(in_L, fl, jnp.where(in_sL, fsl, jnp.where(in_sR, fsr, fr)))
        for fl, fsl, fsr, fr in zip(F_L, F_starL, F_starR, F_R)
    ]
    return jnp.stack(F)


# --------------------------------------------------------------------- HLLD
_HLLD_DELTA = 1.0e-4  # degeneracy threshold (reference src/hydro/HLLD.hpp:15)


def _fast_magnetosonic_speed(gamma, s: FaceState, bx):
    """Fast magnetosonic speed (reference `FastMagnetoSonicSpeed`,
    ``src/hydro/HLLD.hpp:31-41``)."""
    gp = gamma * s.P
    bx_sq = bx * bx
    byz_sq = s.by * s.by + s.bz * s.bz
    b_sq = bx_sq + byz_sq
    bgp_p = b_sq + gp
    bgp_m = b_sq - gp
    return jnp.sqrt(0.5 * (bgp_p + jnp.sqrt(bgp_m * bgp_m + 4.0 * gp * byz_sq)) / s.rho)


def hlld(sL: FaceState, sR: FaceState, gamma: float, bx):
    """HLLD MHD Riemann solver (Miyoshi & Kusano 2005; reference
    ``src/hydro/HLLD.hpp:43-334``), vectorized with masked branch selection.

    FaceState must carry `by`/`bz` transverse field components (zero for
    hydro-only operation, as the reference runs it today -- the induction
    update is stub-level parity). Returns the canonical flux
    [rho, mom_u, mom_v, mom_w, E, Eint(=0), by, bz].
    """
    bx = jnp.asarray(bx)
    bx_sq = bx * bx

    def cons(s):
        pb = 0.5 * (bx_sq + (s.by**2 + s.bz**2))
        ke = 0.5 * s.rho * (s.u**2 + (s.v**2 + s.w**2))
        E = ke + pb + s.P / (gamma - 1.0)
        return dict(rho=s.rho, mx=s.rho * s.u, my=s.rho * s.v, mz=s.rho * s.w,
                    E=E, by=s.by, bz=s.bz), pb

    u_L, pb_L = cons(sL)
    u_R, pb_R = cons(sR)

    cfs_L = _fast_magnetosonic_speed(gamma, sL, bx)
    cfs_R = _fast_magnetosonic_speed(gamma, sR, bx)
    S0 = jnp.minimum(sL.u - cfs_L, sR.u - cfs_R)
    S4 = jnp.maximum(sL.u + cfs_L, sR.u + cfs_R)

    ptot_L = sL.P + pb_L
    ptot_R = sR.P + pb_R

    def phys_flux(s, u, ptot):
        # NB: the transverse momentum fluxes are rho*u*v - Bx*By and
        # rho*u*w - Bx*Bz (Miyoshi & Kusano 2005 eq. 2). The reference's
        # stub HLLD has "+ bx * by" here (``src/hydro/HLLD.hpp:108-109``)
        # -- a sign bug in upstream dead code (no induction update ever
        # exercises it there; with B=0, the reference's only operating
        # mode, the term vanishes). The minus sign is also what the MK05
        # star states (which both codes share) assume: with "+" the
        # Alfven-wave v/B coupling turns anti-Hermitian and the CT solver
        # grows grid-scale modes exponentially.
        return dict(
            rho=u["mx"],
            mx=u["mx"] * s.u + ptot - bx_sq,
            my=u["my"] * s.u - bx * u["by"],
            mz=u["mz"] * s.u - bx * u["bz"],
            E=s.u * (u["E"] + ptot - bx_sq) - bx * (s.v * u["by"] + s.w * u["bz"]),
            by=u["by"] * s.u - bx * s.v,
            bz=u["bz"] * s.u - bx * s.w,
        )

    f_L = phys_flux(sL, u_L, ptot_L)
    f_R = phys_flux(sR, u_R, ptot_R)

    siui_L = S0 - sL.u
    siui_R = S4 - sR.u
    S2 = (siui_R * u_R["mx"] - siui_L * u_L["mx"] + (ptot_L - ptot_R)) / (
        siui_R * u_R["rho"] - siui_L * u_L["rho"]
    )
    sism_L = S0 - S2
    sism_R = S4 - S2

    rho_star_L = u_L["rho"] * siui_L / sism_L
    rho_star_R = u_R["rho"] * siui_R / sism_R
    rs_L = jnp.sqrt(rho_star_L)
    rs_R = jnp.sqrt(rho_star_R)
    S1 = S2 - jnp.abs(bx) / rs_L
    S3 = S2 + jnp.abs(bx) / rs_R

    ptot_star = 0.5 * (
        (ptot_L - u_L["rho"] * siui_L * (S2 - sL.u))
        + (ptot_R - u_R["rho"] * siui_R * (S2 - sR.u))
    )

    def star_state(s, u, siui, sism, rho_star):
        denom = u["rho"] * siui * sism - bx_sq
        degen = jnp.abs(denom) < _HLLD_DELTA * ptot_star
        safe = jnp.where(degen, 1.0, denom)
        tmp_m = bx * (siui - sism) / safe
        my = jnp.where(degen, rho_star * s.v, rho_star * (s.v - u["by"] * tmp_m))
        mz = jnp.where(degen, rho_star * s.w, rho_star * (s.w - u["bz"] * tmp_m))
        tmp_b = (u["rho"] * siui**2 - bx_sq) / safe
        by = jnp.where(degen, u["by"], u["by"] * tmp_b)
        bz = jnp.where(degen, u["bz"], u["bz"] * tmp_b)
        mx = rho_star * S2
        vb_star = (mx * bx + (my * by + mz * bz)) / rho_star
        E = (
            siui * u["E"] - ptot_L_or_R(s) * s.u + ptot_star * S2
            + bx * (s.u * bx + (s.v * u["by"] + s.w * u["bz"]) - vb_star)
        ) / sism
        return dict(rho=rho_star, mx=mx, my=my, mz=mz, E=E, by=by, bz=bz), vb_star

    def ptot_L_or_R(s):
        return s.P + 0.5 * (bx_sq + (s.by**2 + s.bz**2))

    us_L, vb_star_L = star_state(sL, u_L, siui_L, sism_L, rho_star_L)
    us_R, vb_star_R = star_state(sR, u_R, siui_R, sism_R, rho_star_R)

    # double-star states (Alfven-wave rotations), MK5 eqns 59-63
    bx_near_zero = 0.5 * bx_sq < _HLLD_DELTA * ptot_star
    rho_sum_inv = 1.0 / (rs_L + rs_R)
    bx_sign = jnp.where(bx > 0.0, 1.0, -1.0)

    vdm = rho_sum_inv * (
        rs_L * (us_L["my"] / us_L["rho"]) + rs_R * (us_R["my"] / us_R["rho"])
        + bx_sign * (us_R["by"] - us_L["by"])
    )
    wdm = rho_sum_inv * (
        rs_L * (us_L["mz"] / us_L["rho"]) + rs_R * (us_R["mz"] / us_R["rho"])
        + bx_sign * (us_R["bz"] - us_L["bz"])
    )
    byd = rho_sum_inv * (
        rs_L * us_R["by"] + rs_R * us_L["by"]
        + bx_sign * rs_L * rs_R * (us_R["my"] / us_R["rho"] - us_L["my"] / us_L["rho"])
    )
    bzd = rho_sum_inv * (
        rs_L * us_R["bz"] + rs_R * us_L["bz"]
        + bx_sign * rs_L * rs_R * (us_R["mz"] / us_R["rho"] - us_L["mz"] / us_L["rho"])
    )
    vb_d = S2 * bx + (vdm * byd + wdm * bzd)

    def dstar(us, vb_star, sgn_rs, sign):
        out = {}
        out["rho"] = us["rho"]
        out["mx"] = us["mx"]
        out["my"] = jnp.where(bx_near_zero, us["my"], us["rho"] * vdm)
        out["mz"] = jnp.where(bx_near_zero, us["mz"], us["rho"] * wdm)
        out["by"] = jnp.where(bx_near_zero, us["by"], byd)
        out["bz"] = jnp.where(bx_near_zero, us["bz"], bzd)
        out["E"] = jnp.where(
            bx_near_zero, us["E"], us["E"] + sign * sgn_rs * bx_sign * (vb_d - vb_star)
        )
        return out

    # note sign convention: E_dstar_L = E_star_L - rs_L*sign(bx)*(vb_star-vb_d)
    ud_L = dstar(us_L, vb_star_L, rs_L, 1.0)
    ud_R = dstar(us_R, vb_star_R, rs_R, -1.0)

    keys = ("rho", "mx", "my", "mz", "E", "by", "bz")

    def hll_sum(f, terms):
        return {k: f[k] + sum(t[k] for t in terms) for k in keys}

    d_us_L = {k: S0 * (us_L[k] - u_L[k]) for k in keys}
    d_ud_L = {k: S1 * (ud_L[k] - us_L[k]) for k in keys}
    d_us_R = {k: S4 * (us_R[k] - u_R[k]) for k in keys}
    d_ud_R = {k: S3 * (ud_R[k] - us_R[k]) for k in keys}

    F_sL = hll_sum(f_L, [d_us_L])
    F_dL = hll_sum(f_L, [d_us_L, d_ud_L])
    F_dR = hll_sum(f_R, [d_us_R, d_ud_R])
    F_sR = hll_sum(f_R, [d_us_R])

    out = {}
    for k in keys:
        out[k] = jnp.where(
            S0 >= 0.0, f_L[k],
            jnp.where(S4 <= 0.0, f_R[k],
            jnp.where(S1 >= 0.0, F_sL[k],
            jnp.where(S2 >= 0.0, F_dL[k],
            jnp.where(S3 > 0.0, F_dR[k], F_sR[k])))))

    # canonical order: [rho, mom_u, mom_v, mom_w, E, Eint(=0), by, bz]
    zero = jnp.zeros_like(out["rho"])
    return jnp.stack([out["rho"], out["mx"], out["my"], out["mz"], out["E"], zero,
                      out["by"], out["bz"]])
