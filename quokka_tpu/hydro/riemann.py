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

    wl = jnp.sqrt(sL.rho)
    wr = jnp.sqrt(sR.rho)
    norm = 1.0 / (wl + wr)
    u_t = (wl * sL.u + wr * sR.u) * norm
    v_t = (wl * sL.v + wr * sR.v) * norm
    w_t = (wl * sL.w + wr * sR.w) * norm
    vsq_t = u_t * u_t + v_t * v_t + w_t * w_t
    H_L = (sL.E + sL.P) / sL.rho
    H_R = (sR.E + sR.P) / sR.rho
    H_t = (wl * H_L + wr * H_R) * norm

    dU = sL.u - sR.u  # positive in compression

    if gamma != 1.0:
        dedr_L, dedp_L, drdp_L, _, G_L = eos.other_derivatives(sL.rho, sL.P)
        dedr_R, dedp_R, drdp_R, _, G_R = eos.other_derivatives(sR.rho, sR.P)

        # Kershaw+1998 eqs A.5a/A.5b, 4.12 (uses the *auxiliary* specific
        # internal energy carried by the interface states, as the reference does)
        e_L = sL.Eint / sL.rho
        e_R = sR.Eint / sR.rho
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
    vmag_L = jnp.sqrt(sL.u**2 + sL.v**2 + sL.w**2)
    vmag_R = jnp.sqrt(sR.u**2 + sR.v**2 + sR.w**2)
    chi = jnp.minimum(1.0, jnp.maximum(vmag_L, vmag_R) / cs_max)
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
