"""Chemical networks: stiff integrator + primordial hydrogen network.

TPU-native rebuild of the reference's chemistry subsystem
(``src/chemistry/Chemistry.hpp:31-173``, which burns the Microphysics
`primordial_chem` VODE network per cell under Strang splitting, with
mass-fraction renormalization and electron charge conservation): here the
stiff per-cell ODE solve is a batched backward-Euler with a full Newton
iteration -- the species Jacobian is obtained with `jax.jacfwd` and the
small linear systems solved batched, so the whole grid burns in one fused
kernel. Networks are plugged in as pure rhs functions; the bundled
primordial hydrogen network (H, H+, e-) uses the standard collisional
ionization / case-B recombination rate fits and serves as the scaffold the
full 12-species primordial network drops into.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from ..indices import RHO, SCALAR0


def _dense_solve(A: jnp.ndarray, r: jnp.ndarray) -> jnp.ndarray:
    """Solve A x = r for one small dense system ([n,n], n <= ~16) with
    row-equilibrated Gaussian elimination, statically unrolled.

    Replaces `jnp.linalg.solve`, whose LU custom call cannot run under the
    TPU f64 emulation (the double-double rewriter does not see inside
    custom calls) -- this formulation is pure elementwise/slice ops, so the
    12-species network compiles for both f32 and emulated-f64 on TPU. The
    backward-Euler matrices I - hJ are diagonally dominated after row
    equilibration across the integrator's operating range (validated
    against linalg.solve in tests/test_chemistry.py)."""
    n = A.shape[0]
    # singular-pivot floor: rows are equilibrated to max-abs 1, so eps^2 is
    # far below any legitimate pivot. NOT finfo.tiny -- the minimum normal
    # f64 is unrepresentable on the TPU's f32-pair f64 emulation (flushes
    # to 0, voiding the guard).
    tiny = jnp.asarray(jnp.finfo(A.dtype).eps, A.dtype) ** 2

    s = jnp.max(jnp.abs(A), axis=1, keepdims=True)
    s = jnp.where(s > 0, s, jnp.ones_like(s))
    Ab = jnp.concatenate([A / s, r[:, None] / s], axis=1)

    rows = jnp.arange(n)
    for k in range(n):
        piv = Ab[k, k]
        piv = jnp.where(jnp.abs(piv) > tiny, piv,
                        jnp.where(piv >= 0, tiny, -tiny))
        fac = Ab[:, k] / piv
        Ab = Ab - jnp.where((rows > k)[:, None], fac[:, None] * Ab[k][None, :],
                            jnp.zeros_like(Ab))

    x = jnp.zeros(n, dtype=A.dtype)
    for k in reversed(range(n)):
        acc = Ab[k, n]
        if k < n - 1:
            acc = acc - jnp.dot(Ab[k, k + 1:n], x[k + 1:n])
        piv = Ab[k, k]
        piv = jnp.where(jnp.abs(piv) > tiny, piv,
                        jnp.where(piv >= 0, tiny, -tiny))
        x = x.at[k].set(acc / piv)
    return x


def backward_euler_newton(
    rhs: Callable,
    y0: jnp.ndarray,
    dt,
    params=None,
    n_subcycles: int = 8,
    n_newton: int = 8,
):
    """Integrate dy/dt = rhs(y, params) for a batch of small stiff systems.

    y0: [..., n_species]. Each backward-Euler substep solves
    y_{k+1} = y_k + h f(y_{k+1}) with Newton iterations; the species
    Jacobian comes from jax.jacfwd and the [n,n] solves are batched.
    Subcycling (fixed count) provides robustness for strongly stiff cells
    (the reference's VODE adapts; a fixed ladder is jit-stable)."""
    n = y0.shape[-1]
    h = dt / n_subcycles
    eye = jnp.eye(n, dtype=y0.dtype)

    flat = y0.reshape(-1, n)
    p_flat = None
    if params is not None:
        p_flat = jax.tree_util.tree_map(lambda a: jnp.broadcast_to(a, y0.shape[:-1]).reshape(-1), params)

    def cell_rhs(y, p):
        return rhs(y, p)

    jac = jax.jacfwd(cell_rhs)

    def substep(y, p):
        def newton_body(_, yk):
            f = cell_rhs(yk, p)
            J = jac(yk, p)
            A = eye - h * J
            r = yk - y - h * f
            dy = _dense_solve(A, r)
            return jnp.maximum(yk - dy, 0.0)  # species stay non-negative

        return lax.fori_loop(0, n_newton, newton_body, y)

    def advance_cell(y, p):
        def body(_, yk):
            return substep(yk, p)

        return lax.fori_loop(0, n_subcycles, body, y)

    out = jax.vmap(advance_cell)(flat, p_flat)
    return out.reshape(y0.shape)


# ------------------------------------------------ primordial hydrogen network
@dataclass(frozen=True)
class PrimordialHydrogen:
    """H / H+ / e- network: collisional ionization + case-B recombination.

    Rates (standard fits, cgs):
      k_ci(T)    = 5.85e-11 sqrt(T) exp(-157809.1/T) / (1 + sqrt(T/1e5))
      alpha_B(T) = 2.59e-13 (T/1e4)^-0.7
    Species vector y = [n_HI, n_HII, n_e] (number densities, cm^-3).
    """

    @staticmethod
    def k_ci(T):
        return 5.85e-11 * jnp.sqrt(T) * jnp.exp(-157809.1 / T) / (1.0 + jnp.sqrt(T / 1.0e5))

    @staticmethod
    def alpha_B(T):
        return 2.59e-13 * (T / 1.0e4) ** (-0.7)

    def rhs(self, y, T):
        nHI, nHII, ne = y[0], y[1], y[2]
        ion = self.k_ci(T) * nHI * ne
        rec = self.alpha_B(T) * nHII * ne
        dHI = rec - ion
        dHII = ion - rec
        dne = ion - rec
        return jnp.stack([dHI, dHII, dne])

    def equilibrium_ion_fraction(self, T):
        """x = n_HII/n_H at coronal equilibrium: k_ci (1-x) = alpha x."""
        k = self.k_ci(T)
        a = self.alpha_B(T)
        return k / (k + a)


def renormalize_species(y: jnp.ndarray, n_total, charge: Sequence[float]):
    """Reference-parity cleanup after a burn (``Chemistry.hpp:123-140``):
    rescale so the conserved total matches, and enforce charge neutrality
    by setting n_e from the ion charges."""
    nH = y[..., 0] + y[..., 1]
    scale = n_total / jnp.maximum(nH, 1e-300)
    y = y.at[..., 0].multiply(scale).at[..., 1].multiply(scale)
    ne = sum(float(c) * y[..., i] for i, c in enumerate(charge) if c > 0)
    return y.at[..., -1].set(ne)


# ------------------------------------------------- full primordial network
@dataclass(frozen=True)
class PrimordialNetwork:
    """12-species primordial chemistry network:

        e-, H, H+, H-, H2, H2+, D, D+, HD, He, He+, He++

    the species set of the reference's Microphysics ``primordial_chem``
    network (``src/problems/PrimordialChem``; reference burns it with VODE,
    here with the batched backward-Euler Newton). Gas-phase rate fits from
    the standard primordial-chemistry literature:

      - H/He collisional ionization: Janev et al. polynomials as compiled
        by Abel, Anninos, Zhang & Norman (1997)
      - recombination: Hui & Gnedin (1998) case B for H+; Cen (1992)
        radiative + dielectronic for He+; hydrogenic for He++
      - H2 formation/destruction via the H-/H2+ channels: Galli & Palla
        (1998) compilation
      - deuterium charge exchange: Savin (2002); HD chemistry: Galli &
        Palla (1998)

    State: number densities [cm^-3], ordered as `species`.
    """

    species = ("e", "H", "Hp", "Hm", "H2", "H2p", "D", "Dp", "HD",
               "He", "Hep", "Hepp")
    charges = (-1.0, 0.0, 1.0, -1.0, 0.0, 1.0, 0.0, 1.0, 0.0,
               0.0, 1.0, 2.0)
    # atomic masses [amu] (electron mass neglected in the heavies)
    masses = (5.4858e-4, 1.0, 1.0, 1.0, 2.0, 2.0, 2.0, 2.0, 3.0,
              4.0, 4.0, 4.0)

    n_species: int = 12

    # ---- rate coefficients [cm^3/s]; T in K
    @staticmethod
    def _janev(lnTe, coeffs):
        acc = jnp.zeros_like(lnTe)
        for c in reversed(coeffs):
            acc = acc * lnTe + c
        return jnp.exp(acc)

    @classmethod
    def rates(cls, T):
        T = jnp.maximum(T, 2.73)
        Te = T * 8.617333262e-5  # eV
        lnTe = jnp.log(jnp.maximum(Te, 1e-10))
        lam = 2.0 * 157807.0 / T

        k = {}
        # H + e -> H+ + 2e  (AAZN97 k1, Janev)
        k["H_ion"] = cls._janev(lnTe, (
            -32.71396786, 13.53655609, -5.73932875, 1.56315498,
            -0.28770560, 3.48255977e-2, -2.63197617e-3, 1.11954395e-4,
            -2.03914985e-6))
        # H+ + e -> H (case B, Hui & Gnedin 1998)
        k["H_rec"] = (2.753e-14 * lam**1.5
                      / (1.0 + (lam / 2.740)**0.407)**2.242)
        # He + e -> He+ + 2e (AAZN97 k3)
        k["He_ion"] = cls._janev(lnTe, (
            -44.09864886, 23.91596563, -10.75323020, 3.05803875,
            -0.56851189, 6.79539123e-2, -5.00905610e-3, 2.06723616e-4,
            -3.64916141e-6))
        # He+ + e -> He (Cen 1992: radiative + dielectronic)
        k["He_rec"] = (1.5e-10 * T**-0.6353
                       + 1.9e-3 * T**-1.5 * jnp.exp(-470000.0 / T)
                       * (1.0 + 0.3 * jnp.exp(-94000.0 / T)))
        # He+ + e -> He++ + 2e (AAZN97 k5)
        k["Hep_ion"] = cls._janev(lnTe, (
            -68.71040990, 43.93347633, -18.48066993, 4.70162649,
            -0.76924663, 8.11304200e-2, -5.32402063e-3, 1.97570531e-4,
            -3.16558106e-6))
        # He++ + e -> He+ (hydrogenic, Cen 1992)
        k["Hepp_rec"] = (3.36e-10 / jnp.sqrt(T) * (T / 1.0e3)**-0.2
                         / (1.0 + (T / 1.0e6)**0.7))
        # H + e -> H- (Galli & Palla 1998)
        k["Hm_form"] = 1.4e-18 * T**0.928 * jnp.exp(-T / 16200.0)
        # H- + H -> H2 + e (associative detachment, GP98)
        k["H2_Hm"] = jnp.full_like(T, 1.3e-9)
        # H + H+ -> H2+ (GP98 log-polynomial)
        logT = jnp.log10(T)
        k["H2p_form"] = 10.0**(-19.38 - 1.523 * logT + 1.118 * logT**2
                               - 0.1269 * logT**3)
        # H2+ + H -> H2 + H+
        k["H2_H2p"] = jnp.full_like(T, 6.4e-10)
        # H2 + H+ -> H2+ + H (GP98)
        k["H2_cx"] = 3.0e-10 * jnp.exp(-21050.0 / T)
        # H2 + e -> 2H + e (GP98)
        k["H2_de"] = 4.4e-10 * T**0.35 * jnp.exp(-102000.0 / T)
        # H2 + H -> 3H (AAZN97 k13, Lepp & Shull)
        k["H2_dH"] = (1.067e-10 * Te**2.012 * jnp.exp(-4.463 / Te)
                      / (1.0 + 0.2472 * Te)**3.512)
        # H- + H+ -> 2H (mutual neutralization)
        k["Hm_mn"] = 7.0e-7 / jnp.sqrt(T)
        # H2+ + e -> 2H (dissociative recombination)
        k["H2p_dr"] = 2.0e-7 / jnp.sqrt(T)
        # D+ + H -> D + H+ (Savin 2002)
        k["Dp_cx"] = 2.06e-10 * T**0.396 * jnp.exp(-33.0 / T) + 2.03e-9 * T**-0.332
        # D + H+ -> D+ + H (Savin 2002)
        k["D_cx"] = jnp.maximum(
            2.0e-10 * T**0.402 * jnp.exp(-37.1 / T) - 3.31e-17 * T**1.48, 0.0)
        # D+ + e -> D (same as H case B)
        k["D_rec"] = k["H_rec"]
        # D+ + H2 -> HD + H+ (GP98)
        k["HD_form"] = jnp.full_like(T, 2.1e-9)
        # HD + H+ -> D+ + H2 (GP98)
        k["HD_dest"] = 1.0e-9 * jnp.exp(-464.0 / T)
        # D + H2 -> HD + H (GP98)
        k["HD_formn"] = 9.0e-11 * jnp.exp(-3876.0 / T)
        # HD + H -> D + H2 (GP98)
        k["HD_destn"] = 3.2e-11 * jnp.exp(-3624.0 / T)
        return k

    def rhs(self, y, T):
        (ne, nH, nHp, nHm, nH2, nH2p, nD, nDp, nHD,
         nHe, nHep, nHepp) = [y[i] for i in range(12)]
        k = self.rates(T)

        r = {}
        r["H_ion"] = k["H_ion"] * nH * ne
        r["H_rec"] = k["H_rec"] * nHp * ne
        r["He_ion"] = k["He_ion"] * nHe * ne
        r["He_rec"] = k["He_rec"] * nHep * ne
        r["Hep_ion"] = k["Hep_ion"] * nHep * ne
        r["Hepp_rec"] = k["Hepp_rec"] * nHepp * ne
        r["Hm_form"] = k["Hm_form"] * nH * ne
        r["H2_Hm"] = k["H2_Hm"] * nHm * nH
        r["H2p_form"] = k["H2p_form"] * nH * nHp
        r["H2_H2p"] = k["H2_H2p"] * nH2p * nH
        r["H2_cx"] = k["H2_cx"] * nH2 * nHp
        r["H2_de"] = k["H2_de"] * nH2 * ne
        r["H2_dH"] = k["H2_dH"] * nH2 * nH
        r["Hm_mn"] = k["Hm_mn"] * nHm * nHp
        r["H2p_dr"] = k["H2p_dr"] * nH2p * ne
        r["Dp_cx"] = k["Dp_cx"] * nDp * nH
        r["D_cx"] = k["D_cx"] * nD * nHp
        r["D_rec"] = k["D_rec"] * nDp * ne
        r["HD_form"] = k["HD_form"] * nDp * nH2
        r["HD_dest"] = k["HD_dest"] * nHD * nHp
        r["HD_formn"] = k["HD_formn"] * nD * nH2
        r["HD_destn"] = k["HD_destn"] * nHD * nH

        d_e = (r["H_ion"] - r["H_rec"] + r["He_ion"] - r["He_rec"]
               + r["Hep_ion"] - r["Hepp_rec"] - r["Hm_form"] + r["H2_Hm"]
               - r["H2p_dr"] - r["D_rec"])
        d_H = (-r["H_ion"] + r["H_rec"] - r["Hm_form"] - r["H2_Hm"]
               - r["H2p_form"] - r["H2_H2p"] + r["H2_cx"]
               + 2.0 * r["H2_de"] + 3.0 * r["H2_dH"] - r["H2_dH"]
               + 2.0 * r["Hm_mn"] + 2.0 * r["H2p_dr"]
               - r["Dp_cx"] + r["D_cx"]
               - r["HD_destn"] + r["HD_formn"])
        # note: H2 + H -> 3H consumes one H and produces three (net +2),
        # already folded above via (3 - 1)
        d_Hp = (r["H_ion"] - r["H_rec"] - r["H2p_form"] + r["H2_H2p"]
                - r["H2_cx"] - r["Hm_mn"] + r["Dp_cx"] - r["D_cx"]
                + r["HD_form"] - r["HD_dest"])
        d_Hm = r["Hm_form"] - r["H2_Hm"] - r["Hm_mn"]
        d_H2 = (r["H2_Hm"] + r["H2_H2p"] - r["H2_cx"] - r["H2_de"]
                - r["H2_dH"] - r["HD_form"] + r["HD_dest"]
                - r["HD_formn"] + r["HD_destn"])
        d_H2p = r["H2p_form"] - r["H2_H2p"] + r["H2_cx"] - r["H2p_dr"]
        d_D = (r["Dp_cx"] - r["D_cx"] + r["D_rec"]
               - r["HD_formn"] + r["HD_destn"])
        d_Dp = (-r["Dp_cx"] + r["D_cx"] - r["D_rec"]
                - r["HD_form"] + r["HD_dest"])
        d_HD = r["HD_form"] - r["HD_dest"] + r["HD_formn"] - r["HD_destn"]
        d_He = -r["He_ion"] + r["He_rec"]
        d_Hep = r["He_ion"] - r["He_rec"] - r["Hep_ion"] + r["Hepp_rec"]
        d_Hepp = r["Hep_ion"] - r["Hepp_rec"]

        return jnp.stack([d_e, d_H, d_Hp, d_Hm, d_H2, d_H2p,
                          d_D, d_Dp, d_HD, d_He, d_Hep, d_Hepp])

    # conserved linear combinations (for tests and renormalization)
    def conserved_totals(self, y):
        """(H nuclei, D nuclei, He nuclei, charge) of a state [..., 12]."""
        (ne, nH, nHp, nHm, nH2, nH2p, nD, nDp, nHD,
         nHe, nHep, nHepp) = [y[..., i] for i in range(12)]
        nucH = nH + nHp + nHm + 2.0 * nH2 + 2.0 * nH2p + nHD
        nucD = nD + nDp + nHD
        nucHe = nHe + nHep + nHepp
        charge = (nHp - nHm + nH2p + nDp + nHep + 2.0 * nHepp) - ne
        return nucH, nucD, nucHe, charge
