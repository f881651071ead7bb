"""Equation of state: gamma-law ideal gas (+ isothermal mode).

TPU-native equivalent of `quokka::EOS` (reference ``src/hydro/EOS.hpp:39``),
which wraps the Microphysics `gamma_law` EOS. Here the ideal-gas closed forms
are inlined directly (pure jnp, fusable into any kernel):

    P = (gamma - 1) rho e          cs = sqrt(gamma P / rho)
    T = (mu / k_B) (gamma - 1) e   e = specific internal energy

The isothermal mode (gamma == 1) mirrors `EOS_Traits::cs_isothermal`
(reference ``src/hydro/EOS.hpp:32-37``): pressure is rho*cs_iso^2 and
energy fluxes are disabled by the hydro system.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp

# CGS constants (match AMReX-Microphysics usage in the reference)
K_BOLTZMANN_CGS = 1.380649e-16  # erg/K
M_U_CGS = 1.66053906892e-24  # atomic mass unit, g
C_LIGHT_CGS = 2.99792458e10  # cm/s
A_RAD_CGS = 7.565731356724124e-15  # radiation constant, erg cm^-3 K^-4
G_NEWTON_CGS = 6.674e-8  # gravitational constant (value used by AMReX)


@dataclass(frozen=True)
class IdealGasEOS:
    """Gamma-law EOS with configurable constants (hashable; jit-static)."""

    gamma: float = 5.0 / 3.0
    mean_molecular_weight: float = M_U_CGS  # mu (grams)
    boltzmann_constant: float = K_BOLTZMANN_CGS
    cs_isothermal: float = float("nan")  # used only when gamma == 1

    @property
    def is_isothermal(self) -> bool:
        return self.gamma == 1.0

    # ------------------------------------------------------------ primitives
    def pressure(self, rho, eint):
        """P(rho, Eint) with Eint = rho*e the internal energy density."""
        if self.is_isothermal:
            return rho * self.cs_isothermal**2
        return (self.gamma - 1.0) * eint

    def eint_from_pres(self, rho, P):
        """Internal energy density (rho*e) from pressure."""
        del rho
        if self.is_isothermal:
            return jnp.zeros_like(P)
        return P / (self.gamma - 1.0)

    def sound_speed(self, rho, P):
        if self.is_isothermal:
            return jnp.full_like(rho, self.cs_isothermal)
        return jnp.sqrt(self.gamma * P / rho)

    # ----------------------------------------------------------- temperature
    def tgas_from_eint(self, rho, eint):
        """T from internal energy density (rho*e); ideal gas."""
        c_v = self.boltzmann_constant / (self.mean_molecular_weight * (self.gamma - 1.0))
        return eint / (rho * c_v)

    def eint_from_tgas(self, rho, T):
        c_v = self.boltzmann_constant / (self.mean_molecular_weight * (self.gamma - 1.0))
        return rho * c_v * T

    def eint_temp_derivative(self, rho, T):
        """d(Eint)/dT at constant rho (= rho * c_v); T-independent for the
        ideal gas, but problems may override with T-dependent heat capacity
        (as the reference's Su-Olson-type EOS specializations do)."""
        del T
        c_v = self.boltzmann_constant / (self.mean_molecular_weight * (self.gamma - 1.0))
        return rho * c_v

    # ------------------------------------------------- Riemann-solver support
    def other_derivatives(self, rho, P):
        """Thermodynamic derivatives used by the HLLC wavespeed estimate.

        Mirrors `EOS::ComputeOtherDerivatives` (reference
        ``src/hydro/EOS.hpp:244-297``) with the gamma-law closed forms:
          de/drho|_P = -P / ((g-1) rho^2)       (e = specific internal energy)
          de/dP|_rho = 1 / ((g-1) rho)
          drho/dP|_e = rho / P
          dP/drho|_s = cs^2 = g P / rho
          G (fundamental derivative) = (g+1)/2
        """
        g = self.gamma
        dedr = -P / ((g - 1.0) * rho * rho)
        dedp = 1.0 / ((g - 1.0) * rho)
        drdp = rho / P
        dpdr_s = g * P / rho
        G = 0.5 * (g + 1.0)
        return dedr, dedp, drdp, dpdr_s, G
