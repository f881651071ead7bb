"""Radiation-matter coupling test (reference
``src/problems/RadMatterCoupling/test_radiation_matter_coupling.cpp``).

Uniform static medium, kappa = 1, Su-Olson-type EOS (Egas = alpha/4 T^4 with
alpha = 4 a_rad), Erad0 = 1e12, Egas0 = 1e2, rho = 1e-7, constant dt = 1e-8 s
to t = 1e-2 s. The gas temperature must follow the asymptotically-exact
Gonzalez et al. 2007 solution to relative L1 error < 2e-5.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

from ..eos import A_RAD_CGS, C_LIGHT_CGS
from ..indices import EGAS, EINT, RHO
from ..registry import (
    BC_OUTFLOW,
    BCSpec,
    EOSTraits,
    PhysicsTraits,
    Problem,
    RadTraits,
    register_problem,
)

EPS_SUOLSON = 1.0
A_RAD_TEST = 7.5646e-15  # value used in the reference test's alpha
ALPHA_SUOLSON = 4.0 * A_RAD_TEST / EPS_SUOLSON

ERAD0 = 1.0e12  # erg cm^-3
EGAS0 = 1.0e2  # erg cm^-3
RHO0 = 1.0e-7  # g cm^-3


@dataclass(frozen=True)
class SuOlsonEOS:
    """Egas = (alpha/4) T^4 (reference EOS specializations,
    test_radiation_matter_coupling.cpp:68-99)."""

    alpha: float = ALPHA_SUOLSON
    is_isothermal: bool = False

    def tgas_from_eint(self, rho, eint):
        return (4.0 * eint / self.alpha) ** 0.25

    def eint_from_tgas(self, rho, T):
        return (self.alpha / 4.0) * T**4

    def eint_temp_derivative(self, rho, T):
        return self.alpha * T**3


@register_problem
class RadMatterCouplingProblem(Problem):
    name = "RadMatterCoupling"
    physics = PhysicsTraits(hydro_enabled=False, radiation_enabled=True)
    eos_traits = EOSTraits(gamma=5.0 / 3.0)
    rad = RadTraits(
        c_light=C_LIGHT_CGS,
        c_hat=C_LIGHT_CGS,
        radiation_constant=A_RAD_CGS,
        Erad_floor=0.0,
        beta_order=1,
    )
    bcs = BCSpec(
        x=(BC_OUTFLOW, BC_OUTFLOW),
        y=(BC_OUTFLOW, BC_OUTFLOW),
        z=(BC_OUTFLOW, BC_OUTFLOW),
    )

    def make_eos(self):
        return SuOlsonEOS()

    def compute_planck_opacity(self, rho, T):
        return jnp.ones_like(rho)

    def set_initial_conditions(self, grid):
        shape = grid.n_cell
        nvar = self.physics.layout().nvar
        U = jnp.zeros((nvar, *shape))
        U = U.at[RHO].set(RHO0)
        U = U.at[EGAS].set(EGAS0)
        U = U.at[EINT].set(EGAS0)
        layout = self.physics.layout()
        U = U.at[layout.rad_index(0, 0)].set(ERAD0)
        return U

    @staticmethod
    def exact_Tgas(t):
        """Gonzalez et al. 2007 asymptotic solution (reference
        test_radiation_matter_coupling.cpp:186-206)."""
        arad = A_RAD_CGS
        c = C_LIGHT_CGS
        kappa = 1.0
        T0 = (4.0 * EGAS0 / ALPHA_SUOLSON) ** 0.25
        E0 = (ERAD0 + EGAS0) / (arad + ALPHA_SUOLSON / 4.0)
        T4 = (T0**4 - E0) * np.exp(
            -(4.0 / ALPHA_SUOLSON) * (arad + ALPHA_SUOLSON / 4.0) * kappa * RHO0 * c * t
        ) + E0
        return T4**0.25


# ---------------------------------------------------------------- RSLA variant
# (reference ``src/problems/RadMatterCouplingRSLA``): the same coupling
# with a REDUCED speed of light chat = 0.1 c.  With the Su-Olson EOS the
# coupling ODE is linear in T^4, so the RSLA trajectory has the closed
# form used as the reference's exact solution (rel-L1 tolerance 5e-5):
#   T^4(t) = (T0^4 - (chat/c) E0') e^{-(4/alpha)(a + (chat/c) alpha/4) kappa rho c t}
#            + (chat/c) E0',
#   E0' = ((c/chat) Erad0 + Egas0) / (a + (chat/c) alpha/4).
C_RSLA = 0.1 * C_LIGHT_CGS


@register_problem
class RadMatterCouplingRSLAProblem(RadMatterCouplingProblem):
    name = "RadMatterCouplingRSLA"
    rad = RadTraits(
        c_light=C_LIGHT_CGS,
        c_hat=C_RSLA,
        radiation_constant=A_RAD_CGS,
        Erad_floor=0.0,
        beta_order=1,
    )

    @staticmethod
    def exact_Tgas_rsla(t):
        t = np.asarray(t)
        c = C_LIGHT_CGS
        cr = C_RSLA
        kappa = 1.0
        arad = A_RAD_TEST
        T0_4 = 4.0 * EGAS0 / ALPHA_SUOLSON
        E0_rsla = ((c / cr) * ERAD0 + EGAS0) / (arad + (cr / c) * ALPHA_SUOLSON / 4.0)
        T4 = ((T0_4 - (cr / c) * E0_rsla)
              * np.exp(-(4.0 / ALPHA_SUOLSON)
                       * (arad + (cr / c) * ALPHA_SUOLSON / 4.0)
                       * kappa * RHO0 * c * t)
              + (cr / c) * E0_rsla)
        return T4**0.25
