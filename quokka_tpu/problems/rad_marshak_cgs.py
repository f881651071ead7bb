"""Su & Olson Marshak wave in CGS units (RadMarshakCGS).

Rebuild of the reference's RadMarshakCGS problem
(``src/problems/RadMarshakCGS/test_radiation_marshak_cgs.cpp`` +
``tests/MarshakCGS.in``): the boundary-driven Su & Olson benchmark with
physical constants -- kappa = 577 cm^2/g, rho = 10 g/cm^3,
T_hohlraum = 3.481334e6 K, the Su-Olson ansatz EOS Egas = (alpha/4) T^4
with alpha = 4 a_rad (epsilon = 1), c_hat = c.  The semi-analytic
solution is the SAME dimensionless Su & Olson transport solution as the
dimensionless RadMarshak problem, evaluated at the optical-depth
coordinate x = sqrt(3) chi z (chi = rho kappa) and retarded time
tau = epsilon c chi t; `exact_solution` below performs that mapping onto
`rad_marshak.su_olson_solution`.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..eos import A_RAD_CGS, C_LIGHT_CGS, K_BOLTZMANN_CGS, M_U_CGS
from ..indices import EGAS, EINT, MX1, RHO
from ..registry import (
    BC_PERIODIC,
    BC_USER,
    BCSpec,
    EOSTraits,
    PhysicsTraits,
    Problem,
    RadTraits,
    register_problem,
)
from .rad_marshak import su_olson_solution
from .rad_suolson import SuOlsonEOS

EPS_SUOLSON = 1.0
KAPPA = 577.0                 # cm^2/g
RHO0 = 10.0                   # g/cm^3
CHI = RHO0 * KAPPA            # 1/cm
T_HOHLRAUM = 3.481334e6       # K
T_INITIAL = 1.0e4             # K
ALPHA_CGS = 4.0 * A_RAD_CGS / EPS_SUOLSON


@register_problem
class RadMarshakCGSProblem(Problem):
    name = "RadMarshakCGS"
    physics = PhysicsTraits(hydro_enabled=False, radiation_enabled=True)
    eos_traits = EOSTraits(gamma=5.0 / 3.0, mean_molecular_weight=M_U_CGS,
                           boltzmann_constant=K_BOLTZMANN_CGS)
    rad = RadTraits(c_light=C_LIGHT_CGS, c_hat=C_LIGHT_CGS,
                    radiation_constant=A_RAD_CGS, Erad_floor=0.0,
                    beta_order=1)
    bcs = BCSpec(x=(BC_USER, BC_USER), y=(BC_PERIODIC, BC_PERIODIC),
                 z=(BC_PERIODIC, BC_PERIODIC))

    def make_eos(self):
        return SuOlsonEOS(alpha=ALPHA_CGS)

    def compute_planck_opacity(self, rho, T):
        return jnp.full_like(rho, KAPPA)

    def compute_flux_mean_opacity(self, rho, T):
        return jnp.full_like(rho, KAPPA)

    @staticmethod
    def exact_solution(z, t):
        """(T_rad, T_mat) profiles from the Su & Olson solution, mapped
        from CGS coordinates to the dimensionless solution's variables."""
        U, V = su_olson_solution(CHI * np.asarray(z), C_LIGHT_CGS * CHI * t,
                                 eps=EPS_SUOLSON, kappa=1.0)
        Trad = T_HOHLRAUM * np.maximum(U, 0.0) ** 0.25
        Tmat = T_HOHLRAUM * np.maximum(V, 0.0) ** 0.25
        return Trad, Tmat

    def fill_user_boundary(self, Ug, grid, ng, time, axis, side):
        """Marshak boundary at x = 0 (incident isotropic field at
        T_hohlraum with the consistent incoming flux); fixed cold state at
        x-hi (reference setCustomBoundaryConditions)."""
        if axis != 0:
            return Ug
        layout = self.physics.layout()
        eos = self.make_eos()
        iE = layout.rad_index(0, 0)
        iFx = layout.rad_index(0, 1)
        g = ng[0]
        Egas_bc = eos.eint_from_tgas(RHO0, T_INITIAL)
        c = C_LIGHT_CGS

        if side == 0:
            E_inc = A_RAD_CGS * T_HOHLRAUM**4
            E_0 = Ug[iE, g]
            F_0 = Ug[iFx, g]
            F_bdry = 0.5 * c * E_inc - 0.5 * (c * E_0 + 2.0 * F_0)
            sl = slice(0, g)
        else:
            E_inc = A_RAD_CGS * T_INITIAL**4
            F_bdry = jnp.zeros_like(Ug[iE, -1])
            sl = slice(Ug.shape[1] - g, Ug.shape[1])

        Ug = Ug.at[iE, sl].set(E_inc)
        Ug = Ug.at[iFx, sl].set(F_bdry)
        Ug = Ug.at[iE + 2, sl].set(0.0)
        Ug = Ug.at[iE + 3, sl].set(0.0)
        Ug = Ug.at[RHO, sl].set(RHO0)
        Ug = Ug.at[EGAS, sl].set(Egas_bc)
        Ug = Ug.at[EINT, sl].set(Egas_bc)
        Ug = Ug.at[MX1, sl].set(0.0)
        Ug = Ug.at[MX1 + 1, sl].set(0.0)
        Ug = Ug.at[MX1 + 2, sl].set(0.0)
        return Ug

    def set_initial_conditions(self, grid):
        shape = grid.n_cell
        layout = self.physics.layout()
        eos = self.make_eos()
        Egas0 = eos.eint_from_tgas(RHO0, T_INITIAL)
        Erad0 = A_RAD_CGS * T_INITIAL**4
        U = jnp.zeros((layout.nvar, *shape))
        U = U.at[RHO].set(RHO0)
        U = U.at[EGAS].set(Egas0)
        U = U.at[EINT].set(Egas0)
        U = U.at[layout.rad_index(0, 0)].set(Erad0)
        return U
