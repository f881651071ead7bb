"""Su & Olson (1996) boundary-driven non-equilibrium Marshak wave (1D).

Rebuild of the reference's RadMarshak problem
(``src/problems/RadMarshak/test_radiation_marshak.cpp``): radiation-only in
the static diffusion regime, dimensionless units (c = chat = a = 1),
epsilon = 4a/alpha = 1, unit opacity, cold initial state (T = 1e-2), and a
Marshak boundary at x = 0: incident isotropic radiation at the hohlraum
temperature T_H, with the incoming flux consistent with the first interior
cell, F_bdry = (c E_inc - c E_0 - 2 F_0) / 2.

`su_olson_solution` evaluates the Su & Olson (1996, JQSRT 56, 337)
semi-analytic transport solution U(x, tau), V(x, tau) by direct quadrature
of their inversion integrals (gamma_k / theta_k oscillatory kernels) --
the published benchmark the reference compares against (2% tolerance on
T_rad over the diffusion length).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

from ..indices import EGAS, EINT, MX1, RHO
from ..registry import (
    BC_OUTFLOW,
    BC_REFLECT,
    BC_USER,
    BCSpec,
    EOSTraits,
    PhysicsTraits,
    Problem,
    RadTraits,
    register_problem,
)
from .rad_suolson import ALPHA_SUOLSON, SuOlsonEOS

EPS_SUOLSON = 1.0
KAPPA = 1.0
RHO0 = 1.0
T_HOHLRAUM = 1.0
T_INITIAL = 1.0e-2
A_RAD = 1.0
C = 1.0


# ---------------------------------------------------------------------------
# Su & Olson (1996) semi-analytic solution, evaluated by dense quadrature of
# their Fourier-inversion integrals (eqs. 36-43 of the paper). x is the
# optical-depth coordinate sqrt(3) kappa z; tau = 4 a c kappa t / alpha.
# ---------------------------------------------------------------------------
def su_olson_solution(z, t, eps: float = EPS_SUOLSON, kappa: float = KAPPA,
                      alpha: float = ALPHA_SUOLSON, n_quad: int = 200000):
    """(U, V): dimensionless radiation / matter energy densities of the
    boundary-driven Su & Olson problem at positions z and time t."""
    z = np.atleast_1d(np.asarray(z, dtype=np.float64))
    x = np.sqrt(3.0) * kappa * z  # [N]
    tau = 4.0 * A_RAD * C * kappa * t / alpha

    # open-interval nodes (integrands have removable/oscillatory endpoints)
    eta = (np.arange(n_quad, dtype=np.float64) + 0.5) / n_quad  # midpoint rule
    w = 1.0 / n_quad
    eta_c = np.clip(eta, 1e-14, 1.0 - 1e-14)

    def gamma1(e):
        return e * np.sqrt(eps + 1.0 / (1.0 - e * e))

    def gamma2(e):
        return np.sqrt((1.0 - e) * (eps + 1.0 / e))

    def gamma3(e):
        return np.sqrt((1.0 - e * e) * (eps + 1.0 / (e * e)))

    def theta(g):
        return np.arccos(np.sqrt(3.0 / (3.0 + 4.0 * g * g)))

    g1, g2, g3 = gamma1(eta_c), gamma2(eta_c), gamma3(eta_c)
    th1, th2, th3 = theta(g1), theta(g2), theta(g3)
    xg = x[:, None]  # [N, 1] broadcasting against eta [Q]

    i1 = np.sum(
        np.exp(-tau * eta**2) * np.sin(xg * g1 + th1)
        / (eta_c * np.sqrt(3.0 + 4.0 * g1 * g1)),
        axis=1) * w
    damp2 = np.exp(-tau / (eps * eta_c))
    i2 = np.sum(
        damp2 * np.sin(xg * g2 + th2)
        / (eta_c * (1.0 + eps * eta_c) * np.sqrt(3.0 + 4.0 * g2 * g2)),
        axis=1) * w
    i3 = np.sum(
        np.exp(-tau * (1.0 - eta**2)) * np.sin(xg * g3 + th3)
        / np.sqrt(4.0 - eta_c**2 + 4.0 * eps * eta_c**2 * (1.0 - eta_c**2)),
        axis=1) * w
    i4 = np.sum(
        damp2 * np.sin(xg * g2 + th2) / (eta_c * np.sqrt(3.0 + 4.0 * g2 * g2)),
        axis=1) * w

    rt3opi = np.sqrt(3.0) / np.pi
    U = 1.0 - 2.0 * rt3opi * i1 - rt3opi * np.exp(-tau) * i2
    V = U - 2.0 * rt3opi * i3 + rt3opi * np.exp(-tau) * i4
    return np.clip(U, 0.0, None), np.clip(V, 0.0, None)


@register_problem
class RadMarshakProblem(Problem):
    name = "RadMarshak"
    physics = PhysicsTraits(hydro_enabled=False, radiation_enabled=True)
    eos_traits = EOSTraits(gamma=5.0 / 3.0, mean_molecular_weight=1.0,
                           boltzmann_constant=1.0)
    rad = RadTraits(c_light=C, c_hat=C, radiation_constant=A_RAD,
                    Erad_floor=0.0, beta_order=0)
    bcs = BCSpec(
        x=(BC_USER, BC_USER),
        y=(BC_REFLECT, BC_REFLECT),
        z=(BC_REFLECT, BC_REFLECT),
    )

    def make_eos(self):
        return SuOlsonEOS()

    def compute_planck_opacity(self, rho, T):
        return KAPPA / rho

    def compute_flux_mean_opacity(self, rho, T):
        return KAPPA / rho

    def fill_user_boundary(self, Ug, grid, ng, time, axis, side):
        """Marshak condition at x-lo (incident isotropic radiation at T_H,
        flux consistent with the first interior cell); fixed cold state at
        x-hi (reference setCustomBoundaryConditions,
        test_radiation_marshak.cpp:104-160)."""
        if axis != 0:
            return Ug
        layout = self.physics.layout()
        eos = self.make_eos()
        iE = layout.rad_index(0, 0)
        iFx = layout.rad_index(0, 1)
        iFy = layout.rad_index(0, 2)
        iFz = layout.rad_index(0, 3)
        g = ng[0]
        Egas_bc = eos.eint_from_tgas(RHO0, T_INITIAL)

        if side == 0:
            E_inc = A_RAD * T_HOHLRAUM**4
            # first interior cell values
            E_0 = Ug[iE, g]
            F_0 = Ug[iFx, g]
            F_bdry = 0.5 * C * E_inc - 0.5 * (C * E_0 + 2.0 * F_0)
            sl = slice(0, g)
        else:
            E_inc = A_RAD * T_INITIAL**4
            F_bdry = jnp.zeros_like(Ug[iE, -1])
            sl = slice(Ug.shape[1] - g, Ug.shape[1])

        Ug = Ug.at[iE, sl].set(E_inc)
        Ug = Ug.at[iFx, sl].set(F_bdry)
        Ug = Ug.at[iFy, sl].set(0.0)
        Ug = Ug.at[iFz, sl].set(0.0)
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
        Erad0 = A_RAD * T_INITIAL**4
        U = jnp.zeros((layout.nvar, *shape))
        U = U.at[RHO].set(RHO0)
        U = U.at[EGAS].set(Egas0)
        U = U.at[EINT].set(Egas0)
        U = U.at[layout.rad_index(0, 0)].set(Erad0)
        return U
