"""Radiation pressure tube: static two-group RHD equilibrium (RadTube).

Rebuild of the reference's RadTube problem
(``src/problems/RadTube/test_radiation_tube.cpp``): a tube in combined
hydrostatic and radiative equilibrium (Krumholz et al. 2007-style), with
two photon groups (piecewise-constant opacity kappa = 100 cm^2/g),
Dirichlet ends pinned to (rho0, T0) and (rho1, T1), Tgas = Trad, and zero
velocity.  A correct RHD solver must hold the equilibrium: after one
sound-crossing time the gas temperature profile stays within 0.3% rel-L1
of the initial profile (``test_radiation_tube.cpp:385-401``).

The reference interpolates its initial profile from
``extern/pressure_tube/initial_conditions.txt``; here the same profile is
generated in-process by shooting on the steady-state equations

    d(T^4)/dx     = C1 * rho          (constant diffusive flux)
    d(P_gas)/dx   = -(a_rad/3) d(T^4)/dx   (momentum balance)

with C1 adjusted so T(L) = T1; the emergent rho(L) reproduces the
reference's rho1 = 2.1940 to ~1e-3, which the test asserts.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..eos import A_RAD_CGS, C_LIGHT_CGS, K_BOLTZMANN_CGS, M_U_CGS
from ..indices import EGAS, EINT, RHO
from ..radiation.planck import planck_energy_fractions
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

KAPPA0 = 100.0          # cm^2/g
MU = 2.33 * M_U_CGS
GAMMA = 5.0 / 3.0
RHO0 = 1.0
T0 = 2.75e7
RHO1 = 2.1940476649492044
T1 = 2.2609633884436745e7
A0 = 4.0295519855200705e7  # cm/s
LX = 128.0
N_GROUPS = 2
GROUP_EDGES_K = (0.01 * T0, 3.3 * T0, 1000.0 * T0)  # Kelvin (energy_unit k_B)


def equilibrium_tube_profile(n: int = 2048):
    """(x, rho, T) of the steady tube via shooting on C1."""
    x = np.linspace(0.0, LX, n)
    kB_mu = K_BOLTZMANN_CGS / MU

    def derivs(T, rho, C1):
        dT4 = C1 * rho
        dT = dT4 / (4.0 * T**3)
        dP = -(A_RAD_CGS / 3.0) * dT4
        drho = (dP - rho * kB_mu * dT) / (kB_mu * T)
        return dT, drho

    def integrate(C1):
        T = np.empty(n)
        rho = np.empty(n)
        T[0], rho[0] = T0, RHO0
        for i in range(n - 1):
            dx = x[i + 1] - x[i]
            dT1, dr1 = derivs(T[i], rho[i], C1)
            dT2, dr2 = derivs(T[i] + 0.5 * dx * dT1, rho[i] + 0.5 * dx * dr1, C1)
            T[i + 1] = T[i] + dx * dT2
            rho[i + 1] = rho[i] + dx * dr2
        return T, rho

    # bracket C1 (negative: T decreases left->right)
    scale = (T1**4 - T0**4) / (LX * 1.5)
    lo, hi = 4.0 * scale, 0.25 * scale  # both negative; lo more negative
    for _ in range(60):
        mid = 0.5 * (lo + hi)
        T, rho = integrate(mid)
        if T[-1] < T1:
            lo = mid  # overshot downward: too negative
        else:
            hi = mid
    T, rho = integrate(0.5 * (lo + hi))
    return x, rho, T


@register_problem
class RadTubeProblem(Problem):
    name = "RadTube"
    physics = PhysicsTraits(hydro_enabled=True, radiation_enabled=True,
                            n_groups=N_GROUPS)
    eos_traits = EOSTraits(gamma=GAMMA, mean_molecular_weight=MU,
                           boltzmann_constant=K_BOLTZMANN_CGS)
    rad = RadTraits(
        c_light=C_LIGHT_CGS, c_hat=10.0 * A0, radiation_constant=A_RAD_CGS,
        Erad_floor=0.0, beta_order=1, group_edges=GROUP_EDGES_K,
        energy_unit=K_BOLTZMANN_CGS,
    )
    bcs = BCSpec(x=(BC_USER, BC_USER), y=(BC_PERIODIC, BC_PERIODIC),
                 z=(BC_PERIODIC, BC_PERIODIC))

    def compute_group_opacities(self, boundaries, rho, T):
        return jnp.full((N_GROUPS, *rho.shape), KAPPA0, rho.dtype)

    def __init__(self):
        super().__init__()
        # boundary Planck fractions precomputed eagerly (fill_user_boundary
        # runs inside jit tracing, where they must be constants)
        self._fr_T0 = np.asarray(planck_energy_fractions(
            GROUP_EDGES_K, jnp.asarray(T0), K_BOLTZMANN_CGS, K_BOLTZMANN_CGS))
        self._fr_T1 = np.asarray(planck_energy_fractions(
            GROUP_EDGES_K, jnp.asarray(T1), K_BOLTZMANN_CGS, K_BOLTZMANN_CGS))

    def _boundary_fractions(self, T):
        return self._fr_T0 if T == T0 else self._fr_T1

    def fill_user_boundary(self, Ug, grid, ng, time, axis, side):
        """Dirichlet ends (reference `setCustomBoundaryConditions`,
        ``test_radiation_tube.cpp:196-256``): rho/T pinned, radiation energy
        pinned to aT^4 split by the Planck fractions, Frad copied from the
        first interior cell."""
        if axis != 0:
            return Ug
        layout = self.physics.layout()
        g = ng[0]
        if side == 0:
            sl, edge = slice(0, g), g
            rho_b, T_b = RHO0, T0
        else:
            sl, edge = slice(Ug.shape[1] - g, Ug.shape[1]), Ug.shape[1] - g - 1
            rho_b, T_b = RHO1, T1
        fr = self._boundary_fractions(T_b)
        Egas = (K_BOLTZMANN_CGS / MU) * rho_b * T_b / (GAMMA - 1.0)
        Erad_tot = A_RAD_CGS * T_b**4

        mom_edge = Ug[1, edge]
        Ug = Ug.at[RHO, sl].set(rho_b)
        Ug = Ug.at[1, sl].set(mom_edge[None])
        Ug = Ug.at[2, sl].set(0.0)
        Ug = Ug.at[3, sl].set(0.0)
        Ug = Ug.at[EGAS, sl].set(Egas + 0.5 * mom_edge[None] ** 2 / rho_b)
        Ug = Ug.at[EINT, sl].set(Egas)
        for grp in range(N_GROUPS):
            iE = layout.rad_index(grp, 0)
            F_edge = Ug[layout.rad_index(grp, 1), edge]
            Ug = Ug.at[iE, sl].set(float(fr[grp]) * Erad_tot)
            Ug = Ug.at[iE + 1, sl].set(F_edge[None])
            Ug = Ug.at[iE + 2, sl].set(0.0)
            Ug = Ug.at[iE + 3, sl].set(0.0)
        return Ug

    def set_initial_conditions(self, grid):
        layout = self.physics.layout()
        shape = grid.n_cell
        xt, rhot, Tt = equilibrium_tube_profile()
        x, _y, _z = grid.cell_center_mesh()
        x = jnp.broadcast_to(x, shape)
        rho = jnp.interp(x, jnp.asarray(xt), jnp.asarray(rhot))
        T = jnp.interp(x, jnp.asarray(xt), jnp.asarray(Tt))

        Pgas = rho * K_BOLTZMANN_CGS * T / MU
        Egas = Pgas / (GAMMA - 1.0)
        Erad = A_RAD_CGS * T**4
        fr = planck_energy_fractions(GROUP_EDGES_K, T, K_BOLTZMANN_CGS,
                                     K_BOLTZMANN_CGS)

        U = jnp.zeros((layout.nvar, *shape))
        U = U.at[RHO].set(rho)
        U = U.at[EGAS].set(Egas)
        U = U.at[EINT].set(Egas)
        for grp in range(N_GROUPS):
            U = U.at[layout.rad_index(grp, 0)].set(fr[grp] * Erad)
        return U
