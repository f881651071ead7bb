"""Su & Olson (1996) non-equilibrium Marshak wave with a volume source (1D).

Rebuild of the reference's RadSuOlson problem
(``src/problems/RadSuOlson/test_radiation_SuOlson.cpp``): radiation-only,
dimensionless units (c = chat = a = 1), epsilon = 1 so the matter heat
capacity is alpha T^3 with alpha = 4a/eps, unit opacity (rho kappa = 1), and
a constant radiation energy source S = Q a T_h^4 in x < x0 switched on for
t < t0. The semi-analytic transport solution is tabulated in Su & Olson
(1996), JQSRT 56, 337 (their Tables); the reference checks the tau = 10
epoch against those values with a 3% L1 tolerance.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp

from ..indices import EGAS, EINT, RHO
from ..registry import (
    BC_REFLECT,
    BCSpec,
    EOSTraits,
    PhysicsTraits,
    Problem,
    RadTraits,
    register_problem,
)

EPS_SUOLSON = 1.0
KAPPA = 1.0
RHO0 = 1.0
T_HOHLRAUM = 1.0
X0 = 0.5
T0_SRC = 10.0
A_RAD = 1.0
C = 1.0
ALPHA_SUOLSON = 4.0 * A_RAD / EPS_SUOLSON
Q_SRC = 1.0 / (2.0 * X0)
S_SRC = Q_SRC * A_RAD * T_HOHLRAUM**4

# Su & Olson (1996) semi-analytic *transport* solution, tau = 10 epoch
# (dimensionless positions and energy densities; published Table values)
XS_EXACT = (0.01, 0.1, 0.17783, 0.31623, 0.45, 0.5, 0.56234, 0.75,
            1.0, 1.33352, 1.77828, 3.16228, 5.62341)
ERAD_EXACT_T10 = (2.23575, 2.21944, 2.18344, 2.06448, 1.86072, 1.73178,
                  1.57496, 1.27398, 0.98782, 0.70822, 0.45016, 0.09673,
                  0.00375)
EGAS_EXACT_T10 = (2.11186, 2.09585, 2.06052, 1.94365, 1.74291, 1.61536,
                  1.46027, 1.16591, 0.88992, 0.62521, 0.38688, 0.07642,
                  0.00253)


@dataclass(frozen=True)
class SuOlsonEOS:
    """Egas = (alpha/4) T^4 so that cv = alpha T^3 (the Su & Olson ansatz)."""

    alpha: float = ALPHA_SUOLSON
    is_isothermal: bool = False

    def tgas_from_eint(self, rho, eint):
        return (4.0 * eint / self.alpha) ** 0.25

    def eint_from_tgas(self, rho, T):
        return (self.alpha / 4.0) * T**4

    def eint_temp_derivative(self, rho, T):
        return self.alpha * T**3


@register_problem
class RadSuOlsonProblem(Problem):
    name = "RadSuOlson"
    physics = PhysicsTraits(hydro_enabled=False, radiation_enabled=True)
    eos_traits = EOSTraits(gamma=5.0 / 3.0, mean_molecular_weight=1.0,
                           boltzmann_constant=1.0)
    rad = RadTraits(c_light=C, c_hat=C, radiation_constant=A_RAD,
                    Erad_floor=0.0, beta_order=0)
    bcs = BCSpec(
        x=(BC_REFLECT, BC_REFLECT),
        y=(BC_REFLECT, BC_REFLECT),
        z=(BC_REFLECT, BC_REFLECT),
    )

    def make_eos(self):
        return SuOlsonEOS()

    def compute_planck_opacity(self, rho, T):
        return KAPPA / rho

    def compute_flux_mean_opacity(self, rho, T):
        return KAPPA / rho

    def set_radiation_energy_source(self, grid, time):
        # volume-fraction-weighted source in x < x0, on for t < t0
        # (reference SetRadEnergySource, test_radiation_SuOlson.cpp:120-145)
        x, _y, _z = grid.cell_center_mesh()
        dx = grid.dx[0]
        xl = x - 0.5 * dx
        xr = x + 0.5 * dx
        frac = jnp.clip((X0 - xl) / dx, 0.0, 1.0)
        src = S_SRC * frac
        src = jnp.broadcast_to(src, grid.n_cell)
        return jnp.where(time < T0_SRC, src, 0.0)

    def set_initial_conditions(self, grid):
        shape = grid.n_cell
        layout = self.physics.layout()
        eos = self.make_eos()
        Egas0 = 1.0e-10 * eos.eint_from_tgas(RHO0, T_HOHLRAUM)
        Erad0 = 1.0e-10 * A_RAD * T_HOHLRAUM**4
        U = jnp.zeros((layout.nvar, *shape))
        U = U.at[RHO].set(RHO0)
        U = U.at[EGAS].set(Egas0)
        U = U.at[EINT].set(Egas0)
        U = U.at[layout.rad_index(0, 0)].set(Erad0)
        return U

    @staticmethod
    def exact_tables_t10(x):
        """Su & Olson tau = 10 transport (Erad, Egas) interpolated onto x."""
        erad = jnp.interp(x, jnp.asarray(XS_EXACT), jnp.asarray(ERAD_EXACT_T10),
                          right=0.0)
        egas = jnp.interp(x, jnp.asarray(XS_EXACT), jnp.asarray(EGAS_EXACT_T10),
                          right=0.0)
        return erad, egas
