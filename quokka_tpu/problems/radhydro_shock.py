"""Lowrie & Edwards (2008) nonequilibrium radiative shock (Mach 3, 1D).

Rebuild of the reference's RadhydroShock problem
(``src/problems/RadhydroShock/test_radhydro_shock.cpp``): dimensionless
units with P0 = a_rad = 1e-4, sigma_a = 1e6, c = sqrt(3 sigma_a) c_s0,
gamma = mu = 5/3 so c_s0 = 1 at T0 = 1. The upstream/downstream equilibrium
states are the radiative Rankine-Hugoniot values of Lowrie & Edwards
(T1 = 3.661913, rho1 = 3.002168). Fixed-state boundaries hold the two
equilibria; the shock relaxes to its stationary structure near
x = shock_position.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

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

A_RAD = 1.0e-4
SIGMA_A = 1.0e6
MACH0 = 3.0
C_S0 = 1.0
C_LIGHT = 1732.0508075688772  # sqrt(3 sigma_a) c_s0
KAPPA = SIGMA_A * (C_S0 / C_LIGHT)
GAMMA = 5.0 / 3.0
MU = GAMMA  # so c_s0 = 1 with kB = 1
K_B = C_S0 * C_S0
C_V = K_B / (MU * (GAMMA - 1.0))

T0, RHO0 = 1.0, 1.0
V0 = MACH0 * C_S0
T1 = 3.661912665809719
RHO1 = 3.0021676971081166
V1 = V0 * (RHO0 / RHO1)
CHAT = 10.0 * (V0 + C_S0)
SHOCK_POS = 0.0130
LX = 0.01578396467532876


def _state(rho, v, T):
    egas = RHO0 * 0.0 + rho * C_V * T
    erad = A_RAD * T**4
    return rho, rho * v, egas, erad


@register_problem
class RadhydroShockProblem(Problem):
    name = "RadhydroShock"
    physics = PhysicsTraits(hydro_enabled=True, radiation_enabled=True)
    eos_traits = EOSTraits(gamma=GAMMA, mean_molecular_weight=MU,
                           boltzmann_constant=K_B)
    rad = RadTraits(c_light=C_LIGHT, c_hat=CHAT, radiation_constant=A_RAD,
                    Erad_floor=0.0, beta_order=1)
    bcs = BCSpec(x=(BC_USER, BC_USER),
                 y=(BC_PERIODIC, BC_PERIODIC),
                 z=(BC_PERIODIC, BC_PERIODIC))

    def compute_planck_opacity(self, rho, T):
        return KAPPA / rho

    def compute_flux_mean_opacity(self, rho, T):
        return KAPPA / rho

    def _fill_slab(self, Ug, sl, rho, v, T):
        layout = self.physics.layout()
        egas = rho * C_V * T
        Ug = Ug.at[RHO, sl].set(rho)
        Ug = Ug.at[MX1, sl].set(rho * v)
        Ug = Ug.at[MX1 + 1, sl].set(0.0)
        Ug = Ug.at[MX1 + 2, sl].set(0.0)
        Ug = Ug.at[EGAS, sl].set(egas + 0.5 * rho * v * v)
        Ug = Ug.at[EINT, sl].set(egas)
        Ug = Ug.at[layout.rad_index(0, 0), sl].set(A_RAD * T**4)
        Ug = Ug.at[layout.rad_index(0, 1), sl].set(0.0)
        Ug = Ug.at[layout.rad_index(0, 2), sl].set(0.0)
        Ug = Ug.at[layout.rad_index(0, 3), sl].set(0.0)
        return Ug

    def fill_user_boundary(self, Ug, grid, ng, time, axis, side):
        if axis != 0:
            return Ug
        g = ng[0]
        if side == 0:
            return self._fill_slab(Ug, slice(0, g), RHO0, V0, T0)
        n = Ug.shape[1]
        return self._fill_slab(Ug, slice(n - g, n), RHO1, V1, T1)

    def set_initial_conditions(self, grid):
        x, _y, _z = grid.cell_center_mesh()
        shape = grid.n_cell
        layout = self.physics.layout()
        pre = x < SHOCK_POS
        rho = jnp.where(pre, RHO0, RHO1)
        v = jnp.where(pre, V0, V1)
        T = jnp.where(pre, T0, T1)
        egas = rho * C_V * T
        U = jnp.zeros((layout.nvar, *shape))
        U = U.at[RHO].set(jnp.broadcast_to(rho, shape))
        U = U.at[MX1].set(jnp.broadcast_to(rho * v, shape))
        U = U.at[EGAS].set(jnp.broadcast_to(egas + 0.5 * rho * v * v, shape))
        U = U.at[EINT].set(jnp.broadcast_to(egas, shape))
        U = U.at[layout.rad_index(0, 0)].set(jnp.broadcast_to(A_RAD * T**4, shape))
        return U


# ---------------------------------------------------------------- CGS variant
# (reference ``src/problems/RadhydroShockCGS/test_radhydro_shock_cgs.cpp``:
# the same Lowrie & Edwards Mach-3 shock in physical units)
A_RAD_C = 7.5646e-15
C_C = 2.99792458e10
K_B_C = 1.380649e-16
MU_C = 1.673532619e-24  # m_p + m_e
CS0_C = 1.73e7
KAPPA_RHO_C = 577.0  # rho*kappa [1/cm]
C_V_C = K_B_C / (MU_C * (GAMMA - 1.0))
T0_C, RHO0_C, V0_C = 2.18e6, 5.69, 5.19e7
T1_C, RHO1_C, V1_C = 7.98e6, 17.1, 1.73e7
CHAT_C = 10.0 * (V0_C + CS0_C)
SHOCK_POS_C = 0.01305
LX_C = 0.01575


@register_problem
class RadhydroShockCGSProblem(Problem):
    """CGS Lowrie-Edwards shock (reference RadhydroShockCGS).  Like the
    reference we hold the radiative Rankine-Hugoniot equilibria at the
    boundaries; the reference also forces the Eddington closure chi = 1/3
    -- here the full M1 closure is kept (it limits to 1/3 in this
    diffusive regime)."""

    name = "RadhydroShockCGS"
    physics = PhysicsTraits(hydro_enabled=True, radiation_enabled=True)
    eos_traits = EOSTraits(gamma=GAMMA, mean_molecular_weight=MU_C,
                           boltzmann_constant=K_B_C)
    rad = RadTraits(c_light=C_C, c_hat=CHAT_C, radiation_constant=A_RAD_C,
                    Erad_floor=0.0, beta_order=1)
    bcs = BCSpec(x=(BC_USER, BC_USER),
                 y=(BC_PERIODIC, BC_PERIODIC),
                 z=(BC_PERIODIC, BC_PERIODIC))

    n_groups = 1
    arad = A_RAD_C
    cv = C_V_C
    consts = (T0_C, RHO0_C, V0_C, T1_C, RHO1_C, V1_C, SHOCK_POS_C)

    def compute_planck_opacity(self, rho, T):
        return KAPPA_RHO_C / rho

    def compute_flux_mean_opacity(self, rho, T):
        return KAPPA_RHO_C / rho

    def _erad_groups(self, T, shape):
        """Total aT^4 split across groups ([G, ...])."""
        return jnp.broadcast_to(self.arad * T**4, shape)[None]

    def _erad_groups_scalar(self, T: float):
        """Boundary-slab group energies, precomputed eagerly (the ghost
        fill runs under jit tracing)."""
        return np.asarray([self.arad * T**4])

    def _fill_slab(self, Ug, sl, rho, v, T):
        layout = self.physics.layout()
        egas = rho * self.cv * T
        Ug = Ug.at[RHO, sl].set(rho)
        Ug = Ug.at[MX1, sl].set(rho * v)
        Ug = Ug.at[MX1 + 1, sl].set(0.0)
        Ug = Ug.at[MX1 + 2, sl].set(0.0)
        Ug = Ug.at[EGAS, sl].set(egas + 0.5 * rho * v * v)
        Ug = Ug.at[EINT, sl].set(egas)
        Eg = self._erad_groups_scalar(T)
        for g in range(self.physics.n_groups):
            iE = layout.rad_index(g, 0)
            Ug = Ug.at[iE, sl].set(float(Eg[g]))
            Ug = Ug.at[iE + 1, sl].set(0.0)
            Ug = Ug.at[iE + 2, sl].set(0.0)
            Ug = Ug.at[iE + 3, sl].set(0.0)
        return Ug

    def fill_user_boundary(self, Ug, grid, ng, time, axis, side):
        if axis != 0:
            return Ug
        T0_, RHO0_, V0_, T1_, RHO1_, V1_, _sp = self.consts
        g = ng[0]
        if side == 0:
            return self._fill_slab(Ug, slice(0, g), RHO0_, V0_, T0_)
        n = Ug.shape[1]
        return self._fill_slab(Ug, slice(n - g, n), RHO1_, V1_, T1_)

    def set_initial_conditions(self, grid):
        T0_, RHO0_, V0_, T1_, RHO1_, V1_, sp = self.consts
        x, _y, _z = grid.cell_center_mesh()
        shape = grid.n_cell
        layout = self.physics.layout()
        pre = x < sp
        rho = jnp.broadcast_to(jnp.where(pre, RHO0_, RHO1_), shape)
        v = jnp.broadcast_to(jnp.where(pre, V0_, V1_), shape)
        T = jnp.broadcast_to(jnp.where(pre, T0_, T1_), shape)
        egas = rho * self.cv * T
        U = jnp.zeros((layout.nvar, *shape))
        U = U.at[RHO].set(rho)
        U = U.at[MX1].set(rho * v)
        U = U.at[EGAS].set(egas + 0.5 * rho * v * v)
        U = U.at[EINT].set(egas)
        Eg = self._erad_groups(T, shape)
        for g in range(self.physics.n_groups):
            U = U.at[layout.rad_index(g, 0)].set(Eg[g])
        return U


# --------------------------------------------------------- multigroup variant
# (reference ``src/problems/RadhydroShockMultigroup``: same shock, 5 photon
# groups log-spaced over nu = 1e15..1e20 Hz, PPL fixed-slope opacity)
H_PLANCK_C = 6.62607015e-27
SHOCK_MG_EDGES = (1.0e15, 1.0e16, 1.0e17, 1.0e18, 1.0e19, 1.0e20)


@register_problem
class RadhydroShockMultigroupProblem(RadhydroShockCGSProblem):
    name = "RadhydroShockMultigroup"
    physics = PhysicsTraits(hydro_enabled=True, radiation_enabled=True,
                            n_groups=5)
    rad = RadTraits(c_light=C_C, c_hat=CHAT_C, radiation_constant=A_RAD_C,
                    Erad_floor=1.0e-10 * A_RAD_C * T0_C**4, beta_order=1,
                    group_edges=SHOCK_MG_EDGES, energy_unit=H_PLANCK_C)

    def define_opacity_exponents_and_lower_values(self, boundaries, rho, T):
        k = jnp.broadcast_to(KAPPA_RHO_C / rho, (5, *jnp.shape(rho)))
        return jnp.zeros_like(k), k

    def compute_group_opacities(self, boundaries, rho, T):
        return jnp.broadcast_to(KAPPA_RHO_C / rho, (5, *jnp.shape(rho)))

    def _erad_groups(self, T, shape):
        from ..radiation.planck import planck_energy_fractions

        fr = jnp.maximum(
            planck_energy_fractions(SHOCK_MG_EDGES, T, K_B_C, H_PLANCK_C), 0.0)
        E = fr * jnp.broadcast_to(self.arad * T**4, jnp.shape(fr))
        return jnp.maximum(E, self.rad.Erad_floor)

    def __init__(self):
        super().__init__()
        # boundary spectra precomputed EAGERLY: the ghost fill runs under
        # jit tracing, where planck_energy_fractions would be staged and
        # np.asarray would fail on the tracer
        from ..radiation.planck import planck_energy_fractions

        self._bdry_cache = {}
        for T in (T0_C, T1_C):
            fr = np.asarray(planck_energy_fractions(
                SHOCK_MG_EDGES, jnp.asarray(T), K_B_C, H_PLANCK_C))
            # the tabulated Planck integral saturates for x >> 1, which can
            # leave a roundoff-negative fraction in a near-empty group
            fr = np.maximum(fr, 0.0)
            self._bdry_cache[T] = fr * (self.arad * T**4) + 1e-300

    def _erad_groups_scalar(self, T: float):
        return self._bdry_cache[T]
