"""Vaytet et al. (2013) multigroup Marshak wave benchmark (RadMarshakVaytet).

Rebuild of the reference's RadMarshakVaytet problem
(``src/problems/RadMarshakVaytet/test_radiation_marshak_Vaytet.cpp`` +
``tests/MarshakVaytet.in``): a 1000 K surface drives a frequency-dependent
Marshak wave into cold (300 K) gas with kappa(nu) = 2000 (nu/4e13)^-2
cm^2/g (the reference's `the_model = 10` with the PPL full-spectrum
opacity model), 4 photon groups log-spaced over nu = 6e10..6e14 Hz,
c_hat = c, rho = 1e-3, rho*C_V = 1e-3 erg/cm^3/K, Dirichlet multigroup
Planck ghosts at both ends.

The reference runs this as a benchmark (its exact-solution comparison is
commented out; outputs are written for offline comparison to Vaytet's
published profiles).  The physics asserted in tests: the wave heats the
near-wall gas toward T_L, the far field stays cold, T is monotone, and
the near-wall group spectrum matches the Planck fractions of T_L.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..eos import A_RAD_CGS, C_LIGHT_CGS, K_BOLTZMANN_CGS
from ..indices import EGAS, EINT, MX1, RHO
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

H_PLANCK = 6.62607015e-27  # erg s

N_GROUPS = 4
GROUP_EDGES_HZ = (6.0e10, 6.0e11, 6.0e12, 6.0e13, 6.0e14)
KAPPA0 = 2000.0       # cm^2/g at nu_pivot
NU_PIVOT = 4.0e13     # Hz; kappa = kappa0 (nu/nu_pivot)^-2
ALPHA_KAPPA = -2.0

RHO0 = 1.0e-3         # g/cm^3
T_INITIAL = 300.0     # K
T_L = 1000.0          # K (hot wall)
T_R = 300.0           # K
RHO_C_V = 1.0e-3      # erg cm^-3 K^-1
C_V = RHO_C_V / RHO0  # = 1 erg/g/K
GAMMA = 5.0 / 3.0
MU = (1.0 / (GAMMA - 1.0)) * K_BOLTZMANN_CGS / C_V
ERAD_FLOOR = A_RAD_CGS * T_INITIAL**4 * 1e-20


@register_problem
class RadMarshakVaytetProblem(Problem):
    name = "RadMarshakVaytet"
    physics = PhysicsTraits(hydro_enabled=False, radiation_enabled=True,
                            n_groups=N_GROUPS)
    eos_traits = EOSTraits(gamma=GAMMA, mean_molecular_weight=MU,
                           boltzmann_constant=K_BOLTZMANN_CGS)
    rad = RadTraits(
        c_light=C_LIGHT_CGS, c_hat=C_LIGHT_CGS,
        radiation_constant=A_RAD_CGS, Erad_floor=ERAD_FLOOR, beta_order=0,
        group_edges=GROUP_EDGES_HZ, energy_unit=H_PLANCK,
    )
    bcs = BCSpec(x=(BC_USER, BC_USER), y=(BC_PERIODIC, BC_PERIODIC),
                 z=(BC_PERIODIC, BC_PERIODIC))

    def __init__(self):
        super().__init__()
        # Dirichlet ghost spectra, precomputed (fill runs under jit tracing)
        self._Erad_L = np.asarray(planck_energy_fractions(
            GROUP_EDGES_HZ, jnp.asarray(T_L), K_BOLTZMANN_CGS, H_PLANCK
        )) * A_RAD_CGS * T_L**4
        self._Erad_R = np.asarray(planck_energy_fractions(
            GROUP_EDGES_HZ, jnp.asarray(T_R), K_BOLTZMANN_CGS, H_PLANCK
        )) * A_RAD_CGS * T_R**4

    def define_opacity_exponents_and_lower_values(self, boundaries, rho, T):
        """kappa(nu) = kappa0 (nu/nu_pivot)^-2: exponent -2 everywhere,
        values at the group lower edges (reference `the_model = 10` branch,
        ``test_radiation_marshak_Vaytet.cpp:154-165``)."""
        ks = [KAPPA0 * (boundaries[g] / NU_PIVOT) ** ALPHA_KAPPA
              * jnp.ones_like(rho) for g in range(N_GROUPS)]
        k = jnp.stack(ks)
        return jnp.full_like(k, ALPHA_KAPPA), k

    def compute_group_opacities(self, boundaries, rho, T):
        ks = [KAPPA0 * ((boundaries[g] * boundaries[g + 1]) ** 0.5
                        / NU_PIVOT) ** ALPHA_KAPPA * jnp.ones_like(rho)
              for g in range(N_GROUPS)]
        return jnp.stack(ks)

    def fill_user_boundary(self, Ug, grid, ng, time, axis, side):
        """Fixed multigroup Planck ghosts at T_L / T_R (reference
        `setCustomBoundaryConditions`,
        ``test_radiation_marshak_Vaytet.cpp:170-232``)."""
        if axis != 0:
            return Ug
        layout = self.physics.layout()
        eos = self.make_eos()
        g = ng[0]
        if side == 0:
            sl = slice(0, g)
            Erad_g = self._Erad_L
        else:
            sl = slice(Ug.shape[1] - g, Ug.shape[1])
            Erad_g = self._Erad_R
        Egas_bc = eos.eint_from_tgas(RHO0, T_INITIAL)
        for grp in range(N_GROUPS):
            iE = layout.rad_index(grp, 0)
            Ug = Ug.at[iE, sl].set(float(Erad_g[grp]))
            Ug = Ug.at[iE + 1, sl].set(0.0)
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
        fr = planck_energy_fractions(GROUP_EDGES_HZ, jnp.full(shape, T_INITIAL),
                                     K_BOLTZMANN_CGS, H_PLANCK)
        U = jnp.zeros((layout.nvar, *shape))
        U = U.at[RHO].set(RHO0)
        U = U.at[EGAS].set(Egas0)
        U = U.at[EINT].set(Egas0)
        for grp in range(N_GROUPS):
            U = U.at[layout.rad_index(grp, 0)].set(
                jnp.maximum(fr[grp] * A_RAD_CGS * T_INITIAL**4, ERAD_FLOOR))
        return U
