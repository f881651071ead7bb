"""Streaming FUV radiation into warm dusty gas (1D, 2 groups).

Rebuild of the reference's RadMarshakDust problem
(``src/problems/RadMarshakDust/test_radiation_marshak_dust.cpp``): gas at
T = 1 with dust coupling, an FUV (group 2) streaming inflow at x-lo with
E_FUV = a T_L^4 = 100, IR opacity kappa1 = 1e10 (trapped), FUV opacity
kappa2 = 1. The exact solution behind the front (x < c t):

    E_FUV(x) = E_L exp(-rho kappa2 x)
    E_IR(x)  = E_L exp(-rho kappa2 x) (t - x)      (re-emitted by dust)
    T_gas    = 1                                   (dust keeps gas fixed)

checked at stop_time with a 1% composite L1 criterion (reference
``:230-270``). Dust-gas interaction coefficient is the runtime key
``radiation.dust_gas_interaction_coeff`` (reference deck: 1e-2).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..indices import EGAS, EINT, MX1, RHO
from ..registry import (
    BC_OUTFLOW,
    BC_PERIODIC,
    BC_USER,
    BCSpec,
    EOSTraits,
    ISMTraits,
    PhysicsTraits,
    Problem,
    RadTraits,
    register_problem,
)

C_CODE = 1.0
CHAT = 1.0
A_RAD = 1.0e10
RHO0 = 1.0
CV = 1.0
MU = 1.5 / CV  # so eint = CV * rho * T with gamma = 5/3, kB = 1
T_INIT = 1.0
T_RAD_INIT = 1.0e-5
T_RAD_L = 1.0e-2
ERAD_L = A_RAD * T_RAD_L**4  # = 100
ERAD_FLOOR = 1.0e-10
KAPPA1 = 1.0e10  # IR
KAPPA2 = 1.0  # FUV
N_GROUPS = 2
EDGES = (1.0e-10, 100.0, 1.0e4)


@register_problem
class RadMarshakDustProblem(Problem):
    name = "RadMarshakDust"
    physics = PhysicsTraits(hydro_enabled=False, radiation_enabled=True,
                            n_groups=N_GROUPS)
    eos_traits = EOSTraits(gamma=5.0 / 3.0, mean_molecular_weight=MU,
                           boltzmann_constant=1.0)
    # beta_order = 0 (reference test_radiation_marshak_dust.cpp:65): with
    # hydro disabled the FUV momentum deposition grows v without bound, and
    # any beta-order work term would feed that unphysical velocity back
    # into the energy exchange
    rad = RadTraits(c_light=C_CODE, c_hat=CHAT, radiation_constant=A_RAD,
                    Erad_floor=ERAD_FLOOR, beta_order=0, group_edges=EDGES)
    ism = ISMTraits(
        enable_dust_gas_thermal_coupling_model=True,
        enable_photoelectric_heating=False,
        dust_gas_coeff=1.0e-2,
        mean_molecular_mass=MU,
    )
    bcs = BCSpec(
        x=(BC_USER, BC_OUTFLOW),
        y=(BC_PERIODIC, BC_PERIODIC),
        z=(BC_PERIODIC, BC_PERIODIC),
    )

    def compute_group_opacities(self, boundaries, rho, T):
        return jnp.stack([jnp.full_like(rho, KAPPA1),
                          jnp.full_like(rho, KAPPA2)])

    def fill_user_boundary(self, Ug, grid, ng, time, axis, side):
        if axis != 0 or side != 0:
            return Ug
        layout = self.physics.layout()
        g = ng[0]
        sl = slice(0, g)
        # streaming inflow: FUV at E_L with F = c E; IR at the floor
        Erads = (ERAD_FLOOR, ERAD_L)
        for gi in range(N_GROUPS):
            Ug = Ug.at[layout.rad_index(gi, 0), sl].set(Erads[gi])
            Ug = Ug.at[layout.rad_index(gi, 1), sl].set(C_CODE * Erads[gi])
            Ug = Ug.at[layout.rad_index(gi, 2), sl].set(0.0)
            Ug = Ug.at[layout.rad_index(gi, 3), sl].set(0.0)
        Egas = T_INIT * CV
        Ug = Ug.at[RHO, sl].set(RHO0)
        Ug = Ug.at[EGAS, sl].set(Egas)
        Ug = Ug.at[EINT, sl].set(Egas)
        for n in range(3):
            Ug = Ug.at[MX1 + n, sl].set(0.0)
        return Ug

    def set_initial_conditions(self, grid):
        from ..radiation.planck import planck_energy_fractions

        shape = grid.n_cell
        layout = self.physics.layout()
        Egas0 = T_INIT * CV
        fr = planck_energy_fractions(EDGES, jnp.full(shape, T_RAD_INIT), 1.0, 1.0)
        U = jnp.zeros((layout.nvar, *shape))
        U = U.at[RHO].set(RHO0)
        U = U.at[EGAS].set(Egas0)
        U = U.at[EINT].set(Egas0)
        for gi in range(N_GROUPS):
            U = U.at[layout.rad_index(gi, 0)].set(
                jnp.maximum(fr[gi] * A_RAD * T_RAD_INIT**4, ERAD_FLOOR / N_GROUPS))
        return U

    @staticmethod
    def exact_solution(x, t):
        """(E_IR, E_FUV, T_gas) behind/ahead of the front at time t."""
        import numpy as np

        front = x < t
        e_fuv = np.where(front, ERAD_L * np.exp(-RHO0 * KAPPA2 * x), ERAD_FLOOR)
        e_ir = np.where(front, ERAD_L * np.exp(-RHO0 * KAPPA2 * x) * (t - x),
                        ERAD_FLOOR)
        T = np.full_like(x, T_INIT)
        return e_ir, e_fuv, T


# -------------------------------------------------------- multigroup variant
# (reference ``src/problems/RadDustMG/test_rad_dust_MG.cpp`` run with
# tests/RadDust.in): uniform gas at T = 1 with NO radiation couples to dust
# in 4 groups with a MODIFIED blackbody B_g = a_rad T x Planck fractions
# (linear in T, so "T_rad" = sum E_g / a_rad), chi = 1e4/cm, c = chat = 1e8.
# The gas-dust collision rate (coeff = 1e6) is the bottleneck, so the
# radiation field sits on the instant-equilibrium manifold E_g = B_g(T_d),
# T_d = sum E / a_rad, and the slow dynamics reduce to
#     dR/dt = Lambda_gd,   c_v dT_gas/dt = -Lambda_gd,
#     Lambda_gd = coeff sqrt(T_gas) (T_gas - R/a_rad)
# which `exact_trajectory` integrates (the reference ships the same
# trajectory as extern/data/dust/rad_dust_exact.csv; tolerance 8e-4).
DMG_C = 1.0e8
DMG_CHI = 1.0e4       # 1/cm at rho = 1
DMG_ARAD = 1.0
DMG_T0 = 1.0
DMG_CV = 1.5          # kB = mu = 1, gamma = 5/3
DMG_COEFF = 1.0e6     # tests/RadDust.in dust_gas_interaction_coeff
DMG_EDGES = (1.0e-3, 0.1, 1.0, 10.0, 1.0e3)
DMG_FLOOR = 1.0e-20 * DMG_ARAD * DMG_T0**4


@register_problem
class RadDustMGProblem(Problem):
    name = "RadDustMG"
    physics = PhysicsTraits(hydro_enabled=False, radiation_enabled=True,
                            n_groups=4)
    eos_traits = EOSTraits(gamma=5.0 / 3.0, mean_molecular_weight=1.0,
                           boltzmann_constant=1.0)
    rad = RadTraits(c_light=DMG_C, c_hat=DMG_C, radiation_constant=DMG_ARAD,
                    Erad_floor=DMG_FLOOR, beta_order=1,
                    group_edges=DMG_EDGES, energy_unit=1.0)
    ism = ISMTraits(
        enable_dust_gas_thermal_coupling_model=True,
        enable_photoelectric_heating=False,
        dust_gas_coeff=DMG_COEFF,
        mean_molecular_mass=1.0,
    )
    bcs = BCSpec()  # periodic

    def define_opacity_exponents_and_lower_values(self, boundaries, rho, T):
        k = jnp.broadcast_to(DMG_CHI / rho, (4, *jnp.shape(rho)))
        return jnp.zeros_like(k), k

    def compute_group_opacities(self, boundaries, rho, T):
        return jnp.broadcast_to(DMG_CHI / rho, (4, *jnp.shape(rho)))

    def compute_thermal_radiation_multigroup(self, T, boundaries):
        from ..radiation.planck import planck_energy_fractions

        fr = planck_energy_fractions(boundaries, T, 1.0, 1.0)
        return DMG_ARAD * T * fr

    def compute_thermal_radiation_temp_derivative_multigroup(self, T, boundaries):
        from ..radiation.planck import planck_energy_fractions

        fr = planck_energy_fractions(boundaries, T, 1.0, 1.0)
        return DMG_ARAD * fr

    @staticmethod
    def exact_trajectory(t_eval, n_sub: int = 40):
        """(T_gas, T_rad) on the slow manifold (RK4)."""
        import numpy as np

        t_eval = np.asarray(t_eval)
        T, R = DMG_T0, 0.0
        out_T, out_R = [], []
        t = 0.0
        for t_next in t_eval:
            n = max(1, int(n_sub * max(t_next - t, 0) / 1.0e-8 + 0.5))
            h = (t_next - t) / n if n else 0.0

            def rhs(T, R):
                lam = DMG_COEFF * np.sqrt(max(T, 1e-30)) * (T - R / DMG_ARAD)
                return -lam / DMG_CV, lam

            for _ in range(n):
                k1 = rhs(T, R)
                k2 = rhs(T + 0.5 * h * k1[0], R + 0.5 * h * k1[1])
                k3 = rhs(T + 0.5 * h * k2[0], R + 0.5 * h * k2[1])
                k4 = rhs(T + h * k3[0], R + h * k3[1])
                T += h / 6.0 * (k1[0] + 2 * k2[0] + 2 * k3[0] + k4[0])
                R += h / 6.0 * (k1[1] + 2 * k2[1] + 2 * k3[1] + k4[1])
            t = t_next
            out_T.append(T)
            out_R.append(R / DMG_ARAD)
        return np.asarray(out_T), np.asarray(out_R)

    def set_initial_conditions(self, grid):
        shape = grid.n_cell
        layout = self.physics.layout()
        eint = DMG_CV * DMG_T0 * jnp.ones(shape)
        U = jnp.zeros((layout.nvar, *shape))
        U = U.at[RHO].set(1.0)
        U = U.at[EGAS].set(eint)
        U = U.at[EINT].set(eint)
        for g in range(4):
            U = U.at[layout.rad_index(g, 0)].set(DMG_FLOOR)
        return U


# ------------------------------------------------------- single-group variant
# (reference ``src/problems/RadDust/test_rad_dust.cpp`` run with
# tests/RadDust.in): the same uniform gas-dust-radiation relaxation as
# RadDustMG but through the SINGLE-group dust solver, with the linearized
# emission B(T_d) = a_rad T_d (test_rad_dust.cpp:82-92).  The radiation-dust
# coupling (c chi = 1e12/s) is instantaneous on the step scale, so the slow
# dynamics reduce to the same manifold as RadDustMG and `exact_trajectory`
# applies unchanged (the reference validates both against the same
# extern/data/dust/rad_dust_exact.csv trajectory; tolerance 8e-4).
@register_problem
class RadDustProblem(Problem):
    name = "RadDust"
    physics = PhysicsTraits(hydro_enabled=True, radiation_enabled=True,
                            n_groups=1)
    eos_traits = EOSTraits(gamma=5.0 / 3.0, mean_molecular_weight=1.0,
                           boltzmann_constant=1.0)
    rad = RadTraits(c_light=DMG_C, c_hat=DMG_C, radiation_constant=DMG_ARAD,
                    Erad_floor=DMG_FLOOR, beta_order=1)
    ism = ISMTraits(
        enable_dust_gas_thermal_coupling_model=True,
        enable_photoelectric_heating=False,
        dust_gas_coeff=DMG_COEFF,  # tests/RadDust.in
        mean_molecular_mass=1.0,
    )
    bcs = BCSpec()  # periodic

    def compute_group_opacities(self, boundaries, rho, T):
        return (DMG_CHI / rho)[None]

    def compute_planck_opacity(self, rho, T):
        return DMG_CHI / rho

    compute_energy_opacity = compute_planck_opacity
    compute_flux_opacity = compute_planck_opacity

    def compute_thermal_radiation_multigroup(self, T, boundaries):
        return (DMG_ARAD * T)[None]

    def compute_thermal_radiation_temp_derivative_multigroup(self, T, boundaries):
        return (DMG_ARAD * jnp.ones_like(T))[None]

    exact_trajectory = staticmethod(RadDustMGProblem.exact_trajectory)

    def set_initial_conditions(self, grid):
        shape = grid.n_cell
        layout = self.physics.layout()
        eint = DMG_CV * DMG_T0 * jnp.ones(shape)
        U = jnp.zeros((layout.nvar, *shape))
        U = U.at[RHO].set(1.0)
        U = U.at[EGAS].set(eint)
        U = U.at[EINT].set(eint)
        U = U.at[layout.rad_index(0, 0)].set(DMG_FLOOR)
        return U
