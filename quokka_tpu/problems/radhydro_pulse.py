"""Advecting radiation pulse in the diffusion regime (1D, CGS).

Rebuild of the reference's RadhydroPulse problem
(``src/problems/RadhydroPulse/test_radhydro_pulse.cpp``): a Gaussian
temperature pulse in pressure balance (gas + radiation pressure constant,
rho(x) = rho0 T0/T + (a mu / 3 k_B)(T0^4/T - T^3)) with tau = 2e3 per
pulse width (static diffusion) and optional advection at v0 = 1e6 cm/s
(beta tau = 6e-2). The acceptance criterion is frame invariance: the
advected pulse, shifted back by v0 t, must match the comoving solution
(and Tgas must track Trad) -- the test of the O(beta tau) work terms.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..indices import EGAS, EINT, MX1, RHO
from ..registry import (
    BCSpec, EOSTraits, PhysicsTraits, Problem, RadTraits, register_problem,
)

C_CGS = 2.99792458e10
A_RAD = 7.565731356724124e-15
K_B = 1.380649e-16
M_U = 1.66053906892e-24
MU = 2.33 * M_U
T0 = 1.0e7
T1 = 2.0e7
RHO0 = 1.2
WIDTH = 24.0
KAPPA0 = 100.0
V0_ADV = 1.0e6
ERAD_FLOOR = A_RAD * T0**4 * 1.0e-10


def exact_T(x):
    return T0 + (T1 - T0) * jnp.exp(-x * x / (2.0 * WIDTH**2))


def exact_rho(x):
    T = exact_T(x)
    return RHO0 * T0 / T + (A_RAD * MU / (3.0 * K_B)) * (T0**4 / T - T**3)


@register_problem
class RadhydroPulseProblem(Problem):
    name = "RadhydroPulse"
    physics = PhysicsTraits(hydro_enabled=True, radiation_enabled=True)
    eos_traits = EOSTraits(gamma=5.0 / 3.0, mean_molecular_weight=MU,
                           boltzmann_constant=K_B)
    rad = RadTraits(c_light=C_CGS, c_hat=C_CGS, radiation_constant=A_RAD,
                    Erad_floor=ERAD_FLOOR, beta_order=1)
    bcs = BCSpec()  # periodic

    v0: float = 0.0  # set to V0_ADV for the advecting variant

    def compute_planck_opacity(self, rho, T):
        return jnp.full_like(rho, KAPPA0)

    def compute_flux_mean_opacity(self, rho, T):
        return jnp.full_like(rho, KAPPA0)

    def set_initial_conditions(self, grid):
        x, _y, _z = grid.cell_center_mesh()
        shape = grid.n_cell
        layout = self.physics.layout()
        eos = self.make_eos()
        x0 = 0.5 * (grid.prob_lo[0] + grid.prob_hi[0])
        T = jnp.broadcast_to(exact_T(x - x0), shape)
        rho = jnp.broadcast_to(exact_rho(x - x0), shape)
        Erad = A_RAD * T**4
        eint = eos.eint_from_tgas(rho, T)
        v0 = self.v0
        beta2 = (v0 / C_CGS) ** 2
        U = jnp.zeros((layout.nvar, *shape))
        U = U.at[RHO].set(rho)
        U = U.at[MX1].set(rho * v0)
        U = U.at[EGAS].set(eint + 0.5 * rho * v0 * v0)
        U = U.at[EINT].set(eint)
        # comoving -> lab frame to O(beta^2) (reference :168-176)
        U = U.at[layout.rad_index(0, 0)].set((1.0 + (4.0 / 3.0) * beta2) * Erad)
        U = U.at[layout.rad_index(0, 1)].set((4.0 / 3.0) * v0 * Erad)
        return U


# ------------------------------------------------------------------ variants
# (the reference splits the pulse across four problem dirs; the base
# RadhydroPulse above IS the "Grey" configuration, kappa0 = 100)
H_PLANCK = 6.62607015e-27
PULSE_MG_EDGES = (1.0e15, 1.0e16, 1.0e17, 1.0e18, 1.0e19)
KAPPA0_DYN = 500.0
V0_DYN = 3.0e7
NU_REF = 1.0e18
COEFF_NU = H_PLANCK * NU_REF / (K_B * T0)  # = 4.799...


@register_problem
class RadhydroPulseGreyProblem(RadhydroPulseProblem):
    """Alias configuration (reference RadhydroPulseGrey, kappa0 = 100 --
    identical to the base RadhydroPulse; registered for catalog parity)."""

    name = "RadhydroPulseGrey"


@register_problem
class RadhydroPulseDynProblem(RadhydroPulseProblem):
    """Dynamic-diffusion variant (reference RadhydroPulseDyn): kappa0 = 500,
    v0 = 3e7 cm/s, so beta tau is an order of magnitude larger and the
    radiation is advected with the gas."""

    name = "RadhydroPulseDyn"
    v0: float = V0_DYN

    def compute_planck_opacity(self, rho, T):
        return jnp.full_like(rho, KAPPA0_DYN)

    def compute_flux_mean_opacity(self, rho, T):
        return jnp.full_like(rho, KAPPA0_DYN)


def _kappa_nu(nu, T):
    """kappa(nu, T) of the MG-integrated variant (reference
    ``test_radhydro_pulse_MG_int.cpp:163-169``), in cm^2/g at rho = 1."""
    T_ = T / T0
    nu_ = nu / NU_REF
    return KAPPA0 * T_**-0.5 * nu_**-3.0 * (1.0 - jnp.exp(-COEFF_NU * nu_ / T_))


class _PulseMGBase(RadhydroPulseProblem):
    physics = PhysicsTraits(hydro_enabled=True, radiation_enabled=True,
                            n_groups=4)
    rad = RadTraits(c_light=C_CGS, c_hat=C_CGS, radiation_constant=A_RAD,
                    Erad_floor=ERAD_FLOOR / 4, beta_order=1,
                    group_edges=PULSE_MG_EDGES, energy_unit=H_PLANCK)

    def set_initial_conditions(self, grid):
        from ..radiation.planck import planck_energy_fractions

        x, _y, _z = grid.cell_center_mesh()
        shape = grid.n_cell
        layout = self.physics.layout()
        eos = self.make_eos()
        x0 = 0.5 * (grid.prob_lo[0] + grid.prob_hi[0])
        T = jnp.broadcast_to(exact_T(x - x0), shape)
        rho = jnp.broadcast_to(exact_rho(x - x0), shape)
        Erad = A_RAD * T**4
        fr = planck_energy_fractions(PULSE_MG_EDGES, T, K_B, H_PLANCK)
        eint = eos.eint_from_tgas(rho, T)
        v0 = self.v0
        beta2 = (v0 / C_CGS) ** 2
        U = jnp.zeros((layout.nvar, *shape))
        U = U.at[RHO].set(rho)
        U = U.at[MX1].set(rho * v0)
        U = U.at[EGAS].set(eint + 0.5 * rho * v0 * v0)
        U = U.at[EINT].set(eint)
        for g in range(4):
            U = U.at[layout.rad_index(g, 0)].set(
                (1.0 + (4.0 / 3.0) * beta2) * fr[g] * Erad)
            U = U.at[layout.rad_index(g, 1)].set((4.0 / 3.0) * v0 * fr[g] * Erad)
        return U


@register_problem
class RadhydroPulseMGconstProblem(_PulseMGBase):
    """4 groups with the SAME constant opacity in every group (reference
    RadhydroPulseMGconst): the group-summed solution must reproduce the
    grey pulse."""

    name = "RadhydroPulseMGconst"

    def compute_group_opacities(self, boundaries, rho, T):
        return jnp.full((4, *jnp.shape(rho)), KAPPA0, rho.dtype)


@register_problem
class RadhydroPulseMGintProblem(_PulseMGBase):
    """4 groups with the nu- and T-dependent kappa integrated by the PPL
    fixed-slope model (reference RadhydroPulseMGint: exponents from the
    log-ratio of the edge opacities, values at the group lower edges)."""

    name = "RadhydroPulseMGint"

    def define_opacity_exponents_and_lower_values(self, boundaries, rho, T):
        alphas, ks = [], []
        for g in range(4):
            k_dn = _kappa_nu(boundaries[g], T)
            k_up = _kappa_nu(boundaries[g + 1], T)
            alpha = jnp.log(k_up / k_dn) / jnp.log(boundaries[g + 1] / boundaries[g])
            alphas.append(alpha * jnp.ones_like(rho))
            ks.append(k_dn / rho)
        return jnp.stack(alphas), jnp.stack(ks)

    def compute_group_opacities(self, boundaries, rho, T):
        ks = []
        for g in range(4):
            nu_c = (boundaries[g] * boundaries[g + 1]) ** 0.5
            ks.append(_kappa_nu(nu_c, T) / rho)
        return jnp.stack(ks)
