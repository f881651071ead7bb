"""Marshak wave in the asymptotic diffusion limit (CGS, 1D).

Rebuild of the reference's RadMarshakAsymptotic problem
(``src/problems/RadMarshakAsymptotic/test_radiation_marshak_asymptotic.cpp``):
a 1 keV Marshak boundary drives a thermal wave into cold gas with
temperature-dependent opacity sigma = 300 (T/T_H)^-3 cm^-1, so cells are
very optically thick (tau_cell ~ 3 -> 1e9 ahead of the front). An HLL
scheme without the asymptotic correction over-damps the front; with the
Skinner & Ostriker (2019) wavespeed correction
(radiation.wavespeed_correction = 1) the front tracks the self-similar
diffusion solution (Zel'dovich & Raizer Ch. X).

The similarity profile T(x/x_f) is the standard tabulation (also carried
by the reference as ``extern/marshak_similarity.csv``).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..indices import EGAS, EINT, MX1, RHO
from ..registry import (
    BC_OUTFLOW,
    BC_PERIODIC,
    BC_USER,
    BCSpec,
    EOSTraits,
    PhysicsTraits,
    Problem,
    RadTraits,
    register_problem,
)

C_CGS = 2.99792458e10
A_RAD = 7.565731356724124e-15
K_B = 1.380649e-16
M_U = 1.66053906892e-24
KAPPA_H = 300.0  # cm^-1 at T = T_HOHLRAUM
RHO0 = 2.0879373766122384
T_HOHLRAUM = 1.1604448449e7  # 1 keV
T_INITIAL = 1.0e-3 * T_HOHLRAUM
ERAD_FLOOR = A_RAD * T_INITIAL**4

# self-similar Marshak-wave profile (x [cm] at t = 10 ns, T/T_H); the
# published tabulation used by the reference test
XS_EXACT = (0.009548, 0.021012, 0.042304, 0.052132, 0.060325, 0.078354,
            0.087374, 0.095578, 0.111176, 0.118574, 0.125155, 0.133410,
            0.139215, 0.141718, 0.143583, 0.147399)
TMAT_EXACT = (0.989844, 0.975781, 0.947656, 0.933594, 0.919531, 0.886719,
              0.865625, 0.844531, 0.795313, 0.764844, 0.734375, 0.675781,
              0.614844, 0.577344, 0.408594, 0.007813)


@register_problem
class RadMarshakAsymptoticProblem(Problem):
    name = "RadMarshakAsymptotic"
    physics = PhysicsTraits(hydro_enabled=False, radiation_enabled=True)
    eos_traits = EOSTraits(gamma=5.0 / 3.0, mean_molecular_weight=M_U,
                           boltzmann_constant=K_B)
    rad = RadTraits(c_light=C_CGS, c_hat=C_CGS, radiation_constant=A_RAD,
                    Erad_floor=ERAD_FLOOR, beta_order=0)
    bcs = BCSpec(x=(BC_USER, BC_OUTFLOW),
                 y=(BC_PERIODIC, BC_PERIODIC),
                 z=(BC_PERIODIC, BC_PERIODIC))

    def compute_planck_opacity(self, rho, T):
        # sigma = kappa (T/T_H)^-3 cm^-1 -> specific opacity sigma/rho
        sigma = KAPPA_H * (jnp.maximum(T, 1.0) / T_HOHLRAUM) ** -3
        return sigma / rho

    def compute_flux_mean_opacity(self, rho, T):
        return self.compute_planck_opacity(rho, T)

    def fill_user_boundary(self, Ug, grid, ng, time, axis, side):
        if axis != 0 or side != 0:
            return Ug
        layout = self.physics.layout()
        g = ng[0]
        sl = slice(0, g)
        iE = layout.rad_index(0, 0)
        iFx = layout.rad_index(0, 1)
        E_inc = A_RAD * T_HOHLRAUM**4
        E_0 = Ug[iE, g]
        F_0 = Ug[iFx, g]
        F_bdry = 0.5 * C_CGS * E_inc - 0.5 * (C_CGS * E_0 + 2.0 * F_0)
        eos = self.make_eos()
        Egas = eos.eint_from_tgas(RHO0, T_INITIAL)
        Ug = Ug.at[iE, sl].set(E_inc)
        Ug = Ug.at[iFx, sl].set(F_bdry)
        Ug = Ug.at[layout.rad_index(0, 2), sl].set(0.0)
        Ug = Ug.at[layout.rad_index(0, 3), sl].set(0.0)
        Ug = Ug.at[RHO, sl].set(RHO0)
        Ug = Ug.at[EGAS, sl].set(Egas)
        Ug = Ug.at[EINT, sl].set(Egas)
        for n in range(3):
            Ug = Ug.at[MX1 + n, sl].set(0.0)
        return Ug

    def set_initial_conditions(self, grid):
        shape = grid.n_cell
        layout = self.physics.layout()
        eos = self.make_eos()
        Egas0 = eos.eint_from_tgas(RHO0, T_INITIAL)
        U = jnp.zeros((layout.nvar, *shape))
        U = U.at[RHO].set(RHO0)
        U = U.at[EGAS].set(Egas0)
        U = U.at[EINT].set(Egas0)
        U = U.at[layout.rad_index(0, 0)].set(ERAD_FLOOR)
        return U

    @staticmethod
    def exact_Tmat(x):
        """Similarity T_mat/T_H at t = 10 ns, interpolated (0 past front)."""
        return np.interp(np.asarray(x), np.asarray(XS_EXACT),
                         np.asarray(TMAT_EXACT), right=0.0)
