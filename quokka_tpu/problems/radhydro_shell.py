"""Radiation-pressure-driven shell (the reference's scaling benchmark).

Rebuild of ``src/problems/RadhydroShell/test_radhydro_shell.cpp`` +
``tests/radhydro_shell_256.in``: a 10^6 Msun GMC with half its mass in a
Gaussian shell at r0 = 5 pc, driven by a central point-like radiation
source (L = 2e42 erg/s deposited as a Gaussian of width 0.3 r0), constant
specific opacity kappa = 20 cm^2/g, reduced speed of light chat = 860 a0.

TPU-first change vs the reference: the problem is expressed in CODE UNITS
(length r0, velocity a0, density rho_0 = 3 M_shell/(4 pi r0^3), energy
density rho_0 a0^2, temperature in Kelvin) so that every intermediate of
the f32 production path stays well inside the float32 exponent range --
the raw CGS state (rho ~ 1e-19 g/cm^3, rho^2 ~ 1e-38) underflows f32.
All physics parameters below are the exact CGS values scaled by these
units; the dynamics is identical to the reference's CGS run in f64.

The reference initializes Erad(r), Frad(r) from a semi-analytic profile
read from ``extern/dust_shell/initial_conditions.txt``; here the same
profile is generated in-process by integrating the steady-state gray
moment equation with the M1 closure inward from the free-streaming outer
boundary:

    d(chi E)/dr + (3 chi - 1) E / r = -(kappa rho / c) F,
    F(r) = L_enc(r) / (4 pi r^2),   L_enc = L* x (enclosed Gaussian),
    chi(f) = (3 + 4 f^2) / (5 + 2 sqrt(4 - 3 f^2)),  f = F / (c E).

Pass criterion follows the reference (a benchmark: runs N steps, stays
finite); the physics signature asserted in tests is net outward radial
momentum injection by radiation pressure.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..eos import A_RAD_CGS, C_LIGHT_CGS, K_BOLTZMANN_CGS, M_U_CGS
from ..indices import EGAS, EINT, RHO
from ..registry import (
    BC_PERIODIC,
    BCSpec,
    EOSTraits,
    PhysicsTraits,
    Problem,
    RadTraits,
    register_problem,
)

MSUN = 2.0e33
PARSEC = 3.086e18

A0_CGS = 2.0e5          # reference sound speed [cm/s]
GAMMA = 5.0 / 3.0
MU_CGS = 2.2 * M_U_CGS

SPECIFIC_LUM = 2000.0   # erg/s/g
GMC_MASS = 1.0e6 * MSUN
EPSILON = 0.5
M_SHELL = (1.0 - EPSILON) * GMC_MASS
L_STAR_CGS = EPSILON * GMC_MASS * SPECIFIC_LUM

R_0_CGS = 5.0 * PARSEC
RHO_0_CGS = M_SHELL / ((4.0 / 3.0) * np.pi * R_0_CGS**3)

# ----- code units: length R_0, velocity A0, density RHO_0, T in Kelvin
L_UNIT = R_0_CGS
V_UNIT = A0_CGS
RHO_UNIT = RHO_0_CGS
T_UNIT_S = L_UNIT / V_UNIT                 # time unit [s]
EDEN_UNIT = RHO_UNIT * V_UNIT**2           # energy density unit [erg/cm^3]

# scaled physics parameters
C_CODE = C_LIGHT_CGS / V_UNIT              # ~1.5e5
CHAT_CODE = 860.0                          # chat = 860 a0 exactly
A_RAD_CODE = A_RAD_CGS / EDEN_UNIT         # per K^4
KAPPA_CODE = 20.0 * RHO_UNIT * L_UNIT      # optical depth per (rho' dx')
C_V_CODE = (K_BOLTZMANN_CGS / (MU_CGS * (GAMMA - 1.0))) / V_UNIT**2
# gamma-law EOS with kB'=1 and mu' chosen so c_v = C_V_CODE
MU_CODE = 1.0 / ((GAMMA - 1.0) * C_V_CODE)

SIGMA_STAR = 0.3        # code units (0.3 r0)
H_SHELL = 0.3
R_0 = 1.0
RHO_0 = 1.0
# source normalization (1/c) L* / (2 pi sigma*^2)^1.5, scaled to
# [energy density / length] code units
SOURCE_NORM = ((1.0 / C_LIGHT_CGS) * L_STAR_CGS
               / (2.0 * np.pi * (SIGMA_STAR * L_UNIT) ** 2) ** 1.5
               ) * L_UNIT / EDEN_UNIT


def _erf(x):
    # Abramowitz-Stegun 7.1.26 (avoids a scipy dependency)
    a1, a2, a3, a4, a5 = (0.254829592, -0.284496736, 1.421413741,
                          -1.453152027, 1.061405429)
    p = 0.3275911
    sign = np.sign(x)
    x = np.abs(x)
    t = 1.0 / (1.0 + p * x)
    y = 1.0 - (((((a5 * t + a4) * t) + a3) * t + a2) * t + a1) * t * np.exp(-x * x)
    return sign * y


def _shell_density(r):
    """Shell density in code units (rho' = rho/RHO_0_CGS)."""
    sigma_sh = H_SHELL / (2.0 * np.sqrt(2.0 * np.log(2.0)))
    # M_shell/(4 pi r^2 sqrt(2 pi sig^2)) / RHO_0 with lengths in r0:
    # = (1/3) * r0_volume_factor ... computed directly in scaled form
    rho_norm = (M_SHELL / (4.0 * np.pi * (r * L_UNIT) ** 2
                           * np.sqrt(2.0 * np.pi * (sigma_sh * L_UNIT) ** 2))
                ) / RHO_UNIT
    rho_shell = rho_norm * np.exp(-((r - R_0) ** 2) / (2.0 * sigma_sh**2))
    return np.maximum(rho_shell, 1.0e-8 * RHO_0)


def semi_analytic_profile(n: int = 4096):
    """Steady-state (r, Erad, Frad) table in CODE units (replaces the
    reference's ``extern/dust_shell/initial_conditions.txt`` data)."""
    c = C_CODE
    r = np.geomspace(1.0e-4, 3.6, n)
    u = r / SIGMA_STAR
    P_enc = _erf(u / np.sqrt(2.0)) - np.sqrt(2.0 / np.pi) * u * np.exp(-0.5 * u * u)
    # L* in code units: erg/s / (EDEN_UNIT * L_UNIT^3 / T_UNIT_S)
    L_code = L_STAR_CGS / (EDEN_UNIT * L_UNIT**3 / T_UNIT_S)
    F = L_code * P_enc / (4.0 * np.pi * r**2)
    rho = _shell_density(r)

    E = np.zeros(n)
    E[-1] = F[-1] / (0.98 * c)  # near-free-streaming outer boundary

    def chi_of_f(f):
        f = np.clip(f, 0.0, 0.9999)
        return (3.0 + 4.0 * f * f) / (5.0 + 2.0 * np.sqrt(4.0 - 3.0 * f * f))

    # march inward: d(chi E)/dr = -(kappa rho / c) F - (3 chi - 1) E / r
    for i in range(n - 2, -1, -1):
        dr = r[i + 1] - r[i]
        f = F[i + 1] / (c * E[i + 1])
        chi = chi_of_f(f)
        dchiE = -(KAPPA_CODE * rho[i + 1] / c) * F[i + 1] \
            - (3.0 * chi - 1.0) * E[i + 1] / r[i + 1]
        chiE = chi * E[i + 1] - dchiE * dr
        E_new = E[i + 1]
        for _ in range(4):
            f_new = np.clip(F[i] / (c * np.maximum(E_new, 1e-300)), 0.0, 0.9999)
            E_new = chiE / chi_of_f(f_new)
        # causality: E >= F/c
        E[i] = max(E_new, F[i] / c, 1e-300)
    return r, E, F


@register_problem
class RadhydroShellProblem(Problem):
    name = "RadhydroShell"
    physics = PhysicsTraits(hydro_enabled=True, radiation_enabled=True)
    eos_traits = EOSTraits(gamma=GAMMA, mean_molecular_weight=MU_CODE,
                           boltzmann_constant=1.0)
    # Erad floor: the reference sets 0 (test_radhydro_shell.cpp:57) and
    # relies on f64's exponent range to keep Erad positive; the profile's
    # 1e-300 floor IS zero in f32, and a zero-Erad cell NaNs the HLL
    # admissibility fallback (divides by the cell Erad). 1e-10 code units
    # is ~4e-13 of the peak Erad -- dynamically negligible, f32-safe.
    rad = RadTraits(c_light=C_CODE, c_hat=CHAT_CODE,
                    radiation_constant=A_RAD_CODE, Erad_floor=1.0e-10,
                    beta_order=1)
    bcs = BCSpec(x=(BC_PERIODIC, BC_PERIODIC), y=(BC_PERIODIC, BC_PERIODIC),
                 z=(BC_PERIODIC, BC_PERIODIC))

    def compute_planck_opacity(self, rho, T):
        return jnp.full_like(rho, KAPPA_CODE)

    def compute_flux_mean_opacity(self, rho, T):
        return jnp.full_like(rho, KAPPA_CODE)

    def set_radiation_energy_source(self, grid, time):
        """Point-like radiation source (reference `SetRadEnergySource`,
        ``test_radhydro_shell.cpp:98-127``)."""
        x, y, z = grid.cell_center_mesh()
        c = [0.5 * (grid.prob_lo[d] + grid.prob_hi[d]) for d in range(3)]
        r2 = (x - c[0]) ** 2 + (y - c[1]) ** 2 + (z - c[2]) ** 2
        return jnp.broadcast_to(
            SOURCE_NORM * jnp.exp(-r2 / (2.0 * SIGMA_STAR**2)), grid.n_cell
        )

    def error_est(self, sim, level):
        """Density-gradient tagging above 1e-2 rho_0 (reference
        ``test_radhydro_shell.cpp:322-357``)."""
        from ..stencil import sh

        rho = sim.level_U[level][RHO]
        tags = jnp.zeros(rho.shape, bool)
        for d in sim.level_grids[level].active_axes:
            g = jnp.maximum(jnp.abs(sh(rho, 1, d) - rho),
                            jnp.abs(rho - sh(rho, -1, d))) / rho
            tags = tags | (g > 0.1)
        return tags & (rho >= 1.0e-2 * RHO_0)

    def error_est_local(self, U_padded, grid, level, origin):
        """Same gradient tagging on one ghost-padded tile (tile-pool
        levels): the +-1 stencil is exact everywhere the driver's
        n_error_buf dilation can reach the interior."""
        from ..stencil import sh

        rho = U_padded[RHO]
        tags = jnp.zeros(rho.shape, bool)
        for d in range(3):
            g = jnp.maximum(jnp.abs(sh(rho, 1, d) - rho),
                            jnp.abs(rho - sh(rho, -1, d))) / rho
            tags = tags | (g > 0.1)
        return tags & (rho >= 1.0e-2 * RHO_0)

    def set_initial_conditions(self, grid):
        # host-side (numpy) radius mesh: `_shell_density` is untraceable
        # host code, and the jitted-IC fallback would otherwise build the
        # f64 mesh on device, fail the trace, and redo everything eagerly
        # with a 134 MB device->host transfer at the benchmark extent
        layout = self.physics.layout()
        shape = grid.n_cell
        xs = [np.asarray(grid.cell_centers(d, jnp.float64))
              for d in range(3)]
        c = [0.5 * (grid.prob_lo[d] + grid.prob_hi[d]) for d in range(3)]
        r = np.sqrt(
            (xs[0][:, None, None] - c[0]) ** 2
            + (xs[1][None, :, None] - c[1]) ** 2
            + (xs[2][None, None, :] - c[2]) ** 2
        )
        r = np.broadcast_to(r, shape)

        rho = jnp.asarray(_shell_density(r))

        rt, Et, Ft = semi_analytic_profile()
        Erad = jnp.interp(r, jnp.asarray(rt), jnp.asarray(Et))
        Frad = jnp.interp(r, jnp.asarray(rt), jnp.asarray(Ft))

        Trad = (Erad / A_RAD_CODE) ** 0.25
        Eint = rho * C_V_CODE * Trad

        U = jnp.zeros((layout.nvar, *shape))
        U = U.at[RHO].set(rho)
        U = U.at[EGAS].set(Eint)
        U = U.at[EINT].set(Eint)
        U = U.at[layout.rad_index(0, 0)].set(Erad)
        fc = Frad / jnp.sqrt(3.0)
        for comp in (1, 2, 3):
            U = U.at[layout.rad_index(0, comp)].set(fc)
        return U
