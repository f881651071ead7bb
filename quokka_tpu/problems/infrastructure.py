"""Infrastructure/micro problems promoted from the test suite into the
registered catalog, completing name-for-name parity with the reference's
``src/problems/`` directory (each of these is one reference problem dir
whose validation lives in ``tests/``):

- PassiveScalar  (``src/problems/PassiveScalar``)      tests/test_passive_scalar.py
- HydroWave      (``src/problems/HydroWave``)          tests/test_hydro_wave.py
- Cooling        (``src/problems/Cooling``)            tests/test_cooling.py
- BinaryOrbitCIC (``src/problems/BinaryOrbitCIC``)     tests/test_gravity.py
- FCQuantities   (``src/problems/FCQuantities``)       tests/test_fc_quantities.py
- RadShadow      (``src/problems/RadShadow``)          tests/test_radiation_shadow.py
- RadhydroUniformAdvecting (``src/problems/RadhydroUniformAdvecting``)
                                                       tests/test_radhydro.py
- HydroShocktubeCMA (``src/problems/HydroShocktubeCMA``) tests/test_cma_scalars.py
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..indices import EGAS, EINT, MX1, RHO, SCALAR0
from ..microphysics.cooling import CoolingTable
from ..particles.cic import ParticleData
from ..registry import (
    BC_OUTFLOW,
    BC_USER,
    BCSpec,
    EOSTraits,
    PhysicsTraits,
    Problem,
    RadTraits,
    register_problem,
)
from .shocktube import ShocktubeProblem


# ------------------------------------------------------------- PassiveScalar
@register_problem
class PassiveScalarProblem(Problem):
    """Gaussian passive-scalar profile advected by a uniform flow."""

    name = "PassiveScalar"
    physics = PhysicsTraits(hydro_enabled=True, n_scalars=1)
    eos_traits = EOSTraits(gamma=1.4)

    rho0, P0, v0 = 1.0, 1.0, 1.0

    def set_initial_conditions(self, grid):
        x = grid.cell_centers(0)[:, None, None]
        shape = grid.n_cell
        scal = jnp.exp(-((x - 0.3) ** 2) / 0.005)
        g = self.eos_traits.gamma
        eint = self.P0 / (g - 1.0)
        zeros = jnp.zeros(shape)
        return jnp.stack([
            jnp.full(shape, self.rho0),
            jnp.full(shape, self.rho0 * self.v0),
            zeros, zeros,
            jnp.full(shape, eint + 0.5 * self.rho0 * self.v0**2),
            jnp.full(shape, eint),
            jnp.broadcast_to(scal, shape),
        ])


# ----------------------------------------------------------------- HydroWave
WAVE_GAMMA = 5.0 / 3.0
WAVE_RHO0 = 1.0
WAVE_P0 = 1.0 / WAVE_GAMMA  # so cs = 1
WAVE_AMP = 1.0e-6


@register_problem
class HydroWaveProblem(Problem):
    """Linear right-going sound wave (convergence-order anchor)."""

    name = "HydroWave"
    physics = PhysicsTraits(hydro_enabled=True)
    eos_traits = EOSTraits(gamma=WAVE_GAMMA)

    def set_initial_conditions(self, grid):
        x = grid.cell_centers(0)[:, None, None]
        shape = grid.n_cell
        cs = np.sqrt(WAVE_GAMMA * WAVE_P0 / WAVE_RHO0)
        pert = WAVE_AMP * jnp.sin(2.0 * jnp.pi * x)
        rho = WAVE_RHO0 + pert
        v = cs / WAVE_RHO0 * pert
        P = WAVE_P0 + cs * cs * pert
        eint = P / (WAVE_GAMMA - 1.0)
        zeros = jnp.zeros(shape)
        return jnp.stack([
            jnp.broadcast_to(rho, shape),
            jnp.broadcast_to(rho * v, shape),
            zeros, zeros,
            jnp.broadcast_to(eint + 0.5 * rho * v * v, shape),
            jnp.broadcast_to(eint, shape),
        ])


# ------------------------------------------------------------------- Cooling
def power_law_cooling_table():
    """Lambda(T) = 1e-22 (T/1e4 K) erg cm^3/s: linear in T, so the box
    cools exponentially with an analytic rate."""
    logT = np.linspace(1.0, 9.0, 50)
    logL = -22.0 + (logT - 4.0)
    return CoolingTable(tuple(logT), tuple(logL))


@register_problem
class CoolingProblem(Problem):
    """Uniform box with Strang-split tabulated cooling (the reference's
    Cooling problem exercises the same integration path with Grackle
    tables; test_cooling_tables.py covers the table-file readers)."""

    name = "Cooling"
    physics = PhysicsTraits(hydro_enabled=True)
    eos_traits = EOSTraits(gamma=5.0 / 3.0)
    cooling_table = power_law_cooling_table()

    rho0 = 1.0e-24
    T0 = 1.0e6

    def set_initial_conditions(self, grid):
        shape = grid.n_cell
        eos = self.eos_traits.make_eos()
        eint = float(eos.eint_from_tgas(self.rho0, self.T0))
        zeros = jnp.zeros(shape)
        return jnp.stack([
            jnp.full(shape, self.rho0), zeros, zeros, zeros,
            jnp.full(shape, eint), jnp.full(shape, eint),
        ])


# ------------------------------------------------------------ BinaryOrbitCIC
@register_problem
class BinaryOrbitCICProblem(Problem):
    """Two equal-mass CIC particles on a circular orbit in near-vacuum."""

    name = "BinaryOrbitCIC"
    physics = PhysicsTraits(hydro_enabled=True, gravity_enabled=True)
    eos_traits = EOSTraits(gamma=5.0 / 3.0)

    G = 1.0
    M = 0.1  # per particle
    sep = 0.25

    def set_initial_conditions(self, grid):
        shape = grid.n_cell
        rho = jnp.full(shape, 1.0e-10)
        eint = jnp.full(shape, 1.0e-12)
        zeros = jnp.zeros(shape)
        return jnp.stack([rho, zeros, zeros, zeros, eint, eint])

    def create_initial_particles(self, grid):
        d = self.sep
        v = np.sqrt(self.G * self.M / (2 * d))
        x = np.array([[0.5 - d / 2, 0.5, 0.5], [0.5 + d / 2, 0.5, 0.5]])
        vel = np.array([[0.0, -v, 0.0], [0.0, v, 0.0]])
        mass = np.array([self.M, self.M])
        return ParticleData(jnp.asarray(x), jnp.asarray(vel), jnp.asarray(mass))


# -------------------------------------------------------------- FCQuantities
@register_problem
class FCQuantitiesProblem(Problem):
    """Face-centered state init/IO round-trip (MHD-ready bookkeeping)."""

    name = "FCQuantities"
    physics = PhysicsTraits(hydro_enabled=True, mhd_enabled=True)
    eos_traits = EOSTraits(gamma=5.0 / 3.0)

    amp = 1.0e-6

    def set_initial_conditions(self, grid):
        x, _y, _z = grid.cell_center_mesh()
        shape = grid.n_cell
        P0 = 1.0 / self.eos_traits.gamma
        drho = self.amp * jnp.sin(2.0 * jnp.pi * x)
        rho = jnp.broadcast_to(1.0 + drho, shape)
        mom = jnp.broadcast_to(-drho, shape)
        eint = jnp.broadcast_to(
            P0 / (self.eos_traits.gamma - 1.0) + 1.5 * drho, shape)
        zeros = jnp.zeros(shape)
        return jnp.stack([rho, mom, zeros, zeros,
                          eint + 0.5 * mom**2 / rho, eint])

    def set_initial_conditions_fc(self, grid):
        fcs = []
        Bvals = (1.0, np.sqrt(2.0), 0.5)
        for d in range(3):
            shp = list(grid.n_cell)
            shp[d] += 1
            fc = jnp.zeros((2, *shp))  # [v_face, B] per dim
            fc = fc.at[1].set(Bvals[d])
            fcs.append(fc)
        return fcs


# ----------------------------------------------------------------- RadShadow
SHADOW_C = 1.0
SHADOW_ERAD0 = 1.0e-10
SHADOW_KAPPA_CLOUD = 200.0  # tau across the clump ~ 20
SHADOW_KAPPA_BG = 1.0e-8


@register_problem
class RadShadowProblem(Problem):
    """Dense absorbing clump in a streaming radiation field casts a sharp
    shadow (the M1 closure's signature multi-D test)."""

    name = "RadShadow"
    physics = PhysicsTraits(hydro_enabled=False, radiation_enabled=True)
    # tiny mean molecular weight => enormous heat capacity: the clump is a
    # pure absorber (negligible re-emission over the run)
    eos_traits = EOSTraits(gamma=5.0 / 3.0, mean_molecular_weight=1.0e-8,
                           boltzmann_constant=1.0)
    rad = RadTraits(c_light=SHADOW_C, c_hat=SHADOW_C, radiation_constant=1.0,
                    Erad_floor=SHADOW_ERAD0, beta_order=0)
    bcs = BCSpec(x=(BC_USER, BC_OUTFLOW), y=(BC_OUTFLOW, BC_OUTFLOW))

    def compute_planck_opacity(self, rho, T):
        return jnp.where(rho > 1.5, SHADOW_KAPPA_CLOUD, SHADOW_KAPPA_BG)

    def set_initial_conditions(self, grid):
        x, y, _ = grid.cell_center_mesh()
        shape = grid.n_cell
        layout = self.physics.layout()
        r2 = (x - 0.5) ** 2 + (y - 0.5) ** 2
        rho = jnp.where(r2 < 0.01, 10.0, 1.0)
        rho = jnp.broadcast_to(rho, shape)
        U = jnp.zeros((layout.nvar, *shape))
        U = U.at[RHO].set(rho)
        U = U.at[EGAS].set(1.0e-5).at[EINT].set(1.0e-5)
        U = U.at[layout.rad_index(0, 0)].set(SHADOW_ERAD0)
        return U

    def fill_user_boundary(self, Ug, grid, ng, time, axis, side):
        assert axis == 0 and side == 0
        g = ng[0]
        layout = self.physics.layout()
        iE, iFx = layout.rad_index(0, 0), layout.rad_index(0, 1)
        nvar = Ug.shape[0]
        vals = jnp.zeros((nvar,), dtype=Ug.dtype)
        vals = vals.at[RHO].set(1.0).at[EGAS].set(1.0e-5).at[EINT].set(1.0e-5)
        vals = vals.at[iE].set(1.0).at[iFx].set(SHADOW_C * 1.0)
        block = jnp.broadcast_to(vals[:, None, None, None],
                                 (nvar, g, *Ug.shape[2:]))
        return Ug.at[:, :g].set(block)


# ------------------------------------------------- RadhydroUniformAdvecting
UA_C = 1.0e8
UA_CHAT = 1.0e7
UA_V0 = 1.0e-4 * UA_C
UA_KAPPA0 = 1.0e4
UA_T0 = 1.0
UA_RHO0 = 1.0
UA_A_RAD = 1.0


@register_problem
class RadhydroUniformAdvectingProblem(Problem):
    """A uniformly advecting matter-radiation equilibrium must remain
    exactly uniform (the beta_order=1 frame-consistency anchor)."""

    name = "RadhydroUniformAdvecting"
    physics = PhysicsTraits(hydro_enabled=True, radiation_enabled=True)
    eos_traits = EOSTraits(gamma=5.0 / 3.0, mean_molecular_weight=1.0,
                           boltzmann_constant=1.0)
    rad = RadTraits(c_light=UA_C, c_hat=UA_CHAT, radiation_constant=UA_A_RAD,
                    Erad_floor=0.0, beta_order=1)

    def compute_planck_opacity(self, rho, T):
        return jnp.full_like(rho, UA_KAPPA0)

    def set_initial_conditions(self, grid):
        shape = grid.n_cell
        layout = self.physics.layout()
        eos = self.make_eos()
        eint = float(eos.eint_from_tgas(UA_RHO0, UA_T0))
        Erad0 = UA_A_RAD * UA_T0**4
        U = jnp.zeros((layout.nvar, *shape))
        U = U.at[RHO].set(UA_RHO0)
        U = U.at[MX1].set(UA_RHO0 * UA_V0)
        U = U.at[EGAS].set(eint + 0.5 * UA_RHO0 * UA_V0**2)
        U = U.at[EINT].set(eint)
        U = U.at[layout.rad_index(0, 0)].set(Erad0)
        U = U.at[layout.rad_index(0, 1)].set(4.0 / 3.0 * UA_V0 * Erad0)
        return U


# --------------------------------------------------------- HydroShocktubeCMA
@register_problem
class ShocktubeCMAProblem(ShocktubeProblem):
    """Sod shocktube with two mass scalars split 60/40 (consistent
    multi-species advection: species must sum to the density exactly)."""

    name = "HydroShocktubeCMA"
    physics = PhysicsTraits(hydro_enabled=True, n_scalars=2, n_mscalars=2)

    def set_initial_conditions(self, grid):
        U = super().set_initial_conditions(grid)
        nvar = self.physics.layout().nvar
        full = jnp.zeros((nvar, *grid.n_cell))
        full = full.at[:U.shape[0]].set(U)
        full = full.at[SCALAR0].set(0.6 * U[RHO])
        full = full.at[SCALAR0 + 1].set(0.4 * U[RHO])
        return full

    def fill_user_boundary(self, Ug, grid, ng, time, axis, side):
        Ug = super().fill_user_boundary(Ug, grid, ng, time, axis, side)
        g = ng[0]
        rho, _ = self._state_lr(left=(side == 0))
        sl = slice(0, g) if side == 0 else slice(-g, None)
        Ug = Ug.at[SCALAR0, sl].set(0.6 * rho)
        Ug = Ug.at[SCALAR0 + 1, sl].set(0.4 * rho)
        return Ug

    def compute_reference_solution(self, sim):
        return None  # CMA consistency is the check (tests/test_cma_scalars.py)
