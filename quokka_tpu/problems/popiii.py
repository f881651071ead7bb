"""PopIII: collapse of a turbulent, rotating primordial cloud.

Rebuild of the reference's flagship chemistry application
(``src/problems/PopIII/popiii.cpp`` + ``tests/PopIII.in``): a 1 pc
primordial cloud (n ~ 9.1e3 cm^-3, T = 264 K, solid-body rotation
omega = 2.016e-14 s^-1) with a solenoidal turbulent velocity field
(rms = 1.805e5 cm/s), embedded at 1% density in a pressure-equilibrium
ambient medium, evolving under self-gravity with the primordial network
burning in the Strang slot, and Jeans-length refinement tagging
(Truelove et al. 1997: refine where l_J < N dx and rho above threshold).

The reference reads its velocity cube from ``zdrv.hdf5`` (generated
offline by ``perturbation.py``); here the equivalent solenoidal cube is
generated in-process (``utils/turbulence.solenoidal_perturbation``).
The reference CI deck runs 10 coarse steps unigrid (max_level = 0) as a
smoke test; the same acceptance applies here plus species/nuclei
conservation. CGS units (chemistry rate fits require cm^-3/K), so
production runs use f64 (see README precision policy).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..eos import K_BOLTZMANN_CGS
from ..indices import EGAS, EINT, MX1, MX2, MX3, RHO, SCALAR0
from ..microphysics.chem_coupling import (
    ChemEOS,
    number_densities_to_partial_densities,
)
from ..microphysics.chemistry import PrimordialNetwork
from ..registry import (
    BC_OUTFLOW,
    BCSpec,
    EOSTraits,
    PhysicsTraits,
    Problem,
    register_problem,
)
from ..utils.turbulence import solenoidal_perturbation

# reference deck values (tests/PopIII.in)
R_SPHERE = 3.086e18          # cm (1 pc)
OMEGA = 2.016008e-14         # s^-1
NUMDENS_INIT = 0.90861183e4  # cm^-3 (total scale factor)
RMS_VELOCITY = 1.8050e5      # cm/s
T_CORE = 0.26415744e3        # K
JEANS_NCELLS = 64.0
JEANS_RHO_THRESH = 5.0e-21   # g/cm^3
G_CGS = 6.674e-8

# dominant primordial abundances (deck primary_species_*: e, H+, H, H2 ...
# mapped onto our 12-species ordering e,H,Hp,Hm,H2,H2p,D,Dp,HD,He,Hep,Hepp)
X_E = 0.88499253e-6
X_HP = 0.88498062e-6
X_H = 0.99932238
X_H2 = 0.21957612e-10 * 1e4  # trace H2
X_DP = 1.0e-10
X_D = 4.0e-5
X_HD = 1.0e-10
X_HE = 0.0775
X_TRACE = 1.0e-14


@register_problem
class PopIIIProblem(Problem):
    name = "PopIII"
    physics = PhysicsTraits(hydro_enabled=True, gravity_enabled=True,
                            n_scalars=12, n_mscalars=12)
    eos_traits = EOSTraits(gamma=5.0 / 3.0,
                           mean_molecular_weight=1.22 * 1.66053906892e-24)
    bcs = BCSpec(x=(BC_OUTFLOW, BC_OUTFLOW), y=(BC_OUTFLOW, BC_OUTFLOW),
                 z=(BC_OUTFLOW, BC_OUTFLOW))
    chemistry_network = PrimordialNetwork()
    # CGS value of one code unit (density, length, time); the base problem
    # IS the reference's raw-CGS formulation.  `PopIIICodeUnitsProblem`
    # overrides these so every on-chip magnitude stays inside the TPU f64
    # emulation's f32 exponent range (see Simulation units handling).
    units = (1.0, 1.0, 1.0)

    def cloud_number_densities(self):
        """Relative species number densities of the cloud (normalized to
        n_H ~ 1), scaled by NUMDENS_INIT at IC time."""
        n = [X_E, X_H, X_HP, X_TRACE, X_H2, X_TRACE,
             X_D, X_DP, X_HD, X_HE, X_TRACE, X_TRACE]
        return np.asarray(n)

    def error_est(self, sim, level):
        """Jeans-length refinement (reference ``popiii.cpp:325-360``):
        tag where l_J = cs sqrt(pi/(G rho)) < N_cells dx, above the
        density threshold.  In code units G -> G rho0 t0^2 and the
        threshold scales by 1/rho0."""
        u_rho, _u_len, u_t = self.units
        U = sim.level_U[level]
        rho = U[RHO]
        gmm = self.eos_traits.gamma
        P = (gmm - 1.0) * U[EINT]
        cs = jnp.sqrt(gmm * P / rho)
        G_code = G_CGS * u_rho * u_t * u_t
        l_J = cs * jnp.sqrt(jnp.pi / (G_code * rho))
        dx = sim.level_grids[level].dx_min
        return (l_J < JEANS_NCELLS * dx) & (rho > JEANS_RHO_THRESH / u_rho)

    def set_initial_conditions(self, grid):
        layout = self.physics.layout()
        shape = grid.n_cell
        net = self.chemistry_network
        chem_eos = ChemEOS(network=net)
        u_rho, u_len, u_t = self.units
        u_v = u_len / u_t
        u_e = u_rho * u_v * u_v  # energy density

        nrel = self.cloud_number_densities() * NUMDENS_INIT
        nden0 = jnp.asarray(nrel).reshape(-1, 1, 1, 1)
        rho_i0 = number_densities_to_partial_densities(
            jnp.broadcast_to(nden0, (12, *shape)), net) / u_rho
        rho_core = jnp.sum(rho_i0, axis=0)

        x, y, z = grid.cell_center_mesh()
        c = [0.5 * (grid.prob_lo[d] + grid.prob_hi[d]) for d in range(3)]
        xx = jnp.broadcast_to(x - c[0], shape)
        yy = jnp.broadcast_to(y - c[1], shape)
        zz = jnp.broadcast_to(z - c[2], shape)
        r = jnp.sqrt(xx**2 + yy**2 + zz**2)
        inside = r <= R_SPHERE / u_len

        # turbulent velocity cube scaled to the deck's rms (reference
        # renorm_amp * dv; periodic cube sampled at the grid resolution)
        nmax = max(shape)
        v = solenoidal_perturbation(nmax, rms=RMS_VELOCITY / u_v, seed=7)
        v = jnp.asarray(v[:, :shape[0], :shape[1], :shape[2]])
        vx, vy, vz = v[0], v[1], v[2]

        # solid-body rotation inside the cloud (OMEGA in code units is
        # OMEGA * t0)
        omega = OMEGA * u_t
        distxy = jnp.sqrt(xx**2 + yy**2)
        phi = jnp.arctan2(yy, xx)
        vx = vx + jnp.where(inside, -distxy * omega * jnp.sin(phi), 0.0)
        vy = vy + jnp.where(inside, distxy * omega * jnp.cos(phi), 0.0)

        # ambient: 1% density at pressure equilibrium (same composition
        # ratios -> T_ambient = 100 T_core for the ideal mixture)
        rho = jnp.where(inside, rho_core, 0.01 * rho_core)
        nden = jnp.broadcast_to(nden0, (12, *shape)) * jnp.where(
            inside, 1.0, 0.01)[None]
        rho_i = number_densities_to_partial_densities(nden, net) / u_rho

        # pressure equilibrium (reference: ambient re-solved with
        # eos_input_rp at the core pressure, popiii.cpp:297-303): for the
        # ideal mixture Eint = P/(gamma_eff - 1) and the composition ratios
        # are identical inside/outside, so equal pressure means the CORE
        # Eint everywhere (the 1%-density ambient is simply 100x hotter)
        eint = chem_eos.eint_from_tgas(
            jnp.broadcast_to(nden0, (12, *shape)), T_CORE) / u_e

        ke = 0.5 * rho * (vx**2 + vy**2 + vz**2)
        U = jnp.zeros((layout.nvar, *shape))
        U = U.at[RHO].set(rho)
        U = U.at[MX1].set(rho * vx)
        U = U.at[MX2].set(rho * vy)
        U = U.at[MX3].set(rho * vz)
        U = U.at[EGAS].set(eint + ke)
        U = U.at[EINT].set(eint)
        U = U.at[SCALAR0:SCALAR0 + 12].set(rho_i)
        return U


def popiii_code_units():
    """(rho0, L0, t0): core mass density, cloud radius, 1/sqrt(G rho0).
    By construction G_code = G_cgs rho0 t0^2 = 1."""
    from ..eos import M_U_CGS

    net = PopIIIProblem.chemistry_network
    nrel = np.asarray(
        [X_E, X_H, X_HP, X_TRACE, X_H2, X_TRACE,
         X_D, X_DP, X_HD, X_HE, X_TRACE, X_TRACE]) * NUMDENS_INIT
    rho0 = float(np.sum(nrel * np.asarray(net.masses) * M_U_CGS))
    t0 = 1.0 / np.sqrt(G_CGS * rho0)
    return (rho0, R_SPHERE, t0)


@register_problem
class PopIIICodeUnitsProblem(PopIIIProblem):
    """PopIII in code units (rho0 = core density, L0 = cloud radius,
    t0 = 1/sqrt(G rho0), so G_code = 1): physically identical to the
    raw-CGS `PopIII` (tests prove the scaled states match), but every
    on-chip magnitude stays inside the TPU f64 emulation's f32 exponent
    range — raw-CGS cell volumes (~1e51 cm^3) overflow it, which is why
    the CGS formulation cannot run on TPU hardware.  Deck geometry, times
    and floors are in code units; chemistry keys (e.g.
    chemistry.min_density_allowed) stay CGS because the burn itself runs
    in CGS behind the units layer."""

    name = "PopIIICodeUnits"
    units = popiii_code_units()
