"""Problem definition API: traits + problem classes + a name registry.

TPU-native equivalent of the reference's per-problem compile-time template
specializations (`Physics_Traits`, `quokka::EOS_Traits`,
`HydroSystem_Traits`, `RadSystem_Traits`, IC/BC hooks; see reference
``src/physics_info.hpp:8``, ``src/hydro/EOS.hpp:32``,
``src/hydro/hydro_system.hpp:38``, ``src/radiation/radiation_system.hpp:73``
and e.g. ``src/problems/HydroShocktube/test_hydro_shocktube.cpp:26-383``).

A problem is a Python class with trait dataclasses as attributes plus hook
methods; traits are frozen dataclasses so they can be jit-static.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Dict, Optional, Tuple, Type

import jax.numpy as jnp

from .eos import IdealGasEOS, C_LIGHT_CGS
from .indices import StateLayout


@dataclass(frozen=True)
class PhysicsTraits:
    """Which physics are enabled (reference `Physics_Traits`)."""

    hydro_enabled: bool = True
    radiation_enabled: bool = False
    mhd_enabled: bool = False
    gravity_enabled: bool = False
    n_scalars: int = 0  # passive scalars
    n_mscalars: int = 0  # mass scalars (subset of passive scalars)
    n_groups: int = 1  # radiation groups

    def layout(self) -> StateLayout:
        return StateLayout(
            hydro_enabled=self.hydro_enabled,
            radiation_enabled=self.radiation_enabled,
            n_scalars=self.n_scalars,
            n_mscalars=self.n_mscalars,
            n_groups=self.n_groups,
        )


@dataclass(frozen=True)
class EOSTraits:
    """EOS constants (reference `quokka::EOS_Traits`)."""

    gamma: float = 5.0 / 3.0
    mean_molecular_weight: float = 1.66053906892e-24
    boltzmann_constant: float = 1.380649e-16
    cs_isothermal: float = float("nan")

    def make_eos(self) -> IdealGasEOS:
        return IdealGasEOS(
            gamma=self.gamma,
            mean_molecular_weight=self.mean_molecular_weight,
            boltzmann_constant=self.boltzmann_constant,
            cs_isothermal=self.cs_isothermal,
        )


@dataclass(frozen=True)
class HydroTraits:
    """Hydro solver options (reference `HydroSystem_Traits`)."""

    reconstruct_eint: bool = True  # reconstruct e_int instead of pressure


@dataclass(frozen=True)
class RadTraits:
    """Radiation solver constants (reference `RadSystem_Traits`,
    ``src/radiation/radiation_system.hpp:73-84``)."""

    c_light: float = C_LIGHT_CGS
    c_hat: float = C_LIGHT_CGS  # reduced speed of light
    radiation_constant: float = 7.565731356724124e-15
    Erad_floor: float = 0.0
    beta_order: int = 1  # relativistic correction order in v/c
    energy_unit: float = 1.0  # converts group boundaries to erg if needed
    group_edges: Tuple[float, ...] = ()  # photon energy group boundaries


@dataclass(frozen=True)
class ISMTraits:
    """ISM physics switches (reference `ISM_Traits`,
    ``src/radiation/radiation_system.hpp:86-90``): dust-gas thermal
    coupling, photoelectric heating, and the coupling-strength threshold
    below which gas and dust decouple."""

    enable_dust_gas_thermal_coupling_model: bool = False
    enable_photoelectric_heating: bool = False
    gas_dust_coupling_threshold: float = 1.0e-6
    # Lambda_gd = coeff * n_H^2 sqrt(T) (T - T_d); Bate & Keto (2015) eq. 18
    # (reference default dustGasInteractionCoeff_ = 2.5e-34 erg cm^3/s/K^1.5,
    # QuokkaSimulation.hpp:127, overridable via
    # radiation.dust_gas_interaction_coeff)
    dust_gas_coeff: float = 2.5e-34
    # mass per hydrogen nucleus: n_H = rho / mean_molecular_mass
    # (reference RadSystem_Traits::mean_molecular_mass)
    mean_molecular_mass: float = 1.0


# Boundary condition kinds per (axis, side); mirrors amrex::BCType used by the
# reference (int_dir / foextrap / reflect / ext_dir).
BC_PERIODIC = "periodic"
BC_OUTFLOW = "outflow"
BC_REFLECT = "reflect"
BC_USER = "user"  # ext_dir: problem supplies fill_user_boundary hook
BC_NSCBC_OUTFLOW = "nscbc_outflow"  # characteristic subsonic outflow
BC_NSCBC_INFLOW = "nscbc_inflow"  # characteristic subsonic inflow
# inflow targets read from problem.nscbc_inflow_targets(grid, time)
# target pressure read from problem.nscbc_outflow_pressure


@dataclass(frozen=True)
class BCSpec:
    """Boundary conditions: one kind per (axis, lo/hi side)."""

    x: Tuple[str, str] = (BC_PERIODIC, BC_PERIODIC)
    y: Tuple[str, str] = (BC_PERIODIC, BC_PERIODIC)
    z: Tuple[str, str] = (BC_PERIODIC, BC_PERIODIC)

    def axis(self, d: int) -> Tuple[str, str]:
        return (self.x, self.y, self.z)[d]

    def is_periodic(self, d: int) -> bool:
        lo, hi = self.axis(d)
        return lo == BC_PERIODIC and hi == BC_PERIODIC


class Problem:
    """Base class for problem definitions.

    Subclasses override trait attributes and hooks. Hook parity with the
    reference's pure-virtual / specialization points
    (``src/simulation.hpp:220-247``):
      - set_initial_conditions(grid) -> U[nvar, nx, ny, nz]
      - fill_user_boundary(Ug, grid, ng, time, axis, side) (ext_dir BCs)
      - compute_reference_solution(sim) -> U_exact (enables L1 self-check)
      - error_est(sim, level) -> bool tag array (AMR refinement)
      - compute_derived_var(name, sim) -> array
    """

    name: str = "problem"
    physics: PhysicsTraits = PhysicsTraits()
    eos_traits: EOSTraits = EOSTraits()
    hydro: HydroTraits = HydroTraits()
    rad: RadTraits = RadTraits()
    ism: ISMTraits = ISMTraits()
    bcs: BCSpec = BCSpec()

    def make_eos(self):
        """EOS object used by the solvers; override to install a custom EOS
        (the analog of the reference's per-problem `quokka::EOS`
        specializations, e.g. the Su-Olson alpha*T^4 heat capacity)."""
        return self.eos_traits.make_eos()

    # ------------------------------------------------------------------ hooks
    def set_initial_conditions(self, grid):
        raise NotImplementedError

    def fill_user_boundary(self, Ug, grid, ng, time, axis, side):
        """Fill ext_dir ghost zones in the padded array Ug; returns Ug."""
        raise NotImplementedError(
            f"{type(self).__name__} declares BC_USER but does not implement "
            "fill_user_boundary()"
        )

    def compute_reference_solution(self, sim):
        return None

    def error_est(self, sim, level: int):
        return None

    def error_est_local(self, U_padded, grid, level: int, origin):
        """Tile-local refinement tagging for tile-pool AMR levels
        (`amr.sparse_min_level`): called under vmap with one tile's
        ghost-PADDED state [nvar, tx+2g, ty+2g, tz+2g], the LEVEL grid,
        and the tile's cell-origin [3] (traced int32). Must return a bool
        tag array over the full padded extent (the driver dilates by
        n_error_buf and trims, so cross-tile tag buffering is exact)."""
        raise NotImplementedError(
            f"{type(self).__name__} has no error_est_local hook "
            "(required for tile-pool levels above amr.sparse_min_level)"
        )

    def external_acceleration(self, grid):
        """Static external acceleration field g[3, nx, ny, nz] (e.g. the
        constant gravity of the Rayleigh-Taylor setups); None disables."""
        return None

    def compute_derived_var(self, name: str, sim):
        raise NotImplementedError(name)

    # ---- radiation opacity hooks (reference `ComputePlanckOpacity` etc.
    # specializations, ``src/radiation/radiation_system.hpp:1141-1154``;
    # energy-mean and flux-mean default to the Planck mean)
    def compute_planck_opacity(self, rho, T):
        raise NotImplementedError(
            f"{type(self).__name__} enables radiation but defines no Planck opacity"
        )

    def compute_energy_mean_opacity(self, rho, T):
        return self.compute_planck_opacity(rho, T)

    def compute_flux_mean_opacity(self, rho, T):
        return self.compute_planck_opacity(rho, T)

    def set_radiation_energy_source(self, grid, time):
        """User radiation energy source field (reference `SetRadEnergySource`)."""
        return jnp.zeros(grid.n_cell)

    # ---- ISM physics hooks (dust-gas-radiation coupling, reference
    # ``src/radiation/radiation_dust_system.hpp``): per-group net line
    # cooling, cosmic-ray heating, and photoelectric heating (all default
    # to zero; the dust model is switched on by `ism` traits)
    def define_net_cooling_rate(self, T, n_H):
        """Net line cooling rate per group [G, ...] in erg cm^-3 s^-1
        (reference `DefineNetCoolingRate`)."""
        import jax.numpy as jnp

        G = self.physics.n_groups
        return jnp.zeros((G, *jnp.shape(T)))

    def define_net_cooling_rate_temp_derivative(self, T, n_H):
        import jax.numpy as jnp

        G = self.physics.n_groups
        return jnp.zeros((G, *jnp.shape(T)))

    def define_cosmic_ray_heating_rate(self, n_H):
        import jax.numpy as jnp

        return jnp.zeros(jnp.shape(n_H))

    def define_photoelectric_heating_E1_derivative(self, T, n_H):
        """d(PE heating rate)/d(E_FUV) in s^-1; the FUV band is the LAST
        photon group (reference `DefinePhotoelectricHeatingE1Derivative`)."""
        import jax.numpy as jnp

        return jnp.zeros(jnp.shape(T))

    def compute_thermal_radiation_multigroup(self, T, boundaries):
        """Override the per-group thermal emission B_g(T) (reference
        `ComputeThermalRadiationMultiGroup` specialization; RadDustMG uses a
        modified blackbody B = a_rad T x Planck fractions). Return [G, ...]
        or None for the default a_rad T^4 x Planck fractions."""
        return None

    def compute_thermal_radiation_temp_derivative_multigroup(self, T, boundaries):
        """dB_g/dT matching `compute_thermal_radiation_multigroup`;
        None selects the default 4 a_rad T^3 x fractions."""
        return None

    def define_opacity_exponents_and_lower_values(self, boundaries, rho, T):
        """PPL opacity model: per-group power-law exponent alpha_g and
        opacity at the group's lower edge kappa_g(nu_g), both [G, ...]
        (reference `DefineOpacityExponentsAndLowerValues`,
        ``src/radiation/radiation_system.hpp:280-282``). Default: flat
        spectrum (alpha = 0) at the piecewise-constant group opacities."""
        import jax.numpy as jnp

        k = self.compute_group_opacities(boundaries, rho, T)
        return jnp.zeros_like(k), k

    def compute_group_opacities(self, boundaries, rho, T):
        """Per-group opacities [G, ...] for multigroup problems (reference
        `DefineOpacityExponentsAndLowerValues` with the piecewise-constant
        opacity model). Default: Planck opacity replicated per group."""
        import jax.numpy as jnp

        G = len(boundaries) - 1
        k = self.compute_planck_opacity(rho, T)
        return jnp.broadcast_to(k[None], (G, *k.shape))

    def create_initial_particles(self, grid):
        """Return a `particles.cic.ParticleData` (gravitating CIC particles,
        reference `createInitialParticles`) or None."""
        return None

    def create_initial_tracer_particles(self, grid):
        """Return tracer particle positions [N, 3] (massless, advected with
        the gas; reference tracer particles) or None."""
        return None

    def set_initial_conditions_fc(self, grid):
        """Face-centered initial state (MHD-ready bookkeeping, reference
        `setInitialConditionsAtLevel_fc` + Physics_NumVars face-centered
        vars: one velocity + one B component per dimension,
        ``src/physics_numVars.hpp:10-15``).  Return a list of three arrays
        [n_fc_comps, nx+1, ny, nz] / [.., nx, ny+1, nz] / [.., nx, ny, nz+1]
        (staggered along their own axis), or None when the problem carries
        no face-centered state."""
        return None

    def compute_before_timestep(self, sim):
        pass

    def compute_after_evolve(self, sim):
        pass

    def compute_statistics(self, sim) -> Dict[str, float]:
        return {}


# ------------------------------------------------------------------ registry
_PROBLEMS: Dict[str, Type[Problem]] = {}


def register_problem(cls: Type[Problem]) -> Type[Problem]:
    """Class decorator: register a problem under its `name` attribute."""
    _PROBLEMS[cls.name] = cls
    return cls


def get_problem(name: str) -> Type[Problem]:
    return _PROBLEMS[name]


def problem_names():
    return sorted(_PROBLEMS)
