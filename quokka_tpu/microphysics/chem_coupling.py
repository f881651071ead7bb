"""Chemistry <-> solver coupling: composition EOS + Strang-split burn.

TPU-native rebuild of the reference's chemistry integration points:

- ``src/chemistry/Chemistry.hpp:31-173`` (`computeChemistry`): per-cell
  Strang-split burn of the species mass scalars (stored as partial
  densities), with positivity clamping, mass-fraction renormalization,
  electron charge conservation, and a burn-success flag that feeds the
  hydro retry ladder.
- ``src/hydro/EOS.hpp:82-112``: the chemistry-aware EOS, where the mean
  molecular weight and adiabatic index come from the composition rather
  than from fixed `EOS_Traits` constants.

Design notes (TPU-first): the burn is one fused batched kernel over the
whole grid (backward-Euler Newton with a jacfwd Jacobian; see
`chemistry.backward_euler_newton`), not a per-cell VODE call.  The burn is
isothermal over the Strang half-step and leaves the internal energy
density untouched -- the gas temperature implied by (Eint, composition)
shifts through the composition change, which conserves total energy
exactly.  (The reference's VODE network also integrates a thermal ODE for
chemical heating/cooling; that term is modeled separately via the cooling
subsystem here.)
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import jax.numpy as jnp

from ..eos import K_BOLTZMANN_CGS, M_U_CGS, IdealGasEOS
from ..indices import EGAS, EINT, MX1, MX2, MX3, RHO, SCALAR0
from .chemistry import PrimordialNetwork, backward_euler_newton


# per-species adiabatic index: diatomic molecules are 7/5, everything else
# (atoms, ions, electrons) 5/3 (the reference's Microphysics primordial_chem
# EOS assigns species gammas the same way)
def _species_gammas(network) -> Tuple[float, ...]:
    diatomic = {"H2", "H2p", "HD"}
    return tuple(7.0 / 5.0 if s in diatomic else 5.0 / 3.0
                 for s in network.species)


@dataclass(frozen=True)
class ChemEOS:
    """Composition-dependent ideal-gas mixture EOS (reference
    ``src/hydro/EOS.hpp:82-112``: `eos()` with the chem network's species).

    All methods take `nden` = species number densities [n_spec, ...] in
    cm^-3 and work on the ideal-mixture closed forms:

        P      = n_tot k T
        Eint   = sum_i n_i k T / (gamma_i - 1)
        mu     = rho / (n_tot m_u)
        gamma  = 1 + n_tot / sum_i (n_i / (gamma_i - 1))
    """

    network: PrimordialNetwork = PrimordialNetwork()
    boltzmann_constant: float = K_BOLTZMANN_CGS

    def _cv_factor(self, nden):
        """sum_i n_i/(gamma_i - 1)  (the mixture's n*c_v/k)."""
        gammas = _species_gammas(self.network)
        return sum(nden[i] / (g - 1.0) for i, g in enumerate(gammas))

    def n_total(self, nden):
        return jnp.sum(nden, axis=0)

    def mean_molecular_weight(self, nden):
        """mu in grams (reference convention: EOS_Traits mu is in grams)."""
        rho = sum(nden[i] * m * M_U_CGS
                  for i, m in enumerate(self.network.masses))
        return rho / jnp.maximum(self.n_total(nden), 1e-300)

    def gamma_eff(self, nden):
        return 1.0 + self.n_total(nden) / jnp.maximum(
            self._cv_factor(nden), 1e-300)

    def tgas_from_eint(self, nden, eint):
        """T from internal energy density (erg/cm^3) + composition."""
        return eint / (self.boltzmann_constant
                       * jnp.maximum(self._cv_factor(nden), 1e-300))

    def eint_from_tgas(self, nden, T):
        return self.boltzmann_constant * self._cv_factor(nden) * T

    def pressure(self, nden, eint):
        """P = (gamma_eff - 1) * Eint for the mixture."""
        return (self.gamma_eff(nden) - 1.0) * eint


def partial_densities_to_number_densities(rho_i, network):
    """rho_i [n_spec, ...] in g/cm^3 -> n_i in cm^-3."""
    m = jnp.asarray(network.masses, dtype=rho_i.dtype) * M_U_CGS
    return rho_i / m.reshape((-1,) + (1,) * (rho_i.ndim - 1))


def number_densities_to_partial_densities(nden, network):
    m = jnp.asarray(network.masses, dtype=nden.dtype) * M_U_CGS
    return nden * m.reshape((-1,) + (1,) * (nden.ndim - 1))


def renormalize(nden, rho_target, network):
    """Reference-parity post-burn cleanup (``Chemistry.hpp:113-140``):
    clamp positive, rescale mass fractions to the conserved density,
    reset n_e from charge conservation, rescale again."""
    small = 1e-100
    m = jnp.asarray(network.masses, dtype=nden.dtype) * M_U_CGS
    mr = m.reshape((-1,) + (1,) * (nden.ndim - 1))

    def mass_rescale(n):
        rho_sum = jnp.sum(n * mr, axis=0)
        return n * (rho_target / jnp.maximum(rho_sum, 1e-300))[None]

    nden = mass_rescale(jnp.maximum(nden, small))
    # n_e := sum of ion charges (reference Chemistry.hpp:124-126; electron
    # is species 0 in our ordering with charge -1)
    ne = sum(float(c) * nden[i]
             for i, c in enumerate(network.charges) if c > 0.0)
    ne = ne - sum(-float(c) * nden[i]
                  for i, c in enumerate(network.charges)
                  if c < 0.0 and i != 0)
    nden = nden.at[0].set(jnp.maximum(ne, small))
    return mass_rescale(jnp.maximum(nden, small))


def strang_chemistry_step(
    U: jnp.ndarray,
    dt,
    network: PrimordialNetwork,
    chem_eos: ChemEOS,
    *,
    n_mscalars: int,
    min_density: float = 0.0,
    n_subcycles: int = 4,
):
    """Burn the chemical network over `dt` in every cell (reference
    `computeChemistry`, ``Chemistry.hpp:31-173``).

    Species live in the leading `n_mscalars` scalar slots as partial
    densities.  Returns (U_new, ok): `ok` is a scalar success flag
    (all-finite burn) consumed by the hydro retry ladder, mirroring the
    reference's burn_success -> retry contract.
    """
    ns = n_mscalars
    rho = U[RHO]
    rho_i = U[SCALAR0:SCALAR0 + ns]
    ke = 0.5 * (U[MX1] ** 2 + U[MX2] ** 2 + U[MX3] ** 2) / rho
    eint = U[EGAS] - ke

    nden = partial_densities_to_number_densities(rho_i, network)
    T = chem_eos.tgas_from_eint(nden, eint)
    rho_spec_sum = jnp.sum(rho_i, axis=0)

    # batched burn: y [..., n_spec] per cell at fixed T
    y0 = jnp.moveaxis(nden, 0, -1)
    y1 = backward_euler_newton(
        network.rhs, y0, dt, params=T, n_subcycles=n_subcycles
    )
    ok = jnp.all(jnp.isfinite(y1))

    nden_new = jnp.moveaxis(y1, -1, 0)
    nden_new = renormalize(nden_new, rho_spec_sum, network)

    # skip cells below the chemistry density cutoff (reference
    # min_density_allowed, Chemistry.hpp:77-80)
    if min_density > 0.0:
        burn_mask = rho >= min_density
        nden_new = jnp.where(burn_mask[None], nden_new, nden)

    rho_i_new = number_densities_to_partial_densities(nden_new, network)
    U = U.at[SCALAR0:SCALAR0 + ns].set(rho_i_new)
    return U, ok


@dataclass(frozen=True)
class MixtureHydroEOS(IdealGasEOS):
    """Composition-aware gamma-law mixture EOS for the HYDRO solve.

    The reference routes every hydro EOS call (cons<->prim pressure, sound
    speed, Riemann interface states) through the chemistry EOS when the
    network is compiled in (``src/hydro/EOS.hpp:82-112``); with fixed
    traits an H2-rich gas gets the wrong gamma (mixture gamma -> 1.4).
    This subclass keeps every `IdealGasEOS` method as the COMPOSITION-FREE
    fallback (used where no species data is in scope -- e.g. radiation
    coupling) and adds `gamma_of_scalars`, which the hydro kernels call
    with the state's species partial-density block to get the per-cell
    (or per-face) effective gamma:

        gamma_eff = 1 + n_tot / sum_i n_i/(gamma_i - 1)

    gamma_eff depends only on composition RATIOS, so it is invariant under
    the code-units density scaling (the mass scalars may be in code
    units)."""

    network: PrimordialNetwork = PrimordialNetwork()

    @property
    def n_species(self) -> int:
        return self.network.n_species

    def gamma_of_scalars(self, rho_i: jnp.ndarray) -> jnp.ndarray:
        """Per-cell effective gamma from the species partial densities
        [n_species, ...]; cells with degenerate composition (all species
        at/below zero) fall back to the trait gamma."""
        shape = (-1,) + (1,) * (rho_i.ndim - 1)
        m = jnp.asarray(self.network.masses, rho_i.dtype).reshape(shape)
        gi = jnp.asarray(_species_gammas(self.network), rho_i.dtype
                         ).reshape(shape)
        nden = jnp.maximum(rho_i, 0.0) / m  # per-m_u units: ratios only
        ntot = jnp.sum(nden, axis=0)
        cv = jnp.sum(nden / (gi - 1.0), axis=0)
        ok = cv > 0.0
        return jnp.where(
            ok, 1.0 + ntot / jnp.where(ok, cv, 1.0),
            jnp.asarray(self.gamma, rho_i.dtype),
        )

    def mu_of_scalars(self, rho_i: jnp.ndarray) -> jnp.ndarray:
        """Per-cell mean molecular weight [g] from partial densities
        (composition ratios only; for temperature diagnostics)."""
        shape = (-1,) + (1,) * (rho_i.ndim - 1)
        m = jnp.asarray(self.network.masses, rho_i.dtype).reshape(shape)
        nden = jnp.maximum(rho_i, 0.0) / m
        ntot = jnp.maximum(jnp.sum(nden, axis=0), 1e-30)
        return jnp.sum(nden * m, axis=0) / ntot * M_U_CGS
