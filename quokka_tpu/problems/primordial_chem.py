"""Primordial chemistry burn test (single-zone, chemistry-in-the-solver).

The analog of the reference's PrimordialChem problem
(``src/problems/PrimordialChem/test_primordial_chem.cpp`` +
``tests/primordial_chem.in``): a uniform quiescent gas of primordial
composition (mostly neutral H + He with a trace ionized fraction and a
trace of D) is evolved with `chemistry.enabled = 1` so the 12-species
network burns as a Strang-split source inside the hydro advance, exactly
the code path a production chemistry run uses (reference
``QuokkaSimulation.hpp:520-563`` + ``Chemistry.hpp:31-173``).

The reference deck initializes number densities via
`primordial_chem.primary_species_*` at T = 1e2 K and runs 5 coarse steps
to > 1 Gyr; its pass criterion is a successful (non-aborting) burn.  Here
the acceptance checks are stronger: H/D/He nuclei and charge conservation
to roundoff, positive finite species everywhere, and net recombination at
100 K (the ionized fraction must not grow).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..eos import M_U_CGS
from ..indices import EGAS, EINT
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

# reference deck values (tests/primordial_chem.in): number densities in
# cm^-3 for the dominant species -- H+ 1e-4, H 1e0, D+ 1e-6, He 0.0775,
# everything else trace; n_e from exact charge neutrality (the reference's
# Chemistry.hpp:124-126 resets n_e from the ion charges every burn)
N_H = 1.0e0
N_HP = 1.0e-4
N_DP = 1.0e-6
N_HE = 0.0775e0
N_TRACE = 1.0e-40
N_E = N_HP + N_DP
T_INIT = 1.0e2  # K (primordial_chem.temperature)


@register_problem
class PrimordialChemProblem(Problem):
    name = "PrimordialChem"
    # species order: e, H, Hp, Hm, H2, H2p, D, Dp, HD, He, Hep, Hepp
    physics = PhysicsTraits(hydro_enabled=True, n_scalars=12, n_mscalars=12)
    eos_traits = EOSTraits(gamma=5.0 / 3.0,
                           mean_molecular_weight=1.23 * M_U_CGS)
    bcs = BCSpec(x=(BC_OUTFLOW, BC_OUTFLOW), y=(BC_OUTFLOW, BC_OUTFLOW),
                 z=(BC_OUTFLOW, BC_OUTFLOW))
    chemistry_network = PrimordialNetwork()

    def initial_number_densities(self, dtype=jnp.float64):
        n = [N_E, N_H, N_HP, N_TRACE, N_TRACE, N_TRACE,
             N_TRACE, N_DP, N_TRACE, N_HE, N_TRACE, N_TRACE]
        return jnp.asarray(n, dtype=dtype)

    def set_initial_conditions(self, grid):
        shape = grid.n_cell
        nden0 = self.initial_number_densities()
        nden = jnp.broadcast_to(
            nden0.reshape(-1, 1, 1, 1), (12, *shape)
        )
        rho_i = number_densities_to_partial_densities(nden, self.chemistry_network)
        rho = jnp.sum(rho_i, axis=0)

        chem_eos = ChemEOS(network=self.chemistry_network)
        eint = chem_eos.eint_from_tgas(nden, T_INIT)

        zeros = jnp.zeros(shape)
        U = jnp.concatenate([
            jnp.stack([rho, zeros, zeros, zeros, eint, eint]),
            rho_i,
        ])
        return U
