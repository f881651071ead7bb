"""Chemistry integrated into the solver (end-to-end PrimordialChem).

The reference burns its Microphysics network as a Strang-split source
inside the hydro advance (``QuokkaSimulation.hpp:520-563`` +
``Chemistry.hpp:31-173``) and runs the PrimordialChem problem
(``tests/primordial_chem.in``: T=100 K, n_H~1, x_e~1e-4, 5 coarse steps to
>1 Gyr).  These tests run the same configuration through `evolve()` --
species as mass scalars, CMA advection, burn-failure -> retry ladder --
not a standalone network unit test.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from quokka_tpu import ParmParse, Simulation
from quokka_tpu.indices import RHO, SCALAR0
from quokka_tpu.microphysics.chem_coupling import (
    ChemEOS,
    partial_densities_to_number_densities,
)
from quokka_tpu.problems.primordial_chem import PrimordialChemProblem

CFG = """
amr.n_cell = 4 1 1
geometry.prob_lo = 0.0 0.0 0.0
geometry.prob_hi = 1.0 1.0 1.0
cfl = 0.25
stop_time = 5e16
max_timesteps = 5
chemistry.enabled = 1
hydro.reconstruction_order = 2
verbose = 0
"""


@pytest.fixture(scope="module")
def evolved():
    prob = PrimordialChemProblem()
    sim = Simulation(prob, ParmParse.from_string(CFG))
    sim.set_initial_conditions()
    U0 = np.asarray(sim.U).copy()
    sim.evolve()
    return prob, sim, U0


def _ndens(prob, U):
    rho_i = jnp.asarray(U[SCALAR0:SCALAR0 + 12])
    return np.asarray(
        partial_densities_to_number_densities(rho_i, prob.chemistry_network)
    )


def test_burn_runs_and_stays_finite(evolved):
    """The reference test's own criterion: 5 coarse steps complete with a
    successful burn every step (its dt is CFL-limited on quiescent gas, so
    like the reference this exercises the code path, not Gyr of chemistry;
    the long-dt physics is covered by test_long_burn_recombination)."""
    prob, sim, _ = evolved
    assert sim.istep == 5
    U = np.asarray(sim.U)
    assert np.all(np.isfinite(U))
    assert np.all(U[SCALAR0:SCALAR0 + 12] > 0.0)


def test_nuclei_and_charge_conservation(evolved):
    prob, sim, U0 = evolved
    net = prob.chemistry_network
    n0 = np.moveaxis(_ndens(prob, U0), 0, -1)
    n1 = np.moveaxis(_ndens(prob, np.asarray(sim.U)), 0, -1)
    for tot0, tot1, name in zip(
        net.conserved_totals(jnp.asarray(n0)),
        net.conserved_totals(jnp.asarray(n1)),
        ("H", "D", "He", "charge"),
    ):
        tot0, tot1 = np.asarray(tot0), np.asarray(tot1)
        scale = np.abs(tot0).max() if name != "charge" else np.abs(n1[..., 0]).max()
        assert np.all(np.abs(tot1 - tot0) <= 1e-6 * scale + 1e-30), name


def test_long_burn_recombination():
    """The Strang burn kernel itself over ~1.6 Gyr (the reference deck's
    stop_time): at T=100 K with x_e~1e-4 the gas recombines; nuclei and
    charge stay conserved through the stiff integration."""
    from quokka_tpu.microphysics.chem_coupling import strang_chemistry_step

    prob = PrimordialChemProblem()
    sim = Simulation(prob, ParmParse.from_string(CFG))
    sim.set_initial_conditions()
    U0 = sim.U
    U1, ok = strang_chemistry_step(
        U0, 5.0e16, prob.chemistry_network,
        ChemEOS(network=prob.chemistry_network),
        n_mscalars=12, n_subcycles=16,
    )
    assert bool(ok)
    ne0 = _ndens(prob, np.asarray(U0))[0]
    ne1 = _ndens(prob, np.asarray(U1))[0]
    # recombination: electron fraction must drop substantially over 1.6 Gyr
    assert np.all(ne1 < 0.5 * ne0)
    net = prob.chemistry_network
    n0 = jnp.moveaxis(jnp.asarray(_ndens(prob, np.asarray(U0))), 0, -1)
    n1 = jnp.moveaxis(jnp.asarray(_ndens(prob, np.asarray(U1))), 0, -1)
    for tot0, tot1, name in zip(
        net.conserved_totals(n0), net.conserved_totals(n1),
        ("H", "D", "He", "charge"),
    ):
        tot0, tot1 = np.asarray(tot0), np.asarray(tot1)
        scale = np.abs(tot0).max() if name != "charge" else float(np.max(ne1))
        assert np.all(np.abs(tot1 - tot0) <= 1e-6 * scale + 1e-30), name


def test_chem_eos_consistency(evolved):
    """T(Eint, X) from the composition EOS stays physical through the burn
    (chem-aware EOS, reference src/hydro/EOS.hpp:82-112)."""
    prob, sim, _ = evolved
    U = np.asarray(sim.U)
    nden = jnp.asarray(_ndens(prob, U))
    eos = ChemEOS(network=prob.chemistry_network)
    from quokka_tpu.indices import EGAS

    T = np.asarray(eos.tgas_from_eint(nden, jnp.asarray(U[EGAS])))
    assert np.all(T > 10.0) and np.all(T < 1.0e4)
    gam = np.asarray(eos.gamma_eff(nden))
    assert np.all(gam > 1.3) and np.all(gam <= 5.0 / 3.0 + 1e-12)
    mu = np.asarray(eos.mean_molecular_weight(nden)) / 1.66053906892e-24
    assert np.all(mu > 1.0) and np.all(mu < 1.5)
