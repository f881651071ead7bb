"""Integrated StarCluster-class run: AMR + self-gravity + tabulated
cooling in ONE simulation, with physical acceptance criteria.

The reference's ``tests/StarCluster_AMR.in`` runs its StarCluster problem
(turbulent self-gravitating cloud, ``src/problems/StarCluster/
star_cluster.cpp``) at 512^3 + 4 levels with do_subcycle=0 to a half
free-fall time. This scales the same *combined* physics path (density-
tagged AMR hierarchy + composite Poisson solve + Strang cooling at every
level + refluxing) to CI size and asserts the physics, not just absence
of crashes:

  1. collapse onset: the cloud's peak density grows substantially under
     self-gravity within a fraction of the free-fall time;
  2. the hierarchy actually refines onto the collapsing region;
  3. mass is conserved through regridding/refluxing to roundoff;
  4. cooling is active: the Strang step drains internal energy relative
     to an adiabatic twin run.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from quokka_tpu import ParmParse
from quokka_tpu.amr.hierarchy import AMRSimulation
from quokka_tpu.indices import EINT, RHO
from quokka_tpu.microphysics.cooling import CoolingTable
from quokka_tpu.problems.star_cluster import RHO_CLOUD, StarClusterProblem


def _code_units_cooling_table():
    """Lambda(T) = 10*T in CODE units (the StarCluster problem runs with
    kB = mu = 1, so T ~ P/rho ~ 0.1): cooling time ~0.15 for the cloud,
    a good fraction of the run -- active but not stiff."""
    logT = np.linspace(-4.0, 2.0, 40)
    logL = logT + 1.0
    return CoolingTable(tuple(logT), tuple(logL))


class StarClusterAMR(StarClusterProblem):
    """Density tagging like the reference's `ErrorEst` (refine where
    rho exceeds a threshold, ``star_cluster.cpp`` tags on density)."""

    def error_est(self, sim, level):
        # slightly above the initial cloud density: refinement engages as
        # soon as turbulent compression + infall overdensities form, so
        # the run exercises mid-run regridding (the reference tags on
        # density thresholds the same way)
        return sim.level_U[level][RHO] > 1.15 * RHO_CLOUD


def _run(n, max_level, cooling, steps):
    extra = ""
    if cooling:
        extra = "cooling.enabled = 1\ncooling.T_floor = 1.0e-6\n"
    pp = ParmParse.from_string(
        f"""
        geometry.prob_lo = -1.0 -1.0 -1.0
        geometry.prob_hi = 1.0 1.0 1.0
        amr.n_cell = {n} {n} {n}
        amr.max_level = {max_level}
        amr.n_error_buf = 2
        do_reflux = 1
        do_subcycle = 0
        gravity.Gconst = 4.0
        cfl = 0.25
        max_timesteps = {steps}
        stop_time = 1.0e10
        verbose = 0
        """
        + extra
    )
    prob = StarClusterAMR()
    if cooling:
        prob.cooling_table = _code_units_cooling_table()
    sim = AMRSimulation(prob, pp, precision="double")
    sim.set_initial_conditions()
    rho_max0 = max(
        float(jnp.max(sim.level_U[l][RHO]))
        for l in range(sim.finest_level + 1)
    )
    sim.evolve()
    rho_max1 = max(
        float(jnp.max(sim.level_U[l][RHO]))
        for l in range(sim.finest_level + 1)
    )
    eint_c = float(jnp.sum(sim.level_U[0][EINT]))
    return sim, rho_max0, rho_max1, eint_c


@pytest.mark.slow
def test_star_cluster_amr_gravity_cooling():
    n, steps = 32, 28
    sim, r0, r1, eint_cool = _run(n, 1, cooling=True, steps=steps)

    # (2) the hierarchy refined onto the collapsing core (mid-run regrid:
    # the IC sits below the tag threshold, infall crosses it ~step 21)
    assert sim.finest_level >= 1, "density tagging never refined"

    # (1) collapse onset: peak density grows monotonically under
    # self-gravity (G=4: t_ff ~ 0.09; the ambient sound speed CFL-limits
    # dt to ~1e-3, so 28 steps see the onset, not the full collapse --
    # measured growth 10 -> 11.8 by step 24 and accelerating)
    assert r1 > 1.15 * r0, f"no collapse: rho_max {r0} -> {r1}"

    # (3) conservation budget through regrid + reflux: the composite
    # audit tracks mass to roundoff (gravity adds momentum/energy
    # sources, so only mass must telescope)
    cons = sim.conservation_rel_err
    assert abs(cons[RHO]) < 1e-10, f"mass drift {cons[RHO]}"

    # (4) cooling actually drains internal energy vs an adiabatic twin
    _, _, _, eint_adiab = _run(n, 1, cooling=False, steps=steps)
    assert eint_cool < 0.98 * eint_adiab, (
        f"cooling inactive: {eint_cool} vs adiabatic {eint_adiab}"
    )
