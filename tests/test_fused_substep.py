"""Fully-fused radiation substep kernels vs the per-stage path.

`radiation/pallas_substep.py` fuses each IMEX PD-ARS stage (3-axis
transport + predict/combine + the implicit Newton coupling) into one
Pallas kernel on the single-group periodic ghost-free f32 hot path. The
math is imported, not re-derived, so agreement with the unfused path is
at FMA-contraction/fusion roundoff."""

import numpy as np

import jax.numpy as jnp

from quokka_tpu import ParmParse, Simulation
from quokka_tpu.problems.radhydro_bench import RadhydroBenchProblem


def _run(fused: int, n=16, steps=3):
    pp = ParmParse.from_string(
        f"""
        geometry.prob_hi = 1.0 1.0 1.0
        amr.n_cell = {n} {n} {n}
        cfl = 0.4
        radiation.cfl = 0.4
        max_timesteps = {steps}
        stop_time = 1.0e10
        verbose = 0
        radiation.use_pallas = 1
        radiation.fused_substep = {fused}
        """
    )
    sim = Simulation(RadhydroBenchProblem(), pp, precision="single")
    sim.set_initial_conditions()
    sim.evolve()
    return sim


def test_fused_substep_matches_per_stage():
    sim_f = _run(1)
    sim_u = _run(0)
    assert sim_f.t == sim_u.t
    Uf, Uu = np.asarray(sim_f.U), np.asarray(sim_u.U)
    assert np.all(np.isfinite(Uf))
    # gas block and radiation block at f32 fusion roundoff
    np.testing.assert_allclose(Uf, Uu, rtol=5e-6, atol=5e-6)
