"""In-kernel flux-register seeding (the benchmark-scale AMR root mode).

The seeded lean root step (`hierarchy._get_root_seeded_step`) must
reproduce the classic padded return_fluxes root + XLA seed
(`_reflux_corr`) path: same update, same register correction, to FMA
contraction (the lean kernels associate the divergence differently --
see `_advance_hydro_rk2_lean`'s docstring; tests/test_lean_update.py
pins the single-step equivalence of the two formulations)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quokka_tpu import ParmParse
from quokka_tpu.amr.hierarchy import AMRSimulation
from quokka_tpu.problems.radhydro_shell import RadhydroShellProblem

DECK = """
geometry.prob_lo = 0.0 0.0 0.0
geometry.prob_hi = 4.0 4.0 4.0
amr.n_cell = 32 32 32
amr.max_level = 1
amr.n_error_buf = 3
amr.sparse_min_level = 1
amr.tile_size = 16 16 16
amr.pool_packed = 1
amr.packed_chunk = 16
hydro.use_pallas = 1
do_reflux = 1
do_subcycle = 1
cfl = 0.3
radiation.cfl = 0.3
radiation.max_substeps = 10
density_floor = 1.0e-8
max_timesteps = 3
stop_time = 1.0e10
verbose = 0
"""


def _run(seeded: bool):
    pp = ParmParse.from_string(DECK)
    sim = AMRSimulation(RadhydroShellProblem(), pp, precision="single")
    if not seeded:
        sim._root_seed_ok = False  # force the classic padded root path
    sim.set_initial_conditions()
    assert sim._root_seeded_eligible() == seeded
    sim.evolve()
    return np.asarray(sim.level_U[0])


def test_seeded_root_matches_classic():
    u_classic = _run(False)
    u_seeded = _run(True)
    assert np.all(np.isfinite(u_seeded))
    # lean vs classic formulations agree to f32 roundoff; three steps of
    # radhydro shell amplify by a small factor
    denom = np.maximum(np.abs(u_classic), 1e-12)
    rel = np.max(np.abs(u_seeded - u_classic) / denom)
    assert rel < 5e-4, f"seeded-vs-classic rel diff {rel}"
