"""Golden-file regression tier.

Runs small fixed configurations and compares solution profiles against
stored golden arrays (tests/golden/*.npz). Catches unintended numerics
changes at roundoff-level tolerance on the same platform; regenerate with

    python tests/test_golden_regression.py --regenerate

after an INTENDED numerics change (and say so in the commit message).
Mirrors the reference's plotfile-hash regression legs (SURVEY.md section 4).
"""

import os

import numpy as np
import pytest

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")


def _run_sod():
    from quokka_tpu import ParmParse, Simulation
    from quokka_tpu.problems.shocktube import ShocktubeProblem

    pp = ParmParse.from_string("""
geometry.prob_hi = 1.0 1.0 1.0
amr.n_cell = 128 1 1
cfl = 0.4
stop_time = 0.1
max_timesteps = 2000
verbose = 0
""")
    sim = Simulation(ShocktubeProblem(), pp)
    sim.set_initial_conditions()
    sim.evolve()
    U = np.asarray(sim.U)
    return {"rho": U[0][:, 0, 0], "mom": U[1][:, 0, 0], "E": U[4][:, 0, 0]}


def _run_radcoupling():
    from quokka_tpu import ParmParse, Simulation
    from quokka_tpu.problems.rad_matter_coupling import RadMatterCouplingProblem

    pp = ParmParse.from_string("""
geometry.prob_hi = 1.0 1.0 1.0
amr.n_cell = 4 1 1
constant_dt = 1e-8
stop_time = 1e-6
max_timesteps = 100
verbose = 0
""")
    sim = Simulation(RadMatterCouplingProblem(), pp)
    sim.set_initial_conditions()
    sim.evolve()
    U = np.asarray(sim.U)
    rs = sim._radiation.rad_start
    return {"Eint": U[5][:, 0, 0], "Erad": U[rs][:, 0, 0]}


def _run_radhydro_small():
    from quokka_tpu import ParmParse, Simulation
    from quokka_tpu.problems.radhydro_bench import RadhydroBenchProblem

    pp = ParmParse.from_string("""
geometry.prob_hi = 1.0 1.0 1.0
amr.n_cell = 16 16 16
cfl = 0.3
radiation.cfl = 0.3
max_timesteps = 3
stop_time = 1.0
verbose = 0
""")
    sim = Simulation(RadhydroBenchProblem(), pp)
    sim.set_initial_conditions()
    sim.evolve()
    U = np.asarray(sim.U)
    rs = sim._radiation.rad_start
    return {"rho_slice": U[0][:, 8, 8], "Eint_slice": U[5][:, 8, 8],
            "Erad_slice": U[rs][:, 8, 8]}


CASES = {
    "sod128": _run_sod,
    "radcoupling": _run_radcoupling,
    "radhydro16": _run_radhydro_small,
}


@pytest.mark.slow
@pytest.mark.parametrize("case", sorted(CASES))
def test_golden(case):
    path = os.path.join(GOLDEN_DIR, f"{case}.npz")
    if not os.path.exists(path):
        pytest.skip(f"golden file missing; regenerate with --regenerate")
    golden = np.load(path)
    got = CASES[case]()
    for key in golden.files:
        np.testing.assert_allclose(
            got[key], golden[key], rtol=1e-12, atol=1e-300,
            err_msg=f"{case}:{key} deviates from golden profile",
        )


if __name__ == "__main__":
    import sys

    if "--regenerate" in sys.argv:
        os.makedirs(GOLDEN_DIR, exist_ok=True)
        for name, fn in CASES.items():
            np.savez_compressed(os.path.join(GOLDEN_DIR, f"{name}.npz"), **fn())
            print(f"wrote golden/{name}.npz")
