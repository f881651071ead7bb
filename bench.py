#!/usr/bin/env python
"""Headline benchmark: Sedov blast 256^3 unigrid hydro (PPM + HLLC), f32.

Mirrors the reference's weak-scaling benchmark problem
(``tests/benchmark_unigrid_256.in`` driving
``src/problems/HydroBlast3D/test_hydro3d_blast.cpp``; reference baseline
113.34 Mzones/s on 1x V100, 254 on 1x A100, ``paper/weak_scaling_hydro.csv``).
Driver target (BASELINE.json): >= 50 Mzone-updates/s/chip on TPU v5e.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "Mzones/s/chip", "vs_baseline": N}
where vs_baseline is value / 50.0 (the BASELINE.json v5e target).
"""

import json
import os
import sys

N = int(os.environ.get("QUOKKA_BENCH_N", "256"))
STEPS = int(os.environ.get("QUOKKA_BENCH_STEPS", "10"))
MODE = os.environ.get("QUOKKA_BENCH_MODE", "hydro")  # hydro | radhydro


def main_radhydro():
    """Radhydro FOM: hydro zone-updates/s with ~10 IMEX radiation substeps
    + implicit coupling per hydro step (the reference's radiation-shell
    benchmark measures the same way; 22.55 Mzones/GPU/s on V100)."""
    from quokka_tpu import ParmParse, Simulation
    from quokka_tpu.benchmarks import bench_radhydro
    from quokka_tpu.problems.radhydro_bench import RadhydroBenchProblem

    pp = ParmParse.from_string(
        f"""
        geometry.prob_hi = 1.0 1.0 1.0
        amr.n_cell = {N} {N} {N}
        cfl = 0.3
        radiation.cfl = 0.3
        verbose = 0
        """
    )
    prec = os.environ.get("QUOKKA_BENCH_PREC", "single")
    sim = Simulation(RadhydroBenchProblem(), pp, precision=prec)
    sim.set_initial_conditions()
    mzones, elapsed, nsub = bench_radhydro(sim, n_warmup=1, n_steps=max(3, STEPS // 3))
    print(
        json.dumps(
            {
                "metric": f"RadHydro {N}^3 unigrid Mzone-updates/sec/chip ({nsub} rad substeps/step)",
                "value": round(mzones, 3),
                "unit": "Mzones/s/chip",
                "vs_baseline": round(mzones / 22.55, 4),
            }
        )
    )


def main():
    if MODE == "radhydro":
        return main_radhydro()

    from quokka_tpu import ParmParse, Simulation
    from quokka_tpu.benchmarks import bench_hydro
    from quokka_tpu.problems.sedov import SedovProblem

    pp = ParmParse.from_string(
        f"""
        geometry.prob_lo = 0.0 0.0 0.0
        geometry.prob_hi = 1.2 1.2 1.2
        amr.n_cell = {N} {N} {N}
        cfl = 0.3
        hydro.reconstruction_order = 3
        verbose = 0
        """
    )
    import jax

    n_dev = len(jax.devices())
    decomp = None
    if n_dev > 1:
        from quokka_tpu.parallel.decomp import make_decomposition

        decomp = make_decomposition((N, N, N))

    sim = Simulation(SedovProblem(), pp, precision="single", decomp=decomp)
    sim.set_initial_conditions()

    mzones, elapsed = bench_hydro(sim, n_warmup=2, n_steps=STEPS)
    per_chip = mzones / n_dev

    print(
        json.dumps(
            {
                "metric": f"Sedov {N}^3 unigrid hydro PPM Mzone-updates/sec/chip",
                "value": round(per_chip, 3),
                "unit": "Mzones/s/chip",
                "vs_baseline": round(per_chip / 50.0, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
