#!/usr/bin/env python
"""Headline benchmark: Sedov blast 256^3 unigrid hydro (PPM + HLLC), f32,
plus a radhydro FOM and an f64 probe folded into the same JSON line.

Mirrors the reference's weak-scaling benchmark problems
(``tests/benchmark_unigrid_256.in`` -> HydroBlast3D, 113.34 Mzones/s on
1x V100; ``tests/radhydro_shell_256.in`` -> RadhydroShell, 22.55 on V100;
``paper/weak_scaling_hydro.csv`` / ``weak_scaling_radhydro.csv``).
Driver target (BASELINE.json): >= 50 Mzone-updates/s/chip on TPU v5e.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "Mzones/s/chip", "vs_baseline": N,
   "radhydro_mzones": ..., "radhydro_vs_v100": ...,
   "hydro_f64_mzones": ..., "f64_size": ...}
where value is the f32 hydro FOM and vs_baseline = value / 50.0.
Set QUOKKA_BENCH_MODE=radhydro for a radhydro-only headline line.
"""

import json
import os
import sys

N = int(os.environ.get("QUOKKA_BENCH_N", "256"))
STEPS = int(os.environ.get("QUOKKA_BENCH_STEPS", "10"))
MODE = os.environ.get("QUOKKA_BENCH_MODE", "hydro")  # hydro | radhydro
WITH_RADHYDRO = os.environ.get("QUOKKA_BENCH_RADHYDRO", "1") == "1"
WITH_F64 = os.environ.get("QUOKKA_BENCH_F64", "1") == "1"
F64_N = int(os.environ.get("QUOKKA_BENCH_F64_N", "128"))


def run_radhydro(n, steps, prec="single"):
    """Radhydro FOM: hydro zone-updates/s with ~10 IMEX radiation substeps
    + implicit coupling per hydro step (the reference's radiation-shell
    benchmark measures the same way)."""
    from quokka_tpu import ParmParse, Simulation
    from quokka_tpu.benchmarks import bench_radhydro
    from quokka_tpu.problems.radhydro_bench import RadhydroBenchProblem

    pp = ParmParse.from_string(
        f"""
        geometry.prob_hi = 1.0 1.0 1.0
        amr.n_cell = {n} {n} {n}
        cfl = 0.3
        radiation.cfl = 0.3
        verbose = 0
        """
    )
    sim = Simulation(RadhydroBenchProblem(), pp, precision=prec)
    sim.set_initial_conditions()
    mzones, elapsed, nsub = bench_radhydro(sim, n_warmup=1,
                                           n_steps=max(3, steps // 3))
    return mzones, nsub


def run_hydro(n, steps, prec="single"):
    from quokka_tpu import ParmParse, Simulation
    from quokka_tpu.benchmarks import bench_hydro
    from quokka_tpu.problems.sedov import SedovProblem

    pp = ParmParse.from_string(
        f"""
        geometry.prob_lo = 0.0 0.0 0.0
        geometry.prob_hi = 1.2 1.2 1.2
        amr.n_cell = {n} {n} {n}
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

        decomp = make_decomposition((n, n, n))

    sim = Simulation(SedovProblem(), pp, precision=prec, decomp=decomp)
    sim.set_initial_conditions()
    mzones, elapsed = bench_hydro(sim, n_warmup=2, n_steps=steps)
    return mzones / n_dev


def main():
    if MODE == "radhydro":
        prec = os.environ.get("QUOKKA_BENCH_PREC", "single")
        mzones, nsub = run_radhydro(N, STEPS, prec)
        print(json.dumps({
            "metric": f"RadHydro {N}^3 unigrid Mzone-updates/sec/chip "
                      f"({nsub} rad substeps/step)",
            "value": round(mzones, 3),
            "unit": "Mzones/s/chip",
            "vs_baseline": round(mzones / 22.55, 4),
        }))
        return

    result = {
        "metric": f"Sedov {N}^3 unigrid hydro PPM Mzone-updates/sec/chip",
        "unit": "Mzones/s/chip",
    }
    per_chip = run_hydro(N, STEPS, "single")
    result["value"] = round(per_chip, 3)
    result["vs_baseline"] = round(per_chip / 50.0, 4)

    if WITH_RADHYDRO:
        try:
            rh, nsub = run_radhydro(N, STEPS, "single")
            result["radhydro_mzones"] = round(rh, 3)
            result["radhydro_substeps"] = nsub
            result["radhydro_vs_v100"] = round(rh / 22.55, 4)
        except Exception as e:  # never lose the headline number
            result["radhydro_error"] = str(e)[:200]

    if WITH_F64:
        try:
            f64 = run_hydro(F64_N, max(3, STEPS // 2), "double")
            result["hydro_f64_mzones"] = round(f64, 3)
            result["f64_size"] = F64_N
        except Exception as e:
            result["hydro_f64_error"] = str(e)[:200]

    print(json.dumps(result))


if __name__ == "__main__":
    main()
