#!/usr/bin/env python
"""CLI runner: `python run.py decks/shocktube.in [key=value ...]`.

The quokka_tpu analog of the reference's per-problem executables
(``src/main.cpp:18-70``): loads a deck, instantiates the registered problem
named by its `problem` key, runs `evolve()`, and reports the elapsed-time /
FOM summary. CLI overrides follow the deck path, AMReX-style.
"""

import os
import sys
import time


def main(argv):
    if not argv:
        print("usage: python run.py <deck.in> [key=value ...]")
        return 2

    if os.environ.get("QUOKKA_PLATFORM"):
        # explicit backend override (e.g. QUOKKA_PLATFORM=cpu for debugging;
        # the site config may pre-select a default platform at import time)
        import jax

        jax.config.update("jax_platforms", os.environ["QUOKKA_PLATFORM"])

    from quokka_tpu import ParmParse, Simulation
    from quokka_tpu import problems  # noqa: F401  (registers the catalog)
    from quokka_tpu.registry import get_problem, problem_names

    pp = ParmParse.from_file(argv[0], overrides=argv[1:])
    name = pp.get_str("problem")
    try:
        prob_cls = get_problem(name)
    except KeyError:
        print(f"unknown problem '{name}'; available: {', '.join(problem_names())}")
        return 2

    max_level = pp.get_int("amr.max_level", 0)
    if hasattr(prob_cls, "set_initial_conditions_mhd"):
        # constrained-transport MHD problems run their own driver
        from quokka_tpu.mhd import MHDSimulation as SimCls
    elif max_level > 0:
        from quokka_tpu.amr import AMRSimulation as SimCls
    else:
        SimCls = Simulation

    t0 = time.perf_counter()
    sim = SimCls(prob_cls(), pp)
    sim.set_initial_conditions()
    sim.evolve()
    elapsed = time.perf_counter() - t0
    print(f"elapsed time: {elapsed:.3f} s")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
