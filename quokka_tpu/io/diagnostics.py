"""In-situ diagnostics: projections, statistics time series, profiles.

TPU-native rebuild of the reference's observability stack (reference
``src/simulation.hpp:2394-2546`` and ``QuokkaSimulation.hpp:845-884``):

  - axis-aligned plane projections (sum or min along an axis) of derived
    quantities, written as 2D plotfiles (`computePlaneProjection` /
    `WriteProjectionPlotfile`);
  - user statistics appended to ``history.txt`` with a header
    (`WriteStatisticsFile`);
  - 1D axis-aligned profiles (`computeAxisAlignedProfile`, the reference's
    `amrex::sumToLine`).

All reductions are jnp one-liners over the dense level array.
"""

from __future__ import annotations

import os
from typing import Callable, Dict

import jax.numpy as jnp
import numpy as np


def plane_projection(field: jnp.ndarray, axis: int, op: str = "sum", dx: float = 1.0):
    """Project a 3D cell field along `axis`. op='sum' integrates (times dx,
    giving a column integral); op='min' takes the minimum along the ray."""
    if op == "sum":
        return jnp.sum(field, axis=axis) * dx
    if op == "min":
        return jnp.min(field, axis=axis)
    if op == "max":
        return jnp.max(field, axis=axis)
    raise ValueError(op)


def axis_profile(field: jnp.ndarray, axis: int):
    """Mean profile along `axis` (averaging over the transverse plane)."""
    axes = tuple(a for a in range(3) if a != axis)
    return jnp.mean(field, axis=axes)


def write_projection(sim, dirs=("z",), prefix: str = "proj", directory: str = "."):
    """Write projection plotfiles `proj_{dir}_plt#######` (reference
    `WriteProjectionPlotfile`). Projects the problem's `ComputeProjections`
    map, defaulting to gas density."""
    axmap = {"x": 0, "y": 1, "z": 2}
    for dname in dirs:
        ax = axmap[dname]
        projections = {}
        try:
            projections = sim.problem.compute_projections(sim, ax)
        except AttributeError:
            pass
        if not projections:
            from ..indices import RHO

            projections = {
                "gasDensity": plane_projection(sim.U[RHO], ax, "sum", sim.grid.dx[ax])
            }
        name = f"{prefix}_{dname}_plt{sim.istep:07d}"
        path = os.path.join(directory, name)
        os.makedirs(path, exist_ok=True)
        np.savez_compressed(
            os.path.join(path, "projection.npz"),
            **{k: np.asarray(v) for k, v in projections.items()},
            time=sim.t,
        )


def write_statistics(sim, filename: str = "history.txt", directory: str = "."):
    """Append the problem's statistics map to history.txt (reference
    `WriteStatisticsFile`, ``src/simulation.hpp:2504-2546``)."""
    stats = {"time": sim.t, "cycle": sim.istep}
    stats.update(sim.problem.compute_statistics(sim))
    path = os.path.join(directory, filename)
    write_header = not os.path.exists(path)
    with open(path, "a") as f:
        if write_header:
            f.write("# " + " ".join(stats.keys()) + "\n")
        f.write(" ".join(f"{float(v):.14e}" for v in stats.values()) + "\n")


def compute_derived_field(sim, name: str):
    """Built-in derived variables (reference per-problem `ComputeDerivedVar`
    plus common built-ins); falls back to the problem hook."""
    from ..hydro import euler
    from ..indices import EGAS, MX1, MX2, MX3, RHO

    U = sim.U
    if name == "gasDensity":
        return U[RHO]
    if name == "pressure":
        return euler.pressure(U, sim.eos)
    if name == "temperature":
        rho = U[RHO]
        ke = 0.5 * (U[MX1] ** 2 + U[MX2] ** 2 + U[MX3] ** 2) / rho
        return sim.eos.tgas_from_eint(rho, U[EGAS] - ke)
    if name == "velocity_magnitude":
        rho = U[RHO]
        return jnp.sqrt(U[MX1] ** 2 + U[MX2] ** 2 + U[MX3] ** 2) / rho
    if name == "sound_speed":
        return sim.eos.sound_speed(U[RHO], euler.pressure(U, sim.eos))
    return sim.problem.compute_derived_var(name, sim)
