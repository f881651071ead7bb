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


def run_configured_diagnostics(sim, directory: str = "."):
    """Config-driven in-situ diagnostics (reference Factory-registered
    `quokka.diagnostics` framework, ``src/io/DiagBase.{H,cpp}`` +
    ``src/simulation.hpp:2120-2158``):

        quokka.diagnostics = d1 d2
        d1.type = DiagFramePlane        # or DiagPDF
        d1.field = gasDensity
        d1.axis = z                     # plane diags
        d1.op = sum                     # sum | min | max
        d1.interval = 10
        d2.type = DiagPDF
        d2.field = temperature
        d2.bins = 64
        d2.log = 1
    """
    names = sim.pp.get_list("quokka.diagnostics", [])
    axmap = {"x": 0, "y": 1, "z": 2}
    for dname in names:
        dpp = sim.pp.namespace(str(dname))
        interval = int(dpp.get("interval", 10))
        if interval <= 0 or sim.istep % interval != 0:
            continue
        dtype_ = dpp.get_str("type", "DiagFramePlane")
        field_name = dpp.get_str("field", "gasDensity")
        field = compute_derived_field(sim, field_name)
        if dtype_ == "DiagFramePlane":
            ax = axmap[dpp.get_str("axis", "z")]
            proj = plane_projection(field, ax, dpp.get_str("op", "sum"), sim.grid.dx[ax])
            out = f"{dname}_{field_name}_plt{sim.istep:07d}.npz"
            np.savez(os.path.join(directory, out), data=np.asarray(proj), time=sim.t)
        elif dtype_ == "DiagPDF":
            write_pdf_diagnostic(
                sim,
                {
                    "field": field_name,
                    "bins": int(dpp.get("bins", 64)),
                    "log": bool(int(dpp.get("log", 0))),
                    "weight_field": dpp.get("weight_field"),
                },
                directory,
            )
        else:
            raise ValueError(f"unknown diagnostic type {dtype_}")


def weighted_pdf(
    field: jnp.ndarray,
    bins: int = 64,
    range=None,
    weights: jnp.ndarray | None = None,
    log_spaced: bool = False,
    filters=(),
):
    """Filtered, weighted histogram of a cell field (reference `DiagPDF` /
    `DiagFilter`, ``src/io/DiagPDF.{H,cpp}``): `filters` is a sequence of
    boolean masks ANDed together; weights default to 1 per cell."""
    x = field.ravel()
    w = jnp.ones_like(x) if weights is None else weights.ravel()
    for f in filters:
        w = w * f.ravel().astype(w.dtype)
    if log_spaced:
        x = jnp.log10(jnp.maximum(x, 1e-300))
        if range is not None:
            range = (float(jnp.log10(range[0])), float(jnp.log10(range[1])))
    if range is None:
        range = (float(jnp.min(x)), float(jnp.max(x)))
    hist = jnp.histogram(x, bins=bins, range=range, weights=w)[0]
    edges = jnp.linspace(range[0], range[1], bins + 1)
    return hist, edges


def write_pdf_diagnostic(sim, spec: dict, directory: str = "."):
    """Write a PDF diagnostic to `pdf_<field>_#######.npz`. `spec` keys:
    field (name), bins, range, log (bool), weight_field (optional)."""
    field = compute_derived_field(sim, spec["field"])
    weights = None
    if spec.get("weight_field"):
        weights = compute_derived_field(sim, spec["weight_field"])
    hist, edges = weighted_pdf(
        field,
        bins=int(spec.get("bins", 64)),
        range=spec.get("range"),
        weights=weights,
        log_spaced=bool(spec.get("log", False)),
    )
    name = f"pdf_{spec['field']}_{sim.istep:07d}.npz"
    np.savez(
        os.path.join(directory, name),
        hist=np.asarray(hist), edges=np.asarray(edges), time=sim.t,
    )
    return name


def compute_derived_field(sim, name: str, U=None):
    """Built-in derived variables (reference per-problem `ComputeDerivedVar`
    plus common built-ins); falls back to the problem hook. `U` overrides
    the state to evaluate on (e.g. a fine AMR level); default level 0."""
    from ..hydro import euler
    from ..indices import EGAS, MX1, MX2, MX3, RHO

    if U is None:
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
