"""Plotfile output: snapshot directories with data + metadata.

TPU-native analog of the reference's BoxLib-format plotfiles + metadata.yaml
(reference ``src/simulation.hpp:2294-2392``). Data is stored as one ``.npz``
per level (component-named arrays) plus a YAML metadata file -- a dense-array
format that round-trips losslessly and is trivially readable from Python
(yt-style consumers can be added on top).
"""

from __future__ import annotations

import json
import os
from typing import Dict

import numpy as np


def _write_yaml(path: str, mapping: Dict):
    """Tiny YAML writer (scalars + flat maps only, like the reference's
    metadata.yaml)."""
    with open(path, "w") as f:
        for k, v in mapping.items():
            f.write(f"{k}: {v}\n")


def _write_level(lvl_dir: str, arrays: dict) -> None:
    """One level's component arrays: through the native C++ async writer
    (the VisMF-equivalent -- the thread pool streams raw arrays to disk
    while the device keeps computing, reference `WriteMultiLevelPlotfile`
    via AMReX AsyncOut, ``src/simulation.hpp:2294-2334``), falling back to
    a synchronous compressed npz when the extension is unavailable."""
    from . import native

    if native.available():
        ok = True
        for n, a in arrays.items():
            ok &= native.write_array_async(
                os.path.join(lvl_dir, f"{n}.qka"), np.asarray(a)
            )
        if ok:
            return
    np.savez_compressed(os.path.join(lvl_dir, "cell_data.npz"), **arrays)


def _read_level(lvl_dir: str) -> dict:
    """Read one level's arrays from either on-disk format."""
    npz = os.path.join(lvl_dir, "cell_data.npz")
    if os.path.exists(npz):
        return dict(np.load(npz))
    from . import native

    out = {}
    for fn in sorted(os.listdir(lvl_dir)):
        if fn.endswith(".qka"):
            out[fn[:-4]] = native.read_array(os.path.join(lvl_dir, fn))
    return out


def write_plotfile(sim, prefix: str = "plt", directory: str = "."):
    """Write plt####### directory: per-component arrays (native async
    writer) + Header + metadata.yaml."""
    name = f"{prefix}{sim.istep:07d}"
    path = os.path.join(directory, name)
    os.makedirs(os.path.join(path, "Level_0"), exist_ok=True)

    names = sim.layout.component_names()
    U = np.asarray(sim.U)
    arrays = {n: U[i] for i, n in enumerate(names)}
    # derived variables (reference `derived_vars` ParmParse key)
    for dv in getattr(sim, "derived_vars", []):
        from .diagnostics import compute_derived_field

        arrays[dv] = np.asarray(compute_derived_field(sim, dv))
        names = names + [dv]
    _write_level(os.path.join(path, "Level_0"), arrays)

    # AMR: write fine levels + masks as well
    finest = getattr(sim, "finest_level", 0)
    base_names = sim.layout.component_names()
    for l in range(1, finest + 1):
        lvl_dir = os.path.join(path, f"Level_{l}")
        os.makedirs(lvl_dir, exist_ok=True)
        Ul = np.asarray(sim.level_U[l])
        arrays_l = {n: Ul[i] for i, n in enumerate(base_names)}
        arrays_l["refined_mask"] = np.asarray(sim.level_mask[l])
        _write_level(lvl_dir, arrays_l)

    header = {
        "plotfile_version": "quokka_tpu-1.0",
        "ncomp": len(names),
        "components": names,
        "time": sim.t,
        "istep": sim.istep,
        "finest_level": int(finest),
        "n_cell": list(sim.grid.n_cell),
        "prob_lo": list(sim.grid.prob_lo),
        "prob_hi": list(sim.grid.prob_hi),
    }
    with open(os.path.join(path, "Header"), "w") as f:
        json.dump(header, f, indent=1)

    _write_yaml(os.path.join(path, "metadata.yaml"), getattr(sim, "metadata", {}))
    return path


def write_plotfile_mhd(sim, prefix: str = "plt", directory: str = "."):
    """Plotfile for the CT MHD driver: gas components plus the staggered
    face B averaged to cell centers (the reference's `AverageFCToCC`
    plotfile path, ``src/simulation.hpp:2031-2118``) and the face fields
    themselves."""
    import jax.numpy as jnp

    from ..mhd.advance import b_cell_from_faces

    name = f"{prefix}{sim.istep:07d}"
    path = os.path.join(directory, name)
    os.makedirs(os.path.join(path, "Level_0"), exist_ok=True)

    gas_names = ["gasDensity", "x-GasMomentum", "y-GasMomentum",
                 "z-GasMomentum", "gasEnergy"]
    U = np.asarray(sim.U)
    arrays = {n: U[i] for i, n in enumerate(gas_names)}
    B_cc = np.asarray(b_cell_from_faces([jnp.asarray(b) for b in sim.Bf]))
    for d, ax in enumerate("xyz"):
        arrays[f"{ax}-BField-cc"] = B_cc[d]
        arrays[f"{ax}-BField-face"] = np.asarray(sim.Bf[d])
    _write_level(os.path.join(path, "Level_0"), arrays)

    header = {
        "plotfile_version": "quokka_tpu-1.0",
        "solver": "mhd-ct",
        "ncomp": len(arrays),
        "components": list(arrays),
        "time": sim.t,
        "istep": sim.istep,
        "finest_level": 0,
        "n_cell": list(sim.grid.n_cell),
        "prob_lo": list(sim.grid.prob_lo),
        "prob_hi": list(sim.grid.prob_hi),
    }
    with open(os.path.join(path, "Header"), "w") as f:
        json.dump(header, f, indent=1)
    _write_yaml(os.path.join(path, "metadata.yaml"),
                getattr(sim, "metadata", {}))
    return path


def read_plotfile(path: str, level: int = 0):
    """Read a plotfile directory back: (header dict, {name: array}).

    Drains the native writer first so a read-after-write in the same
    process sees complete files."""
    from . import native

    native.drain()
    with open(os.path.join(path, "Header")) as f:
        header = json.load(f)
    data = _read_level(os.path.join(path, f"Level_{level}"))
    return header, data
