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


def write_plotfile(sim, prefix: str = "plt", directory: str = "."):
    """Write plt####### directory: Level_0/cell_data.npz + Header + metadata.yaml."""
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
    np.savez_compressed(os.path.join(path, "Level_0", "cell_data.npz"), **arrays)

    # AMR: write fine levels + masks as well
    finest = getattr(sim, "finest_level", 0)
    base_names = sim.layout.component_names()
    for l in range(1, finest + 1):
        lvl_dir = os.path.join(path, f"Level_{l}")
        os.makedirs(lvl_dir, exist_ok=True)
        Ul = np.asarray(sim.level_U[l])
        np.savez_compressed(
            os.path.join(lvl_dir, "cell_data.npz"),
            **{n: Ul[i] for i, n in enumerate(base_names)},
            refined_mask=np.asarray(sim.level_mask[l]),
        )

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


def read_plotfile(path: str):
    """Read a plotfile directory back: (header dict, {name: array})."""
    with open(os.path.join(path, "Header")) as f:
        header = json.load(f)
    data = dict(np.load(os.path.join(path, "Level_0", "cell_data.npz")))
    return header, data
