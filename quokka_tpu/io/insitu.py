"""In-situ rendering: PNG images produced during the run.

TPU-native analog of the reference's optional Ascent integration
(reference ``src/simulation.hpp:2209-2280``: a pseudocolor scene of
``gasDensity`` rendered every ``ascent_interval`` steps to
``render_density%05d.png``). Ascent volume-renders the AMR mesh through
Conduit; here the dense-array design makes in-situ imaging trivial — a
configured reduction (slice or projection) of any state/derived field is
rendered straight to PNG with matplotlib, AMR fine levels composited onto
the base grid where their masks are live.

Deck keys (``ascent_interval`` matches the reference's ParmParse name,
``src/simulation.hpp:561``)::

    ascent_interval = 10          # steps between renders (-1 = off)
    render.fields = gasDensity    # one image per field per render
    render.mode = slice           # slice | projection
    render.axis = z               # view axis
    render.log = 1                # log10 color scale
    render.cmap = viridis
"""

from __future__ import annotations

import os
from typing import List, Optional

import numpy as np


def composite_field(sim, field: str) -> np.ndarray:
    """The field on the finest-available grid: level-0 data prolonged by
    nearest-neighbour, overwritten by each live fine-level region (the
    dense-mask analog of the reference's MultiLevelToBlueprint,
    ``src/simulation.hpp:2270``)."""
    from .diagnostics import compute_derived_field

    names = sim.layout.component_names()

    def level_field(U):
        if field in names:
            return np.asarray(U[names.index(field)])
        return np.asarray(compute_derived_field(sim, field, U=U))

    data = level_field(sim.U)
    finest = getattr(sim, "finest_level", 0)
    for l in range(1, finest + 1):
        for d in sim.grid.active_axes:
            data = np.repeat(data, 2, d)
        fine = level_field(sim.level_U[l])
        mask = np.asarray(sim.level_mask[l]) > 0.5
        data = np.where(mask, fine, data)
    return data


def render_field(
    sim,
    field: str = "gasDensity",
    mode: str = "slice",
    axis: int = 2,
    log: bool = True,
    cmap: str = "viridis",
    directory: str = ".",
    prefix: Optional[str] = None,
) -> str:
    """Render one field to ``render_<field><step>.png`` (the reference's
    ``render_density%05d`` naming, ``src/simulation.hpp:2219``).
    Returns the path."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    data = composite_field(sim, field)
    if mode == "projection":
        img = data.sum(axis=axis) * float(sim.grid.dx[axis])
    else:  # slice through the domain centre
        idx = [slice(None)] * 3
        idx[axis] = data.shape[axis] // 2
        img = data[tuple(idx)]

    if log:
        img = np.log10(np.maximum(np.abs(img), 1e-300))

    if prefix is None:
        prefix = f"render_{field}"
    path = os.path.join(directory, f"{prefix}{sim.istep:05d}.png")

    fig, ax = plt.subplots(figsize=(5, 4), dpi=110)
    axes_names = "xyz"
    keep = [d for d in range(3) if d != axis]
    extent = [
        sim.grid.prob_lo[keep[1]], sim.grid.prob_hi[keep[1]],
        sim.grid.prob_lo[keep[0]], sim.grid.prob_hi[keep[0]],
    ]
    im = ax.imshow(img, origin="lower", cmap=cmap, extent=extent,
                   interpolation="nearest")
    ax.set_xlabel(axes_names[keep[1]])
    ax.set_ylabel(axes_names[keep[0]])
    label = f"log10 {field}" if log else field
    fig.colorbar(im, ax=ax, label=label)
    ax.set_title(f"{field}  t = {sim.t:.4e}  step {sim.istep}")
    fig.tight_layout()
    fig.savefig(path)
    plt.close(fig)
    return path


def maybe_render(sim) -> List[str]:
    """Called from the evolve loop's output hook: renders the configured
    fields every ``ascent_interval`` steps (reference
    ``src/simulation.hpp:899``)."""
    interval = sim.pp.get_int("ascent_interval", -1)
    if interval <= 0 or sim.istep % interval != 0:
        return []
    fields = [str(f) for f in sim.pp.get_list("render.fields", ["gasDensity"])]
    mode = sim.pp.get_str("render.mode", "slice")
    axis = {"x": 0, "y": 1, "z": 2}[sim.pp.get_str("render.axis", "z")]
    log = bool(sim.pp.get_int("render.log", 1))
    cmap = sim.pp.get_str("render.cmap", "viridis")
    return [
        render_field(sim, f, mode=mode, axis=axis, log=log, cmap=cmap)
        for f in fields
    ]
