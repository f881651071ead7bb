"""openPMD-format plotfile output (HDF5 backend).

TPU-native analog of the reference's optional openPMD plotfile writer
(reference ``src/io/openPMD.cpp:50-140``, enabled there at compile time via
``QUOKKA_USE_OPENPMD``; here selected at runtime with
``plotfile_format = openpmd``). Writes one HDF5 file per output following
the openPMD 1.1.0 standard layout: file-based iteration encoding, scalar
cell-centered mesh records, and AMR levels appended as ``<field>_lvl<l>``
meshes exactly like the reference's ``GetMeshComponentName``
(``src/io/openPMD.cpp:81-90``).

Axis convention: openPMD datasets are C-order with *reversed* axis labels
(["z","y","x"]) relative to the solver's [x,y,z] index order, mirroring the
reference's ``getReversedVec`` treatment of AMReX's Fortran-order boxes
(``src/io/openPMD.cpp:48-55``); the transpose below produces the identical
on-disk layout.
"""

from __future__ import annotations

import datetime
import os
from typing import Dict, List, Optional, Sequence

import numpy as np


def _mesh_name(field: str, level: int) -> str:
    """``src/io/openPMD.cpp:81-90``: dashes -> underscores, fine levels get
    an ``_lvl<l>`` suffix."""
    name = field.replace("-", "_")
    if level > 0:
        name += f"_lvl{level}"
    return name


def write_openpmd_file(
    path: str,
    fields_per_level: List[Dict[str, np.ndarray]],
    prob_lo: Sequence[float],
    dx_per_level: List[Sequence[float]],
    time: float,
    iteration: int,
    dt: float = 0.0,
):
    """Write one openPMD HDF5 file containing `iteration`.

    `fields_per_level[l]` maps field name -> (nx,ny,nz) array at level l;
    `dx_per_level[l]` is that level's cell size.
    """
    import h5py

    base = f"/data/{iteration}/"
    with h5py.File(path, "w") as f:
        # ---- series root attributes (openPMD 1.1.0 required set)
        f.attrs["openPMD"] = np.bytes_("1.1.0")
        f.attrs["openPMDextension"] = np.uint32(0)
        f.attrs["basePath"] = np.bytes_("/data/%T/")
        f.attrs["meshesPath"] = np.bytes_("meshes/")
        f.attrs["iterationEncoding"] = np.bytes_("fileBased")
        f.attrs["iterationFormat"] = np.bytes_("%T")
        f.attrs["software"] = np.bytes_("quokka_tpu")
        f.attrs["softwareVersion"] = np.bytes_("1.0")
        f.attrs["date"] = np.bytes_(
            datetime.datetime.now().strftime("%Y-%m-%d %H:%M:%S %z")
        )

        it = f.create_group(base)
        it.attrs["time"] = float(time)
        it.attrs["dt"] = float(dt)
        it.attrs["timeUnitSI"] = 1.0

        meshes = f.create_group(base + "meshes")
        for level, fields in enumerate(fields_per_level):
            dx = dx_per_level[level]
            for field, arr in fields.items():
                name = _mesh_name(field, level)
                # C-order dataset with reversed axes: disk shape (nz,ny,nx)
                ds = meshes.create_dataset(name, data=np.ascontiguousarray(arr.T))
                ds.attrs["geometry"] = np.bytes_("cartesian")
                ds.attrs["dataOrder"] = np.bytes_("C")
                ds.attrs["axisLabels"] = np.array(
                    [np.bytes_(s) for s in ("z", "y", "x")]
                )
                ds.attrs["gridSpacing"] = np.asarray(dx[::-1], dtype=np.float64)
                ds.attrs["gridGlobalOffset"] = np.asarray(
                    list(prob_lo)[::-1], dtype=np.float64
                )
                ds.attrs["gridUnitSI"] = 1.0
                ds.attrs["unitSI"] = 1.0
                ds.attrs["unitDimension"] = np.zeros(7, dtype=np.float64)
                ds.attrs["timeOffset"] = 0.0
                ds.attrs["position"] = np.asarray([0.5, 0.5, 0.5], dtype=np.float64)
                ds.attrs["fieldSmoothing"] = np.bytes_("none")


def read_openpmd_file(path: str, iteration: Optional[int] = None):
    """Read back (fields_per_name, time): mesh name -> (nx,ny,nz) array in
    solver axis order (transpose of the on-disk C-order layout)."""
    import h5py

    with h5py.File(path, "r") as f:
        data_grp = f["data"]
        its = sorted(int(k) for k in data_grp.keys())
        use = its[-1] if iteration is None else iteration
        it = data_grp[str(use)]
        out = {}
        for name, ds in it["meshes"].items():
            out[name] = np.asarray(ds).T
        return out, float(it.attrs["time"])


def write_openpmd(sim, prefix: str = "plt", directory: str = "."):
    """Write the simulation's current state as an openPMD HDF5 file
    (``<prefix><step>.h5``), all AMR levels included (reference
    ``src/io/openPMD.cpp:108-140`` level loop)."""
    names = sim.layout.component_names()
    levels: List[Dict[str, np.ndarray]] = []
    dxs: List[Sequence[float]] = []

    U0 = np.asarray(sim.U)
    lvl0 = {n: U0[i] for i, n in enumerate(names)}
    for dv in getattr(sim, "derived_vars", []):
        from .diagnostics import compute_derived_field

        lvl0[dv] = np.asarray(compute_derived_field(sim, dv))
    levels.append(lvl0)
    dxs.append(tuple(float(d) for d in sim.grid.dx))

    finest = getattr(sim, "finest_level", 0)
    for l in range(1, finest + 1):
        Ul = np.asarray(sim.level_U[l])
        levels.append({n: Ul[i] for i, n in enumerate(names)})
        dxs.append(tuple(float(d) / 2**l for d in sim.grid.dx))

    dt = float(getattr(sim, "dt_prev", 0.0) or 0.0)
    if not np.isfinite(dt):
        dt = 0.0
    path = os.path.join(directory, f"{prefix}{sim.istep:07d}.h5")
    write_openpmd_file(
        path,
        levels,
        prob_lo=[float(x) for x in sim.grid.prob_lo],
        dx_per_level=dxs,
        time=float(sim.t),
        iteration=int(sim.istep),
        dt=dt,
    )
    return path
