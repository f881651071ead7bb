"""Uniform-grid geometry descriptor (one AMR level).

TPU-native analog of the `quokka::grid` bundle (reference ``src/grid.hpp:16``)
passed to initial-condition hooks, plus the AMReX `Geometry` responsibilities
(cell sizes, domain extents, coordinate arrays).

The state itself is a dense array ``U[nvar, nx, ny, nz]``; all three spatial
axes are always present (size-1 for inactive dimensions), so one code path
serves 1D/2D/3D problems with static shapes throughout.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import cached_property
from typing import Tuple

import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class Grid:
    """Geometry of a uniform grid patch/level."""

    n_cell: Tuple[int, int, int]
    prob_lo: Tuple[float, float, float] = (0.0, 0.0, 0.0)
    prob_hi: Tuple[float, float, float] = (1.0, 1.0, 1.0)

    def __post_init__(self):
        object.__setattr__(self, "n_cell", tuple(int(n) for n in self.n_cell))
        object.__setattr__(self, "prob_lo", tuple(float(x) for x in self.prob_lo))
        object.__setattr__(self, "prob_hi", tuple(float(x) for x in self.prob_hi))

    @cached_property
    def active_axes(self) -> Tuple[int, ...]:
        """Spatial axes with more than one cell (the problem dimensionality)."""
        return tuple(d for d in range(3) if self.n_cell[d] > 1)

    @property
    def ndim(self) -> int:
        return max(1, len(self.active_axes))

    @cached_property
    def dx(self) -> Tuple[float, float, float]:
        return tuple(
            (self.prob_hi[d] - self.prob_lo[d]) / self.n_cell[d] for d in range(3)
        )

    @property
    def dx_min(self) -> float:
        active = self.active_axes or (0,)
        return min(self.dx[d] for d in active)

    @property
    def num_cells(self) -> int:
        n = 1
        for d in range(3):
            n *= self.n_cell[d]
        return n

    def cell_centers(self, axis: int, dtype=jnp.float64) -> jnp.ndarray:
        """1D array of cell-center coordinates along `axis`."""
        lo, dx, n = self.prob_lo[axis], self.dx[axis], self.n_cell[axis]
        return lo + (jnp.arange(n, dtype=dtype) + 0.5) * dx

    def cell_center_mesh(self, dtype=jnp.float64):
        """Broadcastable (x, y, z) coordinate arrays of shape [nx,1,1], [1,ny,1], [1,1,nz]."""
        x = self.cell_centers(0, dtype).reshape(-1, 1, 1)
        y = self.cell_centers(1, dtype).reshape(1, -1, 1)
        z = self.cell_centers(2, dtype).reshape(1, 1, -1)
        return x, y, z

    def face_centers(self, axis: int, dtype=jnp.float64) -> jnp.ndarray:
        lo, dx, n = self.prob_lo[axis], self.dx[axis], self.n_cell[axis]
        return lo + jnp.arange(n + 1, dtype=dtype) * dx

    def refine(self, ratio: int = 2) -> "Grid":
        """Grid refined by `ratio` along active axes (same physical domain)."""
        n_new = tuple(
            n * ratio if d in self.active_axes else n
            for d, n in enumerate(self.n_cell)
        )
        return Grid(n_new, self.prob_lo, self.prob_hi)

    def cell_volume(self) -> float:
        v = 1.0
        for d in range(3):
            v *= self.dx[d]
        return v

    def __repr__(self) -> str:  # pragma: no cover
        return f"Grid(n_cell={self.n_cell}, lo={self.prob_lo}, hi={self.prob_hi})"


def positions(grid: Grid, dtype=np.float64):
    """Full [nx,ny,nz] coordinate arrays (for IC hooks that need all three)."""
    x, y, z = grid.cell_center_mesh(dtype)
    shape = grid.n_cell
    return (
        jnp.broadcast_to(x, shape),
        jnp.broadcast_to(y, shape),
        jnp.broadcast_to(z, shape),
    )
