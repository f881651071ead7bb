"""Device-mesh domain decomposition.

TPU-native equivalent of AMReX's `DistributionMapping` (reference: boxes
assigned to MPI ranks, one rank per GPU, ``paper/quokka.tex:638``): the level
array ``U[nvar, nx, ny, nz]`` is block-sharded over a `jax.sharding.Mesh`
whose axes map onto the spatial dimensions, so neighbor blocks sit on
ICI-adjacent chips and halo exchange rides ICI (`lax.ppermute`).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

AXIS_NAMES = ("x", "y", "z")


@dataclass(frozen=True)
class Decomposition:
    """A 3D block decomposition of the level grid over devices."""

    mesh: Mesh
    tiles: Tuple[int, int, int]  # shards per spatial dim (product = n_devices)

    @property
    def n_devices(self) -> int:
        return int(np.prod(self.tiles))

    def state_spec(self) -> P:
        """PartitionSpec for U[nvar, nx, ny, nz]: component axis replicated,
        spatial axes sharded over the mesh axes."""
        names = [None] + [
            AXIS_NAMES[d] if self.tiles[d] > 1 else None for d in range(3)
        ]
        return P(*names)

    def state_sharding(self) -> NamedSharding:
        return NamedSharding(self.mesh, self.state_spec())

    def mask_spec(self) -> P:
        """PartitionSpec for a spatial field without a component axis
        (AMR refinement masks, phi, per-cell diagnostics)."""
        return P(*[
            AXIS_NAMES[d] if self.tiles[d] > 1 else None for d in range(3)
        ])

    def mask_sharding(self) -> NamedSharding:
        return NamedSharding(self.mesh, self.mask_spec())

    def sharded_dims(self) -> Tuple[int, ...]:
        return tuple(d for d in range(3) if self.tiles[d] > 1)


def auto_tiles(n_cell: Sequence[int], n_devices: int) -> Tuple[int, int, int]:
    """Choose a near-cubic block decomposition: repeatedly split the axis
    with the largest cells-per-shard (greedy, factors of n_devices)."""
    tiles = [1, 1, 1]
    remaining = n_devices

    def largest_prime_factor(n: int) -> int:
        f = 2
        while f * f <= n:
            if n % f == 0:
                return f
            f += 1
        return n

    while remaining > 1:
        f = largest_prime_factor(remaining)
        # split the axis with most cells per shard that stays divisible --
        # but NEVER split the lane (z) axis while an alternative exists:
        # keeping z unsharded lets every shard keep its natural lane-aligned
        # extent (ghost-free z stepping; a z-sharded shard would need
        # lane-axis halos, the one padding the TPU layout punishes ~1.6x)
        cand = sorted(
            (d for d in range(3) if n_cell[d] % (tiles[d] * f) == 0),
            key=lambda d: (d != 2, n_cell[d] / tiles[d]),
            reverse=True,
        )
        if not cand:
            raise ValueError(
                f"cannot decompose n_cell={tuple(n_cell)} over {n_devices} devices"
            )
        tiles[cand[0]] *= f
        remaining //= f
    return tuple(tiles)


def make_decomposition(
    n_cell: Sequence[int],
    devices: Optional[Sequence[jax.Device]] = None,
    tiles: Optional[Sequence[int]] = None,
) -> Decomposition:
    devices = list(devices if devices is not None else jax.devices())
    if tiles is None:
        tiles = auto_tiles(n_cell, len(devices))
    tiles = tuple(int(t) for t in tiles)
    if int(np.prod(tiles)) != len(devices):
        raise ValueError(f"tiles {tiles} does not use all {len(devices)} devices")
    for d in range(3):
        if n_cell[d] % tiles[d] != 0:
            raise ValueError(f"n_cell[{d}]={n_cell[d]} not divisible by tiles[{d}]={tiles[d]}")
    dev_array = np.array(devices).reshape(tiles)
    mesh = Mesh(dev_array, AXIS_NAMES)
    return Decomposition(mesh=mesh, tiles=tiles)
