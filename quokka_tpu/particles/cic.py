"""Gravitating (CIC) and tracer particles.

TPU-native rebuild of `quokka::CICParticleContainer` + the reference's
particle orchestration (reference ``src/particles/CICParticles.hpp:22-44``
and ``src/simulation.hpp:1098-1218``): cloud-in-cell deposition into the
Poisson right-hand side (weighted by 4 pi G), CIC gather of the
gravitational acceleration, and the leapfrog kick-drift-kick stepping
around the hydro advance.

Particles live in fixed-size arrays (positions [N,3], velocities [N,3],
masses [N]); deposition is a scatter-add and gather a batched dynamic
gather -- both fine on TPU at particle counts (the reference's
`Redistribute` has no analog: arrays are globally addressed)."""

from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp


@dataclass
class ParticleData:
    """Particle state (a pytree; arrays over the particle axis)."""

    x: jnp.ndarray  # [N, 3] positions
    v: jnp.ndarray  # [N, 3] velocities
    mass: jnp.ndarray  # [N]

    def tree_flatten(self):
        return (self.x, self.v, self.mass), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


jax.tree_util.register_pytree_node(
    ParticleData, ParticleData.tree_flatten, ParticleData.tree_unflatten
)


def _cic_weights(x, grid):
    """Cell index and CIC weights for each particle: returns (i0 [N,3] int,
    w [N,3] in [0,1]) where w is the weight of the i0+1 cell."""
    lo = jnp.asarray(grid.prob_lo, dtype=x.dtype)
    dx = jnp.asarray(grid.dx, dtype=x.dtype)
    # position in cell-center coordinates
    s = (x - lo) / dx - 0.5
    i0 = jnp.floor(s).astype(jnp.int32)
    w = s - i0
    return i0, w


def cic_deposit(pd: ParticleData, grid, weight_factor=1.0) -> jnp.ndarray:
    """Deposit particle mass * weight_factor / cell_volume onto the grid
    with cloud-in-cell weights (reference `CICDeposition`,
    ``src/particles/CICParticles.hpp:33-44``). Periodic wrapping."""
    shape = grid.n_cell
    i0, w = _cic_weights(pd.x, grid)
    out = jnp.zeros(shape, dtype=pd.x.dtype)
    dens = pd.mass * (weight_factor / grid.cell_volume())
    for cx in (0, 1):
        for cy in (0, 1):
            for cz in (0, 1):
                wx = w[:, 0] if cx else (1.0 - w[:, 0])
                wy = w[:, 1] if cy else (1.0 - w[:, 1])
                wz = w[:, 2] if cz else (1.0 - w[:, 2])
                ii = (i0[:, 0] + cx) % shape[0]
                jj = (i0[:, 1] + cy) % shape[1]
                kk = (i0[:, 2] + cz) % shape[2]
                out = out.at[ii, jj, kk].add(dens * wx * wy * wz)
    return out


def cic_gather(field3: Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray], pd: ParticleData, grid):
    """Gather a cell-centered vector field (gx, gy, gz) at particle
    positions with CIC weights. Returns [N, 3]."""
    shape = grid.n_cell
    i0, w = _cic_weights(pd.x, grid)
    acc = jnp.zeros_like(pd.x)
    for cx in (0, 1):
        for cy in (0, 1):
            for cz in (0, 1):
                wx = w[:, 0] if cx else (1.0 - w[:, 0])
                wy = w[:, 1] if cy else (1.0 - w[:, 1])
                wz = w[:, 2] if cz else (1.0 - w[:, 2])
                ww = wx * wy * wz
                ii = (i0[:, 0] + cx) % shape[0]
                jj = (i0[:, 1] + cy) % shape[1]
                kk = (i0[:, 2] + cz) % shape[2]
                g = jnp.stack([f[ii, jj, kk] for f in field3], axis=-1)
                acc = acc + ww[:, None] * g
    return acc


def kick(pd: ParticleData, accel: jnp.ndarray, dt) -> ParticleData:
    return ParticleData(pd.x, pd.v + dt * accel, pd.mass)


def drift(pd: ParticleData, dt, grid, periodic=(True, True, True)) -> ParticleData:
    x = pd.x + dt * pd.v
    lo = jnp.asarray(grid.prob_lo, dtype=x.dtype)
    hi = jnp.asarray(grid.prob_hi, dtype=x.dtype)
    L = hi - lo
    for d in range(3):
        if periodic[d]:
            x = x.at[:, d].set(lo[d] + jnp.mod(x[:, d] - lo[d], L[d]))
    return ParticleData(x, pd.v, pd.mass)
