"""Lane-packed streamed pool engine vs the standard pool paths (bitwise).

The packed engine (amr/packed.py, amr/packed_driver.py) re-schedules the
pool-level updates -- fused single-pass RK2 halos, Pallas/DMA row gathers,
delayed in-place writes -- without changing any update expression, so on a
tile-aligned hierarchy it must reproduce the standard chunked pool path
bit-for-bit (which itself reproduces the dense-mask hierarchy bitwise;
tests/test_tilepool_hydro.py, tests/test_tilepool_radhydro.py)."""

import numpy as np
import pytest

import jax.numpy as jnp

from quokka_tpu import ParmParse
from quokka_tpu.amr import packed as pk
from quokka_tpu.amr.hierarchy import AMRSimulation
from quokka_tpu.indices import EGAS, EINT, RHO
from quokka_tpu.registry import (
    BC_PERIODIC, BCSpec, EOSTraits, PhysicsTraits, Problem, RadTraits,
)
from quokka_tpu.eos import IdealGasEOS

TS = (16, 16, 16)


class _PackedBump(Problem):
    name = "packed_bump"
    physics = PhysicsTraits(hydro_enabled=True)
    eos_traits = EOSTraits(gamma=1.4, mean_molecular_weight=1.0)
    bcs = BCSpec(x=(BC_PERIODIC, BC_PERIODIC), y=(BC_PERIODIC, BC_PERIODIC),
                 z=(BC_PERIODIC, BC_PERIODIC))

    def make_eos(self):
        return IdealGasEOS(gamma=1.4)

    def set_initial_conditions(self, grid):
        x, y, z = grid.cell_center_mesh(jnp.float32)
        r2 = (x - 0.5) ** 2 + (y - 0.5) ** 2 + (z - 0.5) ** 2
        rho = jnp.broadcast_to(1.0 + 0.6 * jnp.exp(-r2 / 0.01), grid.n_cell)
        eint = jnp.broadcast_to(
            (1.0 + 0.4 * jnp.exp(-r2 / 0.01)) / 0.4, grid.n_cell
        )
        U = jnp.zeros((6, *grid.n_cell), jnp.float32)
        return U.at[RHO].set(rho).at[EGAS].set(eint).at[EINT].set(eint)

    def error_est(self, sim, level):
        g = sim.level_grids[level]
        n = g.n_cell[0]
        idx = np.arange(n)
        m = (idx >= n // 4) & (idx < 3 * n // 4)
        box = m[:, None, None] & m[None, :, None] & m[None, None, :]
        return jnp.asarray(box) if level == 0 else jnp.zeros(g.n_cell, bool)

    def error_est_local(self, U_padded, grid, level, origin):
        return jnp.zeros(U_padded.shape[1:], bool)


class _PackedRad(Problem):
    """Radiating pulse (adapted from tests/test_tilepool_radhydro.py)."""

    name = "packed_rad_pulse"
    physics = PhysicsTraits(hydro_enabled=True, radiation_enabled=True)
    eos_traits = EOSTraits(gamma=5.0 / 3.0, mean_molecular_weight=1.0,
                           boltzmann_constant=1.0)
    rad = RadTraits(c_light=1.0e3, c_hat=1.0e2, radiation_constant=1.0,
                    Erad_floor=1e-12, beta_order=1)

    def compute_planck_opacity(self, rho, T):
        return jnp.full_like(rho, 10.0)

    def set_radiation_energy_source(self, grid, time):
        x, y, z = grid.cell_center_mesh()
        r2 = (x - 0.5) ** 2 + (y - 0.5) ** 2 + (z - 0.5) ** 2
        return jnp.broadcast_to(0.1 * jnp.exp(-r2 / 0.02), grid.n_cell)

    def set_initial_conditions(self, grid):
        x, y, z = grid.cell_center_mesh()
        shape = grid.n_cell
        layout = self.physics.layout()
        eos = self.make_eos()
        r2 = (x - 0.5) ** 2 + (y - 0.5) ** 2 + (z - 0.5) ** 2
        T = jnp.broadcast_to(1.0 + 0.5 * jnp.exp(-r2 / 0.01), shape)
        eint = eos.eint_from_tgas(1.0, T)
        U = jnp.zeros((layout.nvar, *shape))
        U = U.at[RHO].set(1.0)
        U = U.at[EGAS].set(eint)
        U = U.at[EINT].set(eint)
        U = U.at[layout.rad_index(0, 0)].set(1.0 * T**4)
        return U

    def error_est(self, sim, level):
        g = sim.level_grids[level]
        n = g.n_cell[0]
        idx = np.arange(n)
        m = (idx >= n // 4) & (idx < 3 * n // 4)
        box = m[:, None, None] & m[None, :, None] & m[None, None, :]
        return jnp.asarray(box) if level == 0 else jnp.zeros(g.n_cell, bool)

    def error_est_local(self, U_padded, grid, level, origin):
        # tag the fine cells whose centers fall in [0.375, 0.625)^3
        # (origin-coordinate logic: exercises the packed tag assembly)
        gpad = (U_padded.shape[1] - grid.n_cell[0] // (
            grid.n_cell[0] // TS[0])) // 2 if False else None
        x, y, z = grid.cell_center_mesh()
        del x, y, z
        n = U_padded.shape[1]
        ts = TS[0]
        g = (n - ts) // 2
        idx = jnp.arange(-g, ts + g)
        cell = origin[0] + idx  # global fine cells along x (tile-local)
        lo, hi = grid.n_cell[0] * 3 // 8, grid.n_cell[0] * 5 // 8
        mx = (cell >= lo) & (cell < hi)
        cy = origin[1] + idx
        my = (cy >= lo) & (cy < hi)
        cz = origin[2] + idx
        mz = (cz >= lo) & (cz < hi)
        return mx[:, None, None] & my[None, :, None] & mz[None, None, :]


BASE = """
geometry.prob_lo = 0. 0. 0.
geometry.prob_hi = 1. 1. 1.
amr.n_cell = 32 32 32
amr.sparse_min_level = 1
amr.tile_size = 16 16 16
amr.n_error_buf = 0
do_reflux = 1
do_subcycle = 1
cfl = 0.3
radiation.cfl = 0.3
radiation.max_substeps = 32
stop_time = 1.0e10
verbose = 0
hydro.use_pallas = 0
hydro.fuse_update = 0
radiation.use_pallas = 0
amr.pool_chunk = 8
"""

PACKED = "amr.pool_packed = 1\namr.packed_chunk = 8\n"


def _run(problem, extra, steps, max_level=1):
    pp = ParmParse.from_string(
        BASE + f"amr.max_level = {max_level}\nmax_timesteps = {steps}\n"
        + extra
    )
    sim = AMRSimulation(problem, pp, precision="single")
    sim.set_initial_conditions()
    sim.evolve()
    return sim


def _pool5(sim, l):
    st = sim.level_pool[l]
    n = st.meta.n_active
    if getattr(st, "packed", False):
        nh = sim.layout.nvar_hydro
        U5 = pk.unpack(st.Uh, nh, TS)
        if st.Ur is not None:
            nr = sim.layout.nvar - nh
            U5 = jnp.concatenate([U5, pk.unpack(st.Ur, nr, TS)], axis=1)
        return np.asarray(U5[:n])
    return np.asarray(st.U[:n])


def test_packed_hydro_bitwise():
    ref = _run(_PackedBump(), "", steps=3)
    got = _run(_PackedBump(), PACKED, steps=3)
    assert got.level_pool[1].meta.n_active == ref.level_pool[1].meta.n_active
    d0 = np.abs(np.asarray(ref.level_U[0]) - np.asarray(got.level_U[0])).max()
    d1 = np.abs(_pool5(ref, 1) - _pool5(got, 1)).max()
    assert d0 == 0.0 and d1 == 0.0, (d0, d1)


def test_packed_radhydro_bitwise():
    ref = _run(_PackedRad(), "", steps=2)
    got = _run(_PackedRad(), PACKED, steps=2)
    assert got.level_pool[1].meta.n_active == ref.level_pool[1].meta.n_active
    d0 = np.abs(np.asarray(ref.level_U[0]) - np.asarray(got.level_U[0])).max()
    d1 = np.abs(_pool5(ref, 1) - _pool5(got, 1)).max()
    assert d0 == 0.0 and d1 == 0.0, (d0, d1)


@pytest.mark.slow
def test_packed_three_level_radhydro():
    """Three total levels: packed L2 advances under a packed-pool parent
    ('ppool' ctx: parent-row backdrops, parent-indexed face scatter,
    packed reflux + average-down)."""
    ref = _run(_PackedRad(), "", steps=2, max_level=2)
    got = _run(_PackedRad(), PACKED, steps=2, max_level=2)
    assert ref.finest_level == 2 and got.finest_level == 2
    for l in (1, 2):
        assert (got.level_pool[l].meta.n_active
                == ref.level_pool[l].meta.n_active)
    d0 = np.abs(np.asarray(ref.level_U[0]) - np.asarray(got.level_U[0])).max()
    d1 = np.abs(_pool5(ref, 1) - _pool5(got, 1)).max()
    d2 = np.abs(_pool5(ref, 2) - _pool5(got, 2)).max()
    assert d0 == 0.0 and d1 == 0.0 and d2 == 0.0, (d0, d1, d2)
