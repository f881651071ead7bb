"""Tile-pool AMR radhydro vs the dense-mask hierarchy (bitwise).

Coupled hydro + M1 radiation with per-level subcycling, space-time
coarse-fine fills, and radiation components in the flux registers -- the
pool representation must reproduce the dense run bit-for-bit on a
tile-block-aligned hierarchy (the shell benchmark's configuration class).
"""

import numpy as np
import pytest

import jax.numpy as jnp
from jax import lax

from quokka_tpu import ParmParse
from quokka_tpu.amr import tilepool as tp
from quokka_tpu.amr.hierarchy import AMRSimulation
from quokka_tpu.indices import EGAS, EINT, RHO
from quokka_tpu.registry import EOSTraits, PhysicsTraits, Problem, RadTraits

TS = (8, 8, 8)
G = 4
C_CODE = 1.0e3
CHAT = 1.0e2
KAPPA = 10.0
A_RAD = 1.0
T0 = 1.0


class _RadPulsePool(Problem):
    name = "tilepool_rad_pulse"
    physics = PhysicsTraits(hydro_enabled=True, radiation_enabled=True)
    eos_traits = EOSTraits(gamma=5.0 / 3.0, mean_molecular_weight=1.0,
                           boltzmann_constant=1.0)
    rad = RadTraits(c_light=C_CODE, c_hat=CHAT, radiation_constant=A_RAD,
                    Erad_floor=1e-12, beta_order=1)

    TAG_L0 = (4, 12)

    def compute_planck_opacity(self, rho, T):
        return jnp.full_like(rho, KAPPA)

    def set_radiation_energy_source(self, grid, time):
        # smooth central source: exercises the per-tile TileGridView path
        x, y, z = grid.cell_center_mesh()
        r2 = (x - 0.5) ** 2 + (y - 0.5) ** 2 + (z - 0.5) ** 2
        return jnp.broadcast_to(0.1 * jnp.exp(-r2 / 0.02), grid.n_cell)

    def set_initial_conditions(self, grid):
        x, y, z = grid.cell_center_mesh()
        shape = grid.n_cell
        layout = self.physics.layout()
        eos = self.make_eos()
        r2 = (x - 0.5) ** 2 + (y - 0.5) ** 2 + (z - 0.5) ** 2
        T = T0 * (1.0 + 0.5 * jnp.exp(-r2 / 0.01))
        T = jnp.broadcast_to(T, shape)
        eint = eos.eint_from_tgas(1.0, T)
        U = jnp.zeros((layout.nvar, *shape))
        U = U.at[RHO].set(1.0)
        U = U.at[EGAS].set(eint)
        U = U.at[EINT].set(eint)
        U = U.at[layout.rad_index(0, 0)].set(A_RAD * T**4)
        return U

    def _box_tags(self, n, lo, hi):
        idx = np.arange(n)
        m = (idx >= lo) & (idx < hi)
        return jnp.asarray(m[:, None, None] & m[None, :, None] & m[None, None, :])

    def error_est(self, sim, level):
        n = sim.level_grids[level].n_cell[0]
        if level == 0:
            return self._box_tags(n, *self.TAG_L0)
        return jnp.zeros(sim.level_grids[level].n_cell, bool)

    def error_est_local(self, U_padded, grid, level, origin):
        return jnp.zeros(U_padded.shape[1:], bool)


def _deck(n, max_level, sparse_min, steps):
    extra = ""
    if sparse_min is not None:
        extra = f"amr.sparse_min_level = {sparse_min}\n"
        extra += f"amr.tile_size = {TS[0]} {TS[1]} {TS[2]}\n"
    return ParmParse.from_string(
        f"""
        geometry.prob_lo = 0.0 0.0 0.0
        geometry.prob_hi = 1.0 1.0 1.0
        amr.n_cell = {n} {n} {n}
        amr.max_level = {max_level}
        amr.n_error_buf = 0
        regrid_interval = 2
        do_reflux = 1
        do_subcycle = 1
        cfl = 0.3
        radiation.cfl = 0.3
        radiation.max_substeps = 32
        max_timesteps = {steps}
        stop_time = 1.0e10
        verbose = 0
        hydro.use_pallas = 0
        hydro.fuse_update = 0
        radiation.use_pallas = 0
        """
        + extra
    )


def _run(n, max_level, sparse_min, steps=2):
    sim = AMRSimulation(
        _RadPulsePool(), _deck(n, max_level, sparse_min, steps),
        precision="single",
    )
    sim.set_initial_conditions()
    sim.evolve()
    return sim


def test_pool_radhydro_matches_dense():
    n = 16
    sim_d = _run(n, 1, None)
    sim_p = _run(n, 1, 1)

    assert sim_p.finest_level == sim_d.finest_level == 1
    assert sim_p.t == sim_d.t
    assert sim_p.cell_updates == sim_d.cell_updates

    np.testing.assert_array_equal(
        np.asarray(sim_p.level_U[0]), np.asarray(sim_d.level_U[0]),
        err_msg="level 0",
    )
    st = sim_p.level_pool[1]
    cov = np.asarray(tp.coverage_mask_dense(st.meta))
    np.testing.assert_array_equal(np.asarray(sim_d.level_mask[1]), cov)
    dense = np.asarray(sim_d.level_U[1])
    ts = st.meta.tile_shape
    for s in range(st.meta.n_active):
        o = np.asarray(st.meta.origin_dev[s])
        want = dense[:, o[0]:o[0] + ts[0], o[1]:o[1] + ts[1],
                     o[2]:o[2] + ts[2]]
        np.testing.assert_array_equal(
            np.asarray(st.U[s]), want, err_msg=f"tile {s} at {o}"
        )
