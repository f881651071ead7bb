"""Tile-pool AMR hydro vs the dense-mask hierarchy (bitwise).

On a hierarchy whose refinement is tile-block-aligned (tags aligned so the
dense cell-mask equals the pool's tile coverage) and whose flow is smooth
(no FOFC redos, where the two representations' flagging semantics
deliberately differ), the pool-represented run must reproduce the dense
run bit-for-bit: same fills, same fluxes, same refluxing, same
average-down, same timestep chain.
"""

import numpy as np
import pytest

import jax.numpy as jnp
from jax import lax

from quokka_tpu import ParmParse
from quokka_tpu.amr import tilepool as tp
from quokka_tpu.amr.hierarchy import AMRSimulation
from quokka_tpu.eos import IdealGasEOS
from quokka_tpu.indices import EGAS, EINT, MX1, RHO
from quokka_tpu.registry import (
    BC_PERIODIC,
    BCSpec,
    EOSTraits,
    PhysicsTraits,
    Problem,
)

TS = (8, 8, 8)          # tile shape
G = 4


class _SmoothBumpAMR(Problem):
    """Smooth subsonic density/pressure bump; static block-aligned tags."""

    name = "tilepool_smooth_bump"
    physics = PhysicsTraits(hydro_enabled=True)
    eos_traits = EOSTraits(gamma=1.4, mean_molecular_weight=1.0)
    bcs = BCSpec(
        x=(BC_PERIODIC, BC_PERIODIC),
        y=(BC_PERIODIC, BC_PERIODIC),
        z=(BC_PERIODIC, BC_PERIODIC),
    )

    # static tag boxes in LEVEL cell coordinates, chosen tile-block-aligned
    # (level-0 tags in 4-cell blocks -> level-1 tiles of 8)
    TAG_L0 = (4, 12)     # level-0 cells  -> level-1 region [8, 24)
    TAG_L1 = (12, 20)    # level-1 cells  -> level-2 region [24, 40)

    def make_eos(self):
        return IdealGasEOS(gamma=1.4)

    def set_initial_conditions(self, grid):
        shape = grid.n_cell
        x, y, z = grid.cell_center_mesh(jnp.float32)
        r2 = (x - 0.5) ** 2 + (y - 0.5) ** 2 + (z - 0.5) ** 2
        rho = 1.0 + 0.2 * jnp.exp(-r2 / 0.02)
        P = 1.0 + 0.1 * jnp.exp(-r2 / 0.02)
        eint = P / 0.4
        U = jnp.zeros((6, *shape), jnp.float32)
        U = U.at[RHO].set(jnp.broadcast_to(rho, shape))
        U = U.at[EGAS].set(jnp.broadcast_to(eint, shape))
        U = U.at[EINT].set(jnp.broadcast_to(eint, shape))
        return U

    def _box_tags(self, n, lo, hi):
        idx = np.arange(n)
        m = (idx >= lo) & (idx < hi)
        return jnp.asarray(m[:, None, None] & m[None, :, None] & m[None, None, :])

    def error_est(self, sim, level):
        n = sim.level_grids[level].n_cell[0]
        if level == 0:
            return self._box_tags(n, *self.TAG_L0)
        if level == 1:
            return self._box_tags(n, *self.TAG_L1)
        return jnp.zeros(sim.level_grids[level].n_cell, bool)

    def error_est_local(self, U_padded, grid, level, origin):
        if level == 1:
            lo, hi = self.TAG_L1
        else:
            lo, hi = (0, 0)
        shape = U_padded.shape[1:]
        out = None
        for d in range(3):
            idx = lax.broadcasted_iota(jnp.int32, shape, d) + origin[d] - G
            m = (idx >= lo) & (idx < hi)
            out = m if out is None else out & m
        return out


def _deck(n, max_level, sparse_min, steps, pool_chunk=0):
    extra = ""
    if sparse_min is not None:
        extra = f"amr.sparse_min_level = {sparse_min}\n"
        extra += f"amr.tile_size = {TS[0]} {TS[1]} {TS[2]}\n"
        if pool_chunk:
            extra += f"amr.pool_chunk = {pool_chunk}\n"
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
        max_timesteps = {steps}
        stop_time = 1.0e10
        verbose = 0
        hydro.use_pallas = 0
        hydro.fuse_update = 0
        """
        + extra
    )


def _run(n, max_level, sparse_min, steps=3):
    sim = AMRSimulation(
        _SmoothBumpAMR(), _deck(n, max_level, sparse_min, steps),
        precision="single",
    )
    sim.set_initial_conditions()
    sim.evolve()
    return sim


def _compare_level(sim_d, sim_p, l):
    """Pool tiles must equal the dense level's covered cells bitwise."""
    st = sim_p.level_pool[l]
    dense = np.asarray(sim_d.level_U[l])
    ts = st.meta.tile_shape
    for s in range(st.meta.n_active):
        o = np.asarray(st.meta.origin_dev[s])
        want = dense[:, o[0]:o[0] + ts[0], o[1]:o[1] + ts[1], o[2]:o[2] + ts[2]]
        np.testing.assert_array_equal(
            np.asarray(st.U[s]), want, err_msg=f"level {l} tile {s} at {o}"
        )


@pytest.mark.parametrize("max_level,sparse_min", [(1, 1), (2, 1), (2, 2)])
def test_pool_matches_dense(max_level, sparse_min):
    n = 16
    sim_d = _run(n, max_level, None)
    sim_p = _run(n, max_level, sparse_min)

    assert sim_p.finest_level == sim_d.finest_level == max_level
    # identical timestep chains and honest work counters
    assert sim_p.t == sim_d.t
    assert sim_p.cell_updates == sim_d.cell_updates

    np.testing.assert_array_equal(
        np.asarray(sim_p.level_U[0]), np.asarray(sim_d.level_U[0]),
        err_msg="level 0",
    )
    for l in range(1, max_level + 1):
        if sim_p._is_pool(l):
            # dense mask must equal pool coverage (the test's premise)
            cov = np.asarray(tp.coverage_mask_dense(sim_p.level_pool[l].meta))
            np.testing.assert_array_equal(
                np.asarray(sim_d.level_mask[l]), cov,
                err_msg=f"coverage mismatch at level {l}",
            )
            _compare_level(sim_d, sim_p, l)
        else:
            np.testing.assert_array_equal(
                np.asarray(sim_p.level_U[l]), np.asarray(sim_d.level_U[l]),
                err_msg=f"dense level {l}",
            )
    # the conservation audit is a DIAGNOSTIC whose summation order differs
    # (whole-array vs per-tile reduction): agree to f32 summation roundoff
    np.testing.assert_allclose(
        np.nan_to_num(sim_p.conservation_rel_err),
        np.nan_to_num(sim_d.conservation_rel_err),
        atol=1e-6,
    )


def test_pool_conservation():
    """Mass/energy conserved to machine roundoff through pool refluxing
    (f64 so a real coarse-fine flux leak cannot hide in summation noise;
    measured 6e-15, same as the dense path)."""
    sim = AMRSimulation(
        _SmoothBumpAMR(), _deck(16, 2, 1, 4), precision="double"
    )
    sim.set_initial_conditions()
    sim.evolve()
    assert abs(sim.conservation_rel_err[RHO]) < 1e-12
    assert abs(sim.conservation_rel_err[EGAS]) < 1e-12


def test_pool_chunked_matches_unchunked():
    """amr.pool_chunk (lax.map chunks, per-chunk fills, stage-1 flux
    recomputation) must agree with the whole-pool vmapped path to f32
    summation roundoff across a 3-level subcycled run with refluxing.
    (Not bitwise: chunked stage-2 re-assembly changes fusion boundaries.)"""
    n = 16
    sim_u = _run(n, 2, 1, steps=3)
    sim_c = AMRSimulation(
        _SmoothBumpAMR(), _deck(n, 2, 1, 3, pool_chunk=4),
        precision="single",
    )
    sim_c.set_initial_conditions()
    sim_c.evolve()
    assert sim_c.t == sim_u.t
    np.testing.assert_allclose(
        np.asarray(sim_c.level_U[0]), np.asarray(sim_u.level_U[0]),
        rtol=2e-6, atol=2e-6,
    )
    for l in (1, 2):
        su, sc = sim_u.level_pool[l], sim_c.level_pool[l]
        assert sc.meta.capacity % 4 == 0
        # same tile sets
        assert [tuple(t) for t in sc.meta.ijk[: sc.meta.n_active]] == [
            tuple(t) for t in su.meta.ijk[: su.meta.n_active]
        ]
        np.testing.assert_allclose(
            np.asarray(sc.U[: sc.meta.n_active]),
            np.asarray(su.U[: su.meta.n_active]),
            rtol=2e-6, atol=2e-6,
        )


class _BlastAMR(_SmoothBumpAMR):
    """Double rarefaction (Einfeldt/123 problem) confined inside the
    refined region: diverging streams over near-vacuum pressure drive
    (Egas - KE) negative under the high-order update, so FOFC fires ON
    POOL TILES."""

    name = "tilepool_blast"

    def set_initial_conditions(self, grid):
        shape = grid.n_cell
        x, y, z = grid.cell_center_mesh(jnp.float32)
        rho = jnp.ones(shape, jnp.float32)
        band = jnp.abs(x - 0.5) < 0.12
        vx = jnp.where(band, jnp.where(x < 0.5, -2.0, 2.0), 0.0)
        vx = jnp.broadcast_to(vx.astype(jnp.float32), shape)
        eint = jnp.full(shape, 0.2 / 0.4, jnp.float32)
        U = jnp.zeros((6, *shape), jnp.float32)
        U = U.at[RHO].set(rho).at[MX1].set(rho * vx)
        return U.at[EGAS].set(eint + 0.5 * rho * vx * vx).at[EINT].set(eint)


def test_pool_fofc_chunked_matches_unchunked():
    """When stage-1 FOFC fires on pool tiles, the chunked path must blend
    the stage-1 fluxes BEFORE the stage-2 time average exactly like the
    unchunked path (dense-path rk2_stage semantics: the average uses the
    POST-blend fl1/fv1 -- hydro/advance.py:1089). Regression for the
    chunked path re-averaging the raw high-order stage-1 flux."""
    n = 16
    sim_u = AMRSimulation(
        _BlastAMR(), _deck(n, 1, 1, 2), precision="single",
    )
    sim_u.set_initial_conditions()
    sim_u.evolve()
    assert sum(int(c) for c in sim_u.fofc_counts) > 0, (
        "test premise: FOFC must fire on pool tiles"
    )
    sim_c = AMRSimulation(
        _BlastAMR(), _deck(n, 1, 1, 2, pool_chunk=4), precision="single",
    )
    sim_c.set_initial_conditions()
    sim_c.evolve()
    assert sum(int(c) for c in sim_c.fofc_counts) > 0
    assert sim_c.t == sim_u.t
    np.testing.assert_allclose(
        np.asarray(sim_c.level_U[0]), np.asarray(sim_u.level_U[0]),
        rtol=3e-6, atol=1e-4,
    )
    su, sc = sim_u.level_pool[1], sim_c.level_pool[1]
    np.testing.assert_allclose(
        np.asarray(sc.U[: sc.meta.n_active]),
        np.asarray(su.U[: su.meta.n_active]),
        rtol=3e-6, atol=1e-4,
    )


def test_pool_sharded_matches_single():
    """Pool levels sharded over the 8-device CPU mesh (tile-axis
    NamedSharding; every inter-tile transfer is a gather, so GSPMD turns
    them into collectives) must reproduce the single-device pool run."""
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from quokka_tpu.parallel.decomp import make_decomposition

    n = 16
    sim_s = _run(n, 2, 1, steps=3)
    decomp = make_decomposition((n, n, n), tiles=(4, 2, 1))
    sim_m = AMRSimulation(
        _SmoothBumpAMR(), _deck(n, 2, 1, 3), precision="single",
        decomp=decomp,
    )
    sim_m.set_initial_conditions()
    sim_m.evolve()
    assert sim_m.t == sim_s.t
    np.testing.assert_allclose(
        np.asarray(sim_m.level_U[0]), np.asarray(sim_s.level_U[0]),
        rtol=1e-6, atol=1e-7,
    )
    for l in (1, 2):
        ss, sm = sim_s.level_pool[l], sim_m.level_pool[l]
        assert sm.meta.capacity % 8 == 0
        assert [tuple(t) for t in sm.meta.ijk[: sm.meta.n_active]] == [
            tuple(t) for t in ss.meta.ijk[: ss.meta.n_active]
        ]
        np.testing.assert_allclose(
            np.asarray(sm.U[: sm.meta.n_active]),
            np.asarray(ss.U[: ss.meta.n_active]),
            rtol=1e-6, atol=1e-7,
        )
