"""Tile-pool fill machinery vs the dense composite (bitwise).

The pool's ghost-padded tiles must equal, cell for cell, the dense-mask
design's composite fill `where(covered, fine, prolong(coarse))` padded
periodically -- including edge/corner ghost regions fed by diagonal-only
neighbor tiles, and prolongation slopes at donor-block edges.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from quokka_tpu.amr import operators as ops
from quokka_tpu.amr import tilepool as tp

NV = 5
G = 4


def _rand(shape, seed):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.standard_normal(shape), jnp.float32)


def _pad_periodic(U, g):
    return jnp.pad(U, [(0, 0)] + [(g, g)] * 3, mode="wrap")


def _dense_composite(U_fine_data, cov_cells, U_coarse):
    """where(covered, fine, prolong(coarse)) -- the dense-mask fill."""
    return jnp.where(cov_cells[None], U_fine_data, ops.prolong(U_coarse, (0, 1, 2)))


TILES_L1 = [
    (0, 0, 0), (1, 0, 0), (0, 1, 0), (1, 1, 1),   # face + diagonal-only pairs
    (3, 3, 3), (0, 3, 3),                          # periodic wrap pair
    (2, 2, 0), (3, 3, 0),                          # corner-only adjacency
]


def test_fill_matches_dense_composite():
    n0 = (16, 16, 16)          # level-0 cells
    ts = (8, 8, 8)             # tile shape (level-1 cells)
    n1 = tuple(2 * n for n in n0)
    periodic = (True, True, True)

    U0 = _rand((NV,) + n0, 1)
    meta = tp.TileMeta.build(n1, ts, TILES_L1, periodic)

    # dense composite reference
    U1_data = _rand((NV,) + n1, 2)
    cov = tp.coverage_mask_dense(meta)
    dense = _dense_composite(U1_data, cov, U0)
    dense_p = _pad_periodic(dense, G)

    # pool fill
    U_pool = tp.gather_tiles_from_dense(U1_data, meta.origin_dev, ts)
    parent_p = _pad_periodic(U0, G)
    backdrop = tp.make_backdrop_from_dense(
        parent_p, meta.origin_dev, ts, G, G, (0, 1, 2)
    )
    padded = tp.fill_pool_ghosts(U_pool, meta.nbr_dev, backdrop, G)

    for s in range(meta.n_active):
        o = np.asarray(meta.origin_dev[s])
        want = dense_p[
            :,
            o[0]: o[0] + ts[0] + 2 * G,
            o[1]: o[1] + ts[1] + 2 * G,
            o[2]: o[2] + ts[2] + 2 * G,
        ]
        np.testing.assert_array_equal(
            np.asarray(padded[s]), np.asarray(want),
            err_msg=f"tile {s} at {o}",
        )


def test_fill_pool_parent_matches_dense_composite():
    """Level-2 pool over a level-1 pool: ghost fill must equal the dense
    3-level composite."""
    n0 = (16, 16, 16)
    ts = (8, 8, 8)
    n1 = tuple(2 * n for n in n0)
    n2 = tuple(4 * n for n in n0)
    periodic = (True, True, True)

    U0 = _rand((NV,) + n0, 3)
    meta1 = tp.TileMeta.build(n1, ts, TILES_L1, periodic)
    # level-2 tiles: children of some level-1 tiles (incl. octant edges)
    tiles_l2 = [(0, 0, 0), (1, 0, 0), (2, 0, 0), (2, 2, 2), (3, 3, 3),
                (6, 6, 6), (7, 7, 7), (0, 7, 7)]
    meta2 = tp.TileMeta.build(n2, ts, tiles_l2, periodic)

    U1_data = _rand((NV,) + n1, 4)
    U2_data = _rand((NV,) + n2, 5)

    # dense reference
    cov1 = tp.coverage_mask_dense(meta1)
    dense1 = _dense_composite(U1_data, cov1, U0)
    cov2 = tp.coverage_mask_dense(meta2)
    dense2 = _dense_composite(U2_data, cov2, dense1)
    dense2_p = _pad_periodic(dense2, G)

    # pool path
    U1_pool = tp.gather_tiles_from_dense(U1_data, meta1.origin_dev, ts)
    bd1 = tp.make_backdrop_from_dense(
        _pad_periodic(U0, G), meta1.origin_dev, ts, G, G, (0, 1, 2)
    )
    padded1 = tp.fill_pool_ghosts(U1_pool, meta1.nbr_dev, bd1, G)

    ps, po = tp.parent_linkage(meta2, meta1)
    U2_pool = tp.gather_tiles_from_dense(U2_data, meta2.origin_dev, ts)
    bd2 = tp.make_backdrop_from_pool(padded1, ps, po, ts, G, G, (0, 1, 2))
    padded2 = tp.fill_pool_ghosts(U2_pool, meta2.nbr_dev, bd2, G)

    for s in range(meta2.n_active):
        o = np.asarray(meta2.origin_dev[s])
        want = dense2_p[
            :,
            o[0]: o[0] + ts[0] + 2 * G,
            o[1]: o[1] + ts[1] + 2 * G,
            o[2]: o[2] + ts[2] + 2 * G,
        ]
        np.testing.assert_array_equal(
            np.asarray(padded2[s]), np.asarray(want),
            err_msg=f"L2 tile {s} at {o}",
        )


def test_parent_linkage_rejects_unnested():
    ts = (8, 8, 8)
    meta1 = tp.TileMeta.build((32, 32, 32), ts, [(0, 0, 0)], (True,) * 3)
    meta2 = tp.TileMeta.build((64, 64, 64), ts, [(5, 5, 5)], (True,) * 3)
    with pytest.raises(ValueError, match="not nested"):
        tp.parent_linkage(meta2, meta1)


def test_average_down_pool():
    ts = (8, 8, 8)
    n1 = (32, 32, 32)
    n2 = (64, 64, 64)
    meta1 = tp.TileMeta.build(n1, ts, [(0, 0, 0), (1, 1, 1)], (True,) * 3)
    tiles2 = [(0, 0, 0), (1, 0, 0), (2, 2, 2), (3, 3, 3)]
    meta2 = tp.TileMeta.build(n2, ts, tiles2, (True,) * 3)

    U1d = _rand((NV,) + n1, 6)
    U2d = _rand((NV,) + n2, 7)
    U1 = tp.gather_tiles_from_dense(U1d, meta1.origin_dev, ts)
    U2 = tp.gather_tiles_from_dense(U2d, meta2.origin_dev, ts)

    cs = tp.child_linkage(meta1, meta2)
    U1_new = tp.average_down_into_pool(U1, U2, cs, (0, 1, 2))

    # dense reference: restrict where covered by level-2 tiles
    cov2 = tp.coverage_mask_dense(meta2)
    cmask = ops.restrict_mask_any(cov2, (0, 1, 2))
    dense_new = jnp.where(cmask[None], ops.restrict(U2d, (0, 1, 2)), U1d)
    for s in range(meta1.n_active):
        o = np.asarray(meta1.origin_dev[s])
        want = dense_new[:, o[0]:o[0] + ts[0], o[1]:o[1] + ts[1], o[2]:o[2] + ts[2]]
        np.testing.assert_array_equal(np.asarray(U1_new[s]), np.asarray(want))


def test_dense_pool_roundtrip():
    ts = (8, 8, 8)
    n1 = (32, 32, 32)
    meta = tp.TileMeta.build(n1, ts, [(0, 0, 0), (3, 2, 1)], (True,) * 3)
    Ud = _rand((NV,) + n1, 8)
    pool = tp.gather_tiles_from_dense(Ud, meta.origin_dev, ts)
    back = tp.pool_to_dense(pool, meta, fill=np.nan)
    cov = np.asarray(tp.coverage_mask_dense(meta))
    got = np.asarray(back)
    np.testing.assert_array_equal(got[:, cov], np.asarray(Ud)[:, cov])
    assert np.isnan(got[:, ~cov]).all()


def test_lazy_slab_gather_bitwise():
    """`assemble_padded` with the lazy handle (vmapped dynamic_slice
    sub-block gathers straight from the pool, used above
    QUOKKA_POOL_SLAB_MAX_BYTES) is bitwise-equal to the materialized-slab
    gather -- same bytes, different data movement."""
    import jax

    key = jax.random.PRNGKey(0)
    T, nv, ts, g = 37, 4, (8, 8, 8), 4
    U = jax.random.normal(key, (T, nv, *ts), jnp.float32)
    nbr = jax.random.randint(key, (T, 26), -1, T)
    bd = jax.random.normal(jax.random.PRNGKey(1), (T, nv, 16, 16, 16),
                           jnp.float32)
    slabs = tp.slice_slabs(U, g)
    assert isinstance(slabs, tuple) and len(slabs) == 26
    a = tp.assemble_padded(U, nbr, bd, slabs, g)
    b = tp.assemble_padded(U, nbr, bd, ("lazy", U, g), g)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
