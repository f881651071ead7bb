"""Ghost-free (zero-padding) hydro stepping vs the ghost-padded path.

The ghost-free path keeps every array at its natural lane-aligned size:
wall ghosts (reflect/outflow) are assembled inside the Pallas sweep kernels
from their own block edges, hi-wall face fluxes are returned as separate
planes, and the prologue stencil fields use wall-corrected masked reads
(`stencil.sh_bc`). Because the wall BCs are local transforms of the
interior, every assembled value equals the ghost-padded fill's value, so
the two paths must agree to floating-point identity.

Runs the Pallas kernels in interpret mode off-TPU, which also makes this
the CI-side execution of the Pallas sweep path itself.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from quokka_tpu.boundaries import fill_ghosts
from quokka_tpu.eos import IdealGasEOS
from quokka_tpu.hydro import advance as hydro_advance
from quokka_tpu.indices import EGAS, EINT, MX1, RHO, StateLayout
from quokka_tpu.registry import BC_OUTFLOW, BC_PERIODIC, BC_REFLECT, BCSpec
from quokka_tpu.stencil import sh, sh_bc


def _make_state(shape, seed=0, rough=False):
    rng = np.random.default_rng(seed)
    rho = 1.0 + 0.5 * rng.random(shape)
    vx = 0.3 * rng.standard_normal(shape)
    vy = 0.3 * rng.standard_normal(shape)
    vz = 0.3 * rng.standard_normal(shape)
    eint = 1.0 + rng.random(shape)
    if rough:
        # a deep density/pressure well to push the update invalid and
        # trigger the masked-FOFC redo branch
        rho[2, 2, 2] = 1e-4
        eint[2, 2, 2] = 1e-6
        vx[3, 2, 2] = 8.0
        vx[1, 2, 2] = -8.0
        # strong converging shocks AT the walls: the flattening chi of the
        # wall-adjacent cells then differs cell-to-cell, which is exactly
        # where approximate (edge-replicated) chi ghosts would diverge from
        # the padded path's ghost values
        n = shape[0]
        eint[0, :, :] *= 30.0
        eint[1, :, :] *= 4.0
        vx[0, :, :] = 2.0
        vx[1, :, :] = -1.5
        eint[:, :, n - 1] *= 25.0
        eint[:, :, n - 2] *= 3.0
        vz[:, :, n - 1] = -2.0
        vz[:, :, n - 2] = 1.2
    ke = 0.5 * rho * (vx**2 + vy**2 + vz**2)
    U = np.stack([rho, rho * vx, rho * vy, rho * vz, rho * eint + ke, rho * eint])
    return jnp.asarray(U, jnp.float32)


def _opts(n):
    # fuse_update=False: the bitwise padded-vs-ghost-free comparison needs
    # the contraction-stable classic flux formulation (the kernel-fused
    # divergence path reorders FMA contraction sites, shifting results by
    # ~1 ulp across compilations; it is validated at ulp tolerance in
    # tests/test_fused_update.py)
    return hydro_advance.HydroOptions(
        dx=(1.0 / n, 1.0 / n, 1.0 / n),
        eos=IdealGasEOS(gamma=1.4),
        active_axes=(0, 1, 2),
        reconstruction_order=3,
        use_pallas=True,
        fuse_update=False,
    )


BCS = {
    "reflect_all": BCSpec(
        x=(BC_REFLECT, BC_REFLECT),
        y=(BC_REFLECT, BC_REFLECT),
        z=(BC_REFLECT, BC_REFLECT),
    ),
    "outflow_all": BCSpec(
        x=(BC_OUTFLOW, BC_OUTFLOW),
        y=(BC_OUTFLOW, BC_OUTFLOW),
        z=(BC_OUTFLOW, BC_OUTFLOW),
    ),
    "mixed": BCSpec(
        x=(BC_PERIODIC, BC_PERIODIC),
        y=(BC_REFLECT, BC_OUTFLOW),
        z=(BC_OUTFLOW, BC_REFLECT),
    ),
}


@pytest.mark.parametrize("bc_name", sorted(BCS))
@pytest.mark.parametrize("rough", [False, True])
def test_ghostfree_matches_padded(bc_name, rough):
    n = 16
    bcs = BCS[bc_name]
    layout = StateLayout(hydro_enabled=True, radiation_enabled=False)
    U = _make_state((n, n, n), seed=3, rough=rough)
    opts = _opts(n)
    ng = (4, 4, 4)
    periodic = tuple(bcs.is_periodic(d) for d in range(3))
    dt = 0.2 / n  # conservative CFL on O(1) signal speeds

    fill = lambda X: fill_ghosts(X, ng, bcs, layout)
    U_pad, stats_pad = hydro_advance.advance_hydro_rk2(
        U, dt, opts, fill, ng, periodic
    )

    bc_kinds = {
        d: (None if periodic[d] else bcs.axis(d)) for d in range(3)
    }
    U_gf, stats_gf = hydro_advance.advance_hydro_rk2(
        U, dt, opts, lambda X: X, (0, 0, 0), periodic, bc_kinds=bc_kinds
    )

    assert int(stats_pad["n_fofc"]) == int(stats_gf["n_fofc"])
    if rough:
        assert int(stats_pad["n_fofc"]) > 0, "rough state must exercise FOFC"
    np.testing.assert_allclose(
        np.asarray(U_gf), np.asarray(U_pad), rtol=0, atol=0,
        err_msg=f"ghost-free != padded for {bc_name} (rough={rough})",
    )


def test_sharded_ghostfree_matches_padded():
    """Hybrid sharded ghost-free (x/y halo-padded, z kernel-assembled) must
    reproduce the classic fully-padded sharded step."""
    from quokka_tpu import ParmParse, Simulation
    from quokka_tpu.parallel.decomp import make_decomposition
    from quokka_tpu.problems.sedov import SedovProblem

    def run(ghost_free_flag):
        pp = ParmParse.from_string(
            f"""
            geometry.prob_hi = 1.2 1.2 1.2
            amr.n_cell = 32 32 32
            cfl = 0.3
            max_timesteps = 6
            hydro.use_pallas = 1
            hydro.fuse_update = 0
            hydro.ghost_free = {ghost_free_flag}
            precision = single
            verbose = 0
            """
        )
        decomp = make_decomposition((32, 32, 32), tiles=(4, 2, 1))
        sim = Simulation(SedovProblem(), pp, decomp=decomp, precision="single")
        if ghost_free_flag:
            gf = sim._ghost_free_config()
            assert gf is not None, "sharded ghost-free must be eligible"
            assert gf["ng"] == (4, 4, 0), gf
            assert gf["bc_kinds"][2] is not None, "z walls kernel-assembled"
        sim.set_initial_conditions()
        sim.evolve()
        return np.asarray(sim.U)

    U_gf = run(1)
    U_pad = run(0)
    np.testing.assert_allclose(U_gf, U_pad, rtol=0, atol=0)


def test_hybrid_user_bc_axis_matches_padded():
    """A BC_USER x-axis forces x-padding while z stays kernel-assembled;
    result must equal the fully padded path."""
    from quokka_tpu.registry import BC_USER

    n = 16
    bcs = BCSpec(
        x=(BC_USER, BC_OUTFLOW),
        y=(BC_PERIODIC, BC_PERIODIC),
        z=(BC_REFLECT, BC_REFLECT),
    )
    layout = StateLayout(hydro_enabled=True, radiation_enabled=False)
    U = _make_state((n, n, n), seed=5)
    opts = _opts(n)
    periodic = (False, True, False)
    dt = 0.2 / n

    class Hook:
        """Dirichlet inflow on x-lo (a supersonic constant state)."""

        def fill_user_boundary(self, Ug, grid, ng, time, d, side):
            assert d == 0 and side == 0
            g = ng[0]
            rho, vx, eint = 1.3, 1.7, 2.0
            vals = jnp.asarray(
                [rho, rho * vx, 0.0, 0.0,
                 rho * eint + 0.5 * rho * vx**2, rho * eint], Ug.dtype)
            return Ug.at[:, :g].set(vals[:, None, None, None])

    hook = Hook()
    fill_full = lambda X: fill_ghosts(X, (4, 4, 4), bcs, layout,
                                      problem=hook, grid=None)
    U_pad, _ = hydro_advance.advance_hydro_rk2(
        U, dt, opts, fill_full, (4, 4, 4), periodic
    )

    # hybrid: pad x only (hook), y wrap, z kernel-assembled
    fill_x = lambda X: fill_ghosts(X, (4, 0, 0), bcs, layout,
                                   problem=hook, grid=None)
    bc_kinds = {0: None, 1: None, 2: (BC_REFLECT, BC_REFLECT)}
    U_gf, _ = hydro_advance.advance_hydro_rk2(
        U, dt, opts, fill_x, (4, 0, 0), periodic, bc_kinds=bc_kinds
    )
    np.testing.assert_allclose(np.asarray(U_gf), np.asarray(U_pad),
                               rtol=0, atol=0)


def test_outflow_chi_ghost_planes_exact():
    """The prologue's outflow ghost-chi planes equal the padded path's
    chi_cell at the wall-adjacent ghost positions -- and differ from a naive
    edge replicate (the along-axis chi is identically 1 at replicate
    ghosts), so the planes are load-bearing, not decorative."""
    from quokka_tpu.hydro import euler
    from quokka_tpu.hydro.pallas_sweep import precompute_transverse_fields

    n = 16
    U = _make_state((n, n, n), seed=3, rough=True)
    opts = _opts(n)
    bcs = BCS["outflow_all"]
    layout = StateLayout(hydro_enabled=True, radiation_enabled=False)
    ng = (4, 4, 4)
    Ug = fill_ghosts(U, ng, bcs, layout)

    prim_pad = euler.cons_to_prim(Ug, opts.eos, opts.reconstruct_eint)
    _, chi_pad = precompute_transverse_fields(prim_pad, opts)

    prim = euler.cons_to_prim(U, opts.eos, opts.reconstruct_eint)
    bc_kinds = {d: bcs.axis(d) for d in range(3)}
    _, chi, chi_ghost = precompute_transverse_fields(prim, opts, bc_kinds)

    for d in range(3):
        lo_pl, hi_pl = chi_ghost[d]
        sl = [slice(4, -4)] * 3
        sl[d] = slice(3, 4)
        np.testing.assert_array_equal(np.asarray(chi_pad[tuple(sl)]),
                                      np.asarray(lo_pl))
        sl[d] = slice(n + 4, n + 5)
        np.testing.assert_array_equal(np.asarray(chi_pad[tuple(sl)]),
                                      np.asarray(hi_pl))

    sl0 = [slice(None)] * 3
    sl0[0] = slice(0, 1)
    edge = np.asarray(chi[tuple(sl0)])
    assert np.max(np.abs(edge - np.asarray(chi_ghost[0][0]))) > 0.1, (
        "state not sharp: exact ghost chi equals the edge replicate"
    )


def test_sh_bc_matches_padded_fill():
    """sh_bc on the unpadded field == roll on the ghost-filled field."""
    rng = np.random.default_rng(1)
    A = jnp.asarray(rng.standard_normal((8, 9, 10)))
    g = 4
    for ax in range(3):
        for lo, hi in [
            (BC_REFLECT, BC_REFLECT),
            (BC_OUTFLOW, BC_OUTFLOW),
            (BC_REFLECT, BC_OUTFLOW),
        ]:
            for odd in (False, True):
                n = A.shape[ax]

                def take(a, b):
                    sl = [slice(None)] * 3
                    sl[ax] = slice(a, b)
                    return A[tuple(sl)]

                sgn = -1.0 if odd else 1.0
                if lo == BC_REFLECT:
                    lo_sl = sgn * jnp.flip(take(0, g), axis=ax)
                else:
                    shp = list(A.shape)
                    shp[ax] = g
                    lo_sl = jnp.broadcast_to(take(0, 1), shp)
                if hi == BC_REFLECT:
                    hi_sl = sgn * jnp.flip(take(n - g, n), axis=ax)
                else:
                    shp = list(A.shape)
                    shp[ax] = g
                    hi_sl = jnp.broadcast_to(take(n - 1, n), shp)
                Ap = jnp.concatenate([lo_sl, A, hi_sl], axis=ax)
                for k in (-4, -2, -1, 1, 2, 4):
                    want_p = sh(Ap, k, ax)
                    sl = [slice(None)] * 3
                    sl[ax] = slice(g, -g)
                    want = want_p[tuple(sl)]
                    got = sh_bc(A, k, ax, lo, hi, odd)
                    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_ghost_free_config_gating():
    """Mode selection: full ghost-free for kernel-assemblable walls, hybrid
    padding for hook axes, classic path when the lane axis needs a fill,
    and the hydro.ghost_free=0 escape hatch."""
    from quokka_tpu import ParmParse, Simulation
    from quokka_tpu.problems.sedov import SedovProblem
    from quokka_tpu.registry import BC_USER

    def cfg(bcs=None, extra=""):
        class P(SedovProblem):
            name = "GFGate_" + str(abs(hash((str(bcs), extra))) % 10**8)

        if bcs is not None:
            P.bcs = bcs
        pp = ParmParse.from_string(
            f"""
            geometry.prob_hi = 1.2 1.2 1.2
            amr.n_cell = 16 16 16
            hydro.use_pallas = 1
            verbose = 0
            {extra}
            """
        )
        return Simulation(P(), pp, precision="single")._ghost_free_config()

    # all-reflect: fully ghost-free
    gf = cfg()
    assert gf is not None and gf["ng"] == (0, 0, 0)
    assert all(gf["bc_kinds"][d] is not None for d in range(3))

    # escape hatch
    assert cfg(extra="hydro.ghost_free = 0") is None

    # f64 -> classic path (Pallas kernels are f32-only)
    class P64(SedovProblem):
        name = "GFGate_f64"

    pp = ParmParse.from_string(
        "geometry.prob_hi = 1.2 1.2 1.2\namr.n_cell = 16 16 16\n"
        "hydro.use_pallas = 1\nverbose = 0"
    )
    assert Simulation(P64(), pp, precision="double")._ghost_free_config() is None

    # hook on x -> hybrid (x padded, z kernel-assembled)
    gf = cfg(BCSpec(x=(BC_USER, BC_OUTFLOW),
                    y=(BC_PERIODIC, BC_PERIODIC),
                    z=(BC_REFLECT, BC_REFLECT)))
    assert gf is not None and gf["ng"] == (4, 0, 0)
    assert gf["bc_kinds"][0] is None and gf["bc_kinds"][2] is not None

    # hook on the LANE axis -> classic path (z must never be padded)
    gf = cfg(BCSpec(x=(BC_REFLECT, BC_REFLECT),
                    y=(BC_PERIODIC, BC_PERIODIC),
                    z=(BC_USER, BC_OUTFLOW)))
    assert gf is None
