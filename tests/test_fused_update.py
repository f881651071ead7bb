"""Kernel-fused divergence update vs the classic flux formulation.

The fused path (`hydro/advance.py::_advance_hydro_rk2_fused`) has the sweep
kernels emit per-axis flux-divergence contributions (stage 2: of the
in-VMEM time-averaged flux) so the common-path RK update is pointwise.
The arithmetic is the same sequence of IEEE operations as the classic
path; the only permitted difference is XLA's FMA-contraction freedom
across the two differently-fused programs (the reference forfeits that
freedom by compiling with DISABLE_FMAD, ``CMakeLists.txt:31``). So the
two paths must agree to ~1 ulp of f32 on every cell -- both on clean
steps and through the FOFC redo/fallback branches -- and conserve mass,
momentum, and energy identically to roundoff.
"""

import dataclasses

import numpy as np
import pytest

import jax.numpy as jnp

from quokka_tpu.boundaries import fill_ghosts
from quokka_tpu.indices import EGAS, RHO, StateLayout

from test_ghostfree import BCS, _make_state, _opts


def _paths(n, bcs, U, opts, dt):
    layout = StateLayout(hydro_enabled=True, radiation_enabled=False)
    from quokka_tpu.hydro import advance as ha

    ng = (4, 4, 4)
    periodic = tuple(bcs.is_periodic(d) for d in range(3))
    fill = lambda X: fill_ghosts(X, ng, bcs, layout)
    bc_kinds = {d: (None if periodic[d] else bcs.axis(d)) for d in range(3)}

    def run(o, gf):
        if gf:
            return ha.advance_hydro_rk2(
                U, dt, o, lambda X: X, (0, 0, 0), periodic, bc_kinds=bc_kinds
            )
        return ha.advance_hydro_rk2(U, dt, o, fill, ng, periodic)

    return run


def _ulp_close(a, b, rtol=1e-5, ulp_of_max=64):
    """Per-component agreement at contraction roundoff: rtol covers
    same-scale cells; the atol floor is a few tens of ulps of the
    component's global magnitude, because a near-cancelling update (e.g. a
    momentum component crossing zero) legitimately carries the absolute
    roundoff of its flux-difference terms, and the two programs place FMA
    contractions differently."""
    a = np.asarray(a, np.float32)
    b = np.asarray(b, np.float32)
    # the contrived rough state drives a few cells to identical +/-inf in
    # BOTH formulations (it exists to trip FOFC, not to be physical);
    # require the non-finite patterns to agree exactly and compare the rest
    fin = np.isfinite(b)
    np.testing.assert_array_equal(np.isfinite(a), fin)
    np.testing.assert_array_equal(a[~fin], b[~fin])
    for c in range(a.shape[0]):
        m = fin[c]
        atol = ulp_of_max * np.spacing(np.max(np.abs(b[c][m]), initial=0.0))
        np.testing.assert_allclose(a[c][m], b[c][m], rtol=rtol, atol=atol,
                                   err_msg=f"component {c}")


@pytest.mark.parametrize("bc_name", sorted(BCS))
@pytest.mark.parametrize("rough", [False, True])
def test_fused_matches_classic(bc_name, rough):
    n = 16
    bcs = BCS[bc_name]
    U = _make_state((n, n, n), seed=3, rough=rough)
    opts_f = _opts(n)
    opts_f = dataclasses.replace(opts_f, fuse_update=True)
    opts_c = dataclasses.replace(opts_f, fuse_update=False)
    dt = 0.2 / n
    run = _paths(n, bcs, U, opts_f, dt)

    for gf in (False, True):
        U_f, st_f = run(opts_f, gf)
        U_c, st_c = run(opts_c, gf)
        # the redo trigger mask is bit-identical (the stage-1 try state is
        # reached by the same op sequence), so FOFC counts must agree
        assert int(st_f["n_fofc"]) == int(st_c["n_fofc"])
        if rough:
            assert int(st_f["n_fofc"]) > 0, "rough state must exercise FOFC"
        _ulp_close(U_f, U_c)


def test_fused_ghostfree_matches_fused_padded():
    n = 16
    bcs = BCS["mixed"]
    U = _make_state((n, n, n), seed=7)
    opts = dataclasses.replace(_opts(n), fuse_update=True)
    dt = 0.2 / n
    run = _paths(n, bcs, U, opts, dt)
    U_pad, _ = run(opts, False)
    U_gf, _ = run(opts, True)
    _ulp_close(U_pad, U_gf)


def test_sharded_fused_matches_classic():
    """The fused divergence path under shard_map (hybrid ghost-free: x/y
    halo-padded, z kernel-assembled) must reproduce the classic sharded
    step at contraction roundoff -- this is the configuration a real
    multi-chip TPU runs."""
    from quokka_tpu import ParmParse, Simulation
    from quokka_tpu.parallel.decomp import make_decomposition
    from quokka_tpu.problems.sedov import SedovProblem

    def run(fuse):
        pp = ParmParse.from_string(
            f"""
            geometry.prob_hi = 1.2 1.2 1.2
            amr.n_cell = 32 32 32
            cfl = 0.3
            max_timesteps = 6
            hydro.use_pallas = 1
            hydro.fuse_update = {fuse}
            precision = single
            verbose = 0
            """
        )
        decomp = make_decomposition((32, 32, 32), tiles=(4, 2, 1))
        sim = Simulation(SedovProblem(), pp, decomp=decomp,
                         precision="single")
        sim.set_initial_conditions()
        sim.evolve()
        return np.asarray(sim.U)

    U_f = run(1)
    U_c = run(0)
    # 6 steps compound the per-step contraction roundoff; Sedov energies
    # are O(100), so stay scale-aware but slightly looser than single-step
    _ulp_close(U_f, U_c, rtol=1e-4, ulp_of_max=256)


def test_amr_fused_matches_classic():
    """AMR levels ride the fused divergence path too (the stage-2 kernels
    emit the time-averaged flux for refluxing): a refluxing 2-level Sedov
    hierarchy must match the classic formulation at contraction roundoff
    on every level, with the composite conservation audit intact."""
    from quokka_tpu import ParmParse
    from quokka_tpu.amr.hierarchy import AMRSimulation
    from quokka_tpu.problems.sedov import SedovProblem

    class SedovAMR(SedovProblem):
        def error_est(self, sim, level):
            U = sim.level_U[level]
            q = U[EGAS]
            grad = jnp.zeros_like(q)
            for d in sim.grid.active_axes:
                grad = jnp.maximum(
                    grad,
                    jnp.abs(jnp.roll(q, -1, d) - jnp.roll(q, 1, d))
                    / jnp.maximum(jnp.abs(q), 1e-10),
                )
            return grad > 0.1

    def run(fuse):
        pp = ParmParse.from_string(
            f"""
            geometry.prob_hi = 1.2 1.2 1.2
            amr.n_cell = 16 16 16
            amr.max_level = 1
            do_reflux = 1
            cfl = 0.3
            max_timesteps = 4
            hydro.use_pallas = 1
            hydro.fuse_update = {fuse}
            precision = single
            verbose = 0
            """
        )
        sim = AMRSimulation(SedovAMR(), pp, precision="single")
        sim.set_initial_conditions()
        sim.evolve()
        levels = [np.asarray(u) for u in sim.level_U[: sim.finest_level + 1]]
        return levels, sim.conservation_rel_err

    U_f, cons_f = run(1)
    U_c, cons_c = run(0)
    assert len(U_f) == 2  # the hierarchy actually refined
    for a, b in zip(U_f, U_c):
        _ulp_close(a, b, rtol=1e-5, ulp_of_max=128)
    # mass + total-energy conservation of the composite audit
    assert abs(cons_f[0]) < 1e-6 and abs(cons_f[4]) < 1e-6


def test_fused_conserves():
    """Periodic box: the fused divergence update must telescope -- total
    mass/momentum/energy preserved to accumulation roundoff."""
    n = 16
    bcs = BCS["mixed"]
    from quokka_tpu.registry import BC_PERIODIC, BCSpec

    bcs = BCSpec(
        x=(BC_PERIODIC, BC_PERIODIC),
        y=(BC_PERIODIC, BC_PERIODIC),
        z=(BC_PERIODIC, BC_PERIODIC),
    )
    U = _make_state((n, n, n), seed=11)
    opts = dataclasses.replace(_opts(n), fuse_update=True)
    dt = 0.2 / n
    run = _paths(n, bcs, U, opts, dt)
    U_new, _ = run(opts, True)
    s0 = np.sum(np.asarray(U, np.float64), axis=(1, 2, 3))
    s1 = np.sum(np.asarray(U_new, np.float64), axis=(1, 2, 3))
    for c in (RHO, 1, 2, 3, EGAS):
        assert abs(s1[c] - s0[c]) <= 1e-3 * max(abs(s0[c]), 1.0), (c, s0[c], s1[c])
