"""Benchmark runners: fully on-device evolve loops.

The reference's benchmark FOM is million zone-updates/s/GPU printed by
`evolve()` (reference ``src/simulation.hpp:972-980``), driven by
``tests/benchmark_unigrid_*.in`` (Sedov blast). Here the benchmark loop is a
single `lax.scan` over timesteps with the CFL timestep computed *in-graph*
(dt = cfl * dx_min / pmax(|v|+cs), with the 1.1x change limiter), so a whole
benchmark run is one XLA program with zero host round-trips -- the
TPU-native equivalent of the reference's per-step MPI+host loop.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax

from .hydro import advance as hydro_advance
from .hydro import euler


def build_scan_runner(sim, n_steps: int):
    """Returns jitted `(U, dt_prev) -> (U_final, dt_last, t_elapsed)` running
    `n_steps` hydro steps on-device for the given Simulation's config."""
    opts = sim.hydro_opts
    ng = sim.ng
    periodic = sim.periodic
    cfl = sim.cfl
    dx_min = sim.grid.dx_min

    bc_kinds = None
    if sim.decomp is not None:
        from .parallel.decomp import AXIS_NAMES
        from .parallel.halo import make_sharded_fill, make_sharded_mask_fill

        decomp = sim.decomp
        gf = sim._ghost_free_config()
        if gf is not None:
            ng = gf["ng"]
            bc_kinds = gf["bc_kinds"]
        fill = make_sharded_fill(decomp, ng, sim.problem.bcs, sim.layout,
                                 sim.problem, sim.grid)
        mask_fill = make_sharded_mask_fill(decomp, ng, periodic)
        red_axes = tuple(AXIS_NAMES[d] for d in decomp.sharded_dims())
    else:
        fill = sim._fill
        mask_fill = None
        red_axes = ()
        gf = sim._ghost_free_config()
        if all(periodic):
            # zero-ghost fast path: roll wrap IS the periodic BC, and the
            # unpadded lane-aligned layout is ~1.6x faster (see
            # simulation.py step builder)
            fill = lambda X: X
            ng = (0, 0, 0)
        elif gf is not None:
            # ghost-free wall BCs assembled in the sweep kernels
            ng = gf["ng"]
            bc_kinds = gf["bc_kinds"]
            if all(g == 0 for g in ng):
                fill = lambda X: X
            else:
                from .boundaries import fill_ghosts as _fg

                fill = lambda X: _fg(X, ng, sim.problem.bcs, sim.layout,
                                     problem=sim.problem, grid=sim.grid)

    def body(carry, _):
        U, dt_prev, t = carry
        smax = jnp.max(euler.max_signal_speed(U, opts.eos))
        if red_axes:
            smax = lax.pmax(smax, red_axes)
        dt = jnp.minimum(cfl * dx_min / smax, 1.1 * dt_prev)
        U_new, _stats = hydro_advance.advance_hydro_rk2(
            U, dt, opts, fill, ng, periodic, mask_fill,
            bc_kinds=bc_kinds,
        )
        return (U_new, dt, t + dt), None

    def run(U, dt_init):
        (U_f, dt_f, t_f), _ = lax.scan(body, (U, dt_init, jnp.zeros_like(dt_init)),
                                       None, length=n_steps)
        return U_f, dt_f, t_f

    if sim.decomp is not None:
        from jax.sharding import PartitionSpec as P

        spec = sim.decomp.state_spec()
        run = jax.shard_map(
            run, mesh=sim.decomp.mesh,
            in_specs=(spec, P()), out_specs=(spec, P(), P()),
            check_vma=False,
        )
    return jax.jit(run)


def build_step_runner(sim):
    """Jitted single step `(U, dt_prev) -> (U_new, dt_used)` with the CFL dt
    computed on-device. Driven by an *async python loop*: the host only
    enqueues steps (device-resident dt, no host syncs), which measures
    faster than a lax.scan of the same body -- XLA double-buffers the scan
    carry through the large fusion graph, roughly doubling HBM traffic and
    temp memory."""
    opts = sim.hydro_opts
    ng = sim.ng
    periodic = sim.periodic
    cfl = sim.cfl
    dx_min = sim.grid.dx_min

    bc_kinds = None
    if sim.decomp is not None:
        from .parallel.decomp import AXIS_NAMES
        from .parallel.halo import make_sharded_fill, make_sharded_mask_fill
        from jax.sharding import PartitionSpec as P

        decomp = sim.decomp
        gf = sim._ghost_free_config()
        if gf is not None:
            ng = gf["ng"]
            bc_kinds = gf["bc_kinds"]
        fill = make_sharded_fill(decomp, ng, sim.problem.bcs, sim.layout,
                                 sim.problem, sim.grid)
        mask_fill = make_sharded_mask_fill(decomp, ng, periodic)
        red_axes = tuple(AXIS_NAMES[d] for d in decomp.sharded_dims())
    else:
        fill = sim._fill
        mask_fill = None
        red_axes = ()
        gf = sim._ghost_free_config()
        if all(periodic):
            # zero-ghost fast path (see simulation.py step builder)
            fill = lambda X: X
            ng = (0, 0, 0)
        elif gf is not None:
            # ghost-free wall BCs assembled in the sweep kernels
            ng = gf["ng"]
            bc_kinds = gf["bc_kinds"]
            if all(g == 0 for g in ng):
                fill = lambda X: X
            else:
                from .boundaries import fill_ghosts as _fg

                fill = lambda X: _fg(X, ng, sim.problem.bcs, sim.layout,
                                     problem=sim.problem, grid=sim.grid)

    def step(U, dt_prev):
        smax = jnp.max(euler.max_signal_speed(U, opts.eos))
        if red_axes:
            smax = lax.pmax(smax, red_axes)
        dt = jnp.minimum(cfl * dx_min / smax, 1.1 * dt_prev)
        U_new, _stats = hydro_advance.advance_hydro_rk2(
            U, dt, opts, fill, ng, periodic, mask_fill,
            bc_kinds=bc_kinds,
        )
        return U_new, dt

    if sim.decomp is not None:
        from jax.sharding import PartitionSpec as P

        spec = sim.decomp.state_spec()
        step = jax.shard_map(
            step, mesh=sim.decomp.mesh,
            in_specs=(spec, P()), out_specs=(spec, P()),
            check_vma=False,
        )
    return jax.jit(step, donate_argnums=(0,))


def _sync(x):
    """Force completion of everything feeding `x`.

    `jax.block_until_ready` is not a reliable execution barrier on remote
    TPU backends (it can return once the dispatch is enqueued); fetching a
    scalar derived from the array is: the host copy cannot start until the
    producing computation has finished.
    """
    return float(jnp.max(jnp.abs(x[..., :1, :1, :1])))


def bench_hydro(sim, n_warmup: int = 2, n_steps: int = 10, dt_init: float = 1e-8):
    """Time `n_steps` async-dispatched steps; returns (Mzones_per_sec, s)."""
    import time

    if sim.U is None:
        sim.set_initial_conditions()

    dtype = sim.U.dtype
    step = build_step_runner(sim)

    U = sim.U
    dt = jnp.asarray(dt_init, dtype=dtype)
    for _ in range(n_warmup):
        U, dt = step(U, dt)
    _sync(U)

    t0 = time.perf_counter()
    for _ in range(n_steps):
        U, dt = step(U, dt)
    _sync(U)
    elapsed = time.perf_counter() - t0

    zones = sim.grid.num_cells * n_steps
    return zones / elapsed / 1e6, elapsed


def bench_radhydro(sim, n_warmup: int = 1, n_steps: int = 5):
    """Time full radhydro steps (hydro advance + radiation subcycle with
    implicit coupling), async-dispatched. FOM counts hydro zone-updates as
    the reference does (radiation substeps are extra work per zone-update,
    reference ``src/simulation.hpp:972-980``)."""
    import time

    if sim.U is None:
        sim.set_initial_conditions()
    rad = sim._radiation
    opts = sim.hydro_opts

    # fixed dt from the initial state (constant over the short bench window)
    dt = sim.compute_timestep()
    nsub = rad.n_substeps(dt)
    dt_rad = dt / nsub

    # hydro advances only the hydro block (radiation comps belong to the
    # radiation subsystem)
    from .boundaries import fill_ghosts
    from .indices import StateLayout

    nh = sim.layout.nvar_hydro
    layout_h = StateLayout(
        hydro_enabled=True, radiation_enabled=False,
        n_scalars=sim.layout.n_scalars, n_mscalars=sim.layout.n_mscalars,
    )

    def fill_h(X):
        return fill_ghosts(X, sim.ng, sim.problem.bcs, layout_h,
                           problem=sim.problem, grid=sim.grid)

    ng_h = sim.ng
    bc_kinds = None
    gf = sim._ghost_free_config() if sim.decomp is None else None
    if sim.decomp is None and all(sim.periodic):
        fill_h = lambda X: X
        ng_h = (0, 0, 0)
    elif gf is not None:
        ng_h = gf["ng"]
        bc_kinds = gf["bc_kinds"]
        if all(g == 0 for g in ng_h):
            fill_h = lambda X: X
        else:
            fill_h = lambda X: fill_ghosts(X, ng_h, sim.problem.bcs, layout_h,
                                           problem=sim.problem, grid=sim.grid)

    def hydro_step(U):
        Uh_new, _ = hydro_advance.advance_hydro_rk2(
            U[:nh], dt, opts, fill_h, ng_h, sim.periodic, bc_kinds=bc_kinds
        )
        return jnp.concatenate([Uh_new, U[nh:]], axis=0)

    hydro_jit = jax.jit(hydro_step, donate_argnums=(0,))

    def full_step(U, t):
        U = hydro_jit(U)
        # async python-loop dispatch of the substeps (a lax.scan would
        # double-buffer the carry through the substep graph, as measured
        # for the hydro loop)
        for i in range(nsub):
            U, _st = rad._substep_jit(U, t + i * dt_rad, dt_rad)
        return U

    U = sim.U
    t = 0.0
    for _ in range(n_warmup):
        U = full_step(U, t)
        t += dt
    _sync(U)

    t0 = time.perf_counter()
    for _ in range(n_steps):
        U = full_step(U, t)
        t += dt
    _sync(U)
    elapsed = time.perf_counter() - t0

    zones = sim.grid.num_cells * n_steps
    return zones / elapsed / 1e6, elapsed, nsub
