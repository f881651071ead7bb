"""Block-structured AMR driver: level hierarchy, subcycling, refluxing.

TPU-native rebuild of the reference's AMR orchestration
(`AMRSimulation::timeStepWithSubcycling` / `regrid` / `AverageDownTo` /
`YAFluxRegister::Reflux`, reference ``src/simulation.hpp:1220-1345,
1421-1508, 1939-1964``) with a TPU-first data model:

  Each level is a FULL-DOMAIN dense array at that level's resolution plus a
  boolean refined-region mask. Regridding only rewrites masks and fills
  newly-refined cells -- array shapes never change, so nothing recompiles.
  Where the mask is clear, the level array carries prolonged coarse data
  (refreshed every substep), which doubles as the coarse-fine ghost fill:
  the reference's FillPatcher space-time interpolation becomes
  `where(mask, U_fine, prolong(lerp(Uc_old, Uc_new, theta)))`.

  This trades wasted compute in unrefined regions for perfectly static
  shapes and zero gather/scatter -- the right trade on TPU for the
  moderate-depth hierarchies the reference targets (its own AMR benchmarks
  refine large volume fractions). A tile-pool representation can slot in
  later behind the same interface for deep, sparse hierarchies.

  Subcycling (ref ratio 2), conservative average-down, and refluxing follow
  the reference exactly: fine time-averaged fluxes are restricted to coarse
  faces and the flux mismatch is applied to uncovered coarse cells adjacent
  to the coarse-fine boundary.
"""

from __future__ import annotations

import time as _time
from functools import partial
from typing import Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..boundaries import fill_ghosts
from ..config import ParmParse
from ..grid import Grid
from ..hydro import advance as hydro_advance
from ..hydro import euler
from ..hydro.advance import HydroOptions
from ..simulation import Simulation
from ..stencil import ghost_widths, sh
from . import operators as ops
from . import pool_advance as pa
from . import sparse as sp
from . import tilepool as tp


class AMRSimulation(Simulation):
    """Multi-level simulation with subcycling AMR (refinement ratio 2)."""

    def __init__(self, problem, pp: Optional[ParmParse] = None, **kw):
        super().__init__(problem, pp, **kw)
        self.max_level = self.pp.get_int("amr.max_level", 0)
        self.n_error_buf = self.pp.get_int("amr.n_error_buf", 3)
        self.regrid_interval = self.pp.get_int("regrid_interval", 2)
        self.do_reflux = bool(self.pp.get_int("do_reflux", 1))
        # do_subcycle=0: all levels advance with the global (finest-limited)
        # timestep -- required for self-gravity, exactly as in the reference
        # (``src/simulation.hpp:1015-1017`` aborts on gravity + subcycling)
        self.do_subcycle = bool(self.pp.get_int("do_subcycle", 1))
        if self.gravity_enabled and self.max_level > 0 and self.do_subcycle:
            raise ValueError(
                "Poisson gravity is not supported with AMR subcycling; "
                "set do_subcycle = 0 (reference src/simulation.hpp:1015-1017)"
            )

        # per-level geometry and solver options
        self.level_grids: List[Grid] = [self.grid]
        self.level_opts: List[HydroOptions] = [self.hydro_opts]
        import dataclasses

        for l in range(1, self.max_level + 1):
            g = self.level_grids[-1].refine(2)
            self.level_grids.append(g)
            self.level_opts.append(dataclasses.replace(self.hydro_opts, dx=g.dx))

        # sparse tile-pool representation for deep levels (amr/tilepool.py):
        # levels >= sparse_min_level hold fixed-shape tile pools instead of
        # dense full-domain arrays (the reference's box-granular patches)
        self.sparse_min_level = self.pp.get_int("amr.sparse_min_level", 10**9)
        ts = self.pp.get_list("amr.tile_size", [32, 32, 32])
        self.tile_shape = tuple(int(x) for x in ts)
        # chunked pool execution: advance tiles in lax.map chunks of this
        # many tiles so no full-pool padded/face array is ever materialized
        # (0 = whole-pool vmapped programs; required for 1024^3-class fine
        # levels whose face dicts would exceed HBM)
        self.pool_chunk = self.pp.get_int("amr.pool_chunk", 0)
        # lane-packed streamed pool engine (benchmark-scale levels; see
        # amr/packed.py): split hydro/rad row pools, Pallas DMA gathers,
        # fused single-pass RK2, delayed in-place writes
        self.pool_packed = bool(self.pp.get_int("amr.pool_packed", 0))
        # serialize heavyweight phase dispatch (default ON for packed
        # benchmark-scale runs): without host syncs the driver enqueues
        # dozens of multi-GB-arena programs and the runtime reserves their
        # arenas concurrently -- transient over-reservation surfaces as
        # nondeterministic RESOURCE_EXHAUSTED at ~60% nominal occupancy
        self.sync_dispatch = bool(
            self.pp.get_int("amr.sync_dispatch", int(self.pool_packed))
        )
        self.packed_chunk = self.pp.get_int(
            "amr.packed_chunk", max(self.pool_chunk, 32)
        )
        # capacity-bucket growth factor: larger amortizes recompiles,
        # smaller trims the HBM footprint of near-capacity pools
        self.pool_headroom = self.pp.get_float("amr.pool_headroom", 1.5)
        self.level_pool: List[Optional[object]] = [None] * (self.max_level + 1)
        if self.sparse_min_level <= self.max_level:
            if self.sparse_min_level < 1:
                raise ValueError("amr.sparse_min_level must be >= 1 "
                                 "(level 0 is always dense)")
            if len(self.grid.active_axes) != 3:
                raise NotImplementedError("tile-pool levels require 3D")
            if not all(self.periodic):
                raise NotImplementedError(
                    "tile-pool levels currently require periodic BCs "
                    "(wall ghost assembly is not wired into the pool fill)"
                )
            if self.gravity_enabled:
                raise NotImplementedError(
                    "self-gravity is not yet supported with tile-pool levels"
                )
            smin = self.sparse_min_level
            for d in range(3):
                ns = self.level_grids[smin].n_cell[d]
                if self.tile_shape[d] % 2 or ns % self.tile_shape[d]:
                    raise ValueError(
                        f"amr.tile_size {self.tile_shape} must be even and "
                        f"divide the level-{smin} extent "
                        f"{self.level_grids[smin].n_cell}"
                    )
            if self.pool_packed:
                if self.decomp is not None:
                    raise NotImplementedError(
                        "amr.pool_packed is single-chip (benchmark mode)"
                    )
                if min(self.tile_shape) < 2 * self.ng[0] + 2:
                    raise ValueError(
                        f"amr.pool_packed needs tile_size >= 2*nghost+2 "
                        f"= {2 * self.ng[0] + 2} (fused stage-1 halos)"
                    )
                if self.max_level - self.sparse_min_level > 1:
                    raise NotImplementedError(
                        "amr.pool_packed supports at most two packed "
                        "levels (dense grandparent required)"
                    )

        # dynamic per-level state
        self.level_U: List[Optional[jnp.ndarray]] = [None] * (self.max_level + 1)
        self.level_mask: List[Optional[jnp.ndarray]] = [None] * (self.max_level + 1)
        self.level_steps = [0] * (self.max_level + 1)
        self.finest_level = 0

        self._level_step_jits: Dict[int, Callable] = {}
        self._level_rad: Dict[int, object] = {}
        self._active_cell_cache: Dict[int, int] = {}
        self._pool_step_jits: Dict[int, Callable] = {}
        self._pool_jits: Dict[object, Callable] = {}
        self._pool_rad: Dict[int, object] = {}
        # jitted inter-level operators (reflux/average-down/publication/dt):
        # eager per-op dispatch of these costs ~10 s/call over the remote
        # TPU attachment (measured: reflux 10.8 s eager vs one jit call)
        self._reflux_jits: Dict[int, Callable] = {}
        self._avgdown_jits: Dict[int, Callable] = {}
        self._publish_jits: Dict[int, Callable] = {}
        self._dt_jits: Dict[int, Callable] = {}

    # ------------------------------------------------------------------ setup
    def _shard_level(self, l: int):
        """Pin level l's state + mask to the block decomposition (the AMR
        analog of the reference's per-level DistributionMapping,
        ``src/simulation.hpp:1421-1508``).  All levels share the same device
        mesh: each device owns the same spatial subdomain at every
        resolution, so prolongation/restriction/refluxing are shard-local
        and only the ghost fills communicate."""
        if self.decomp is None:
            return
        if self.level_U[l] is not None:
            self.level_U[l] = jax.device_put(
                self.level_U[l], self.decomp.state_sharding())
        if self.level_mask[l] is not None:
            self.level_mask[l] = jax.device_put(
                self.level_mask[l], self.decomp.mask_sharding())

    def set_initial_conditions(self):
        super().set_initial_conditions()
        if self.pp.get_str("restartfile", ""):
            # restart path: read_checkpoint restored level_U/level_mask/
            # finest_level/init_sums already -- only level-0 bookkeeping here
            self.level_mask[0] = jnp.ones(self.grid.n_cell, dtype=bool)
            for l in range(self.finest_level + 1):
                self._shard_level(l)
            if self.gravity_enabled and self.max_level > 0:
                self._gravity_solve_hierarchy()
            return
        self.level_U[0] = self.U
        self.level_mask[0] = jnp.ones(self.grid.n_cell, dtype=bool)
        self._shard_level(0)
        # build initial fine levels from tagging on the initial data
        for l in range(self.max_level):
            if not self._regrid_level(l):
                break
        self.init_sums = np.asarray(self._composite_sums())
        # initial composite potential (reference calculateGpotAllLevels at
        # setInitialConditions, src/simulation.hpp:660)
        if self.gravity_enabled and self.max_level > 0:
            self._gravity_solve_hierarchy()

    # --------------------------------------------------------- jitted kernels
    @property
    def _hydro_layout(self):
        """Layout of the hydro block alone (the hydro advance never sees the
        radiation components, mirroring the unigrid driver)."""
        if not self.layout.radiation_enabled:
            return self.layout
        from ..indices import StateLayout

        return StateLayout(
            hydro_enabled=True, radiation_enabled=False,
            n_scalars=self.layout.n_scalars,
            n_mscalars=self.layout.n_mscalars,
        )

    def _fill_level0(self, U):
        return fill_ghosts(
            U, self.ng, self.problem.bcs, self._hydro_layout,
            problem=self.problem, grid=self.grid,
        )

    def _fill_fine(self, U, mask, Uc_interp, l):
        base = jnp.where(mask[None], U, ops.prolong(Uc_interp, self.grid.active_axes))
        return fill_ghosts(
            base, self.ng, self.problem.bcs, self._hydro_layout,
            problem=self.problem, grid=self.level_grids[l],
        )

    def _get_level_step(self, l: int):
        """Jitted one-substep advance of level l, returning the restricted
        time-averaged fluxes for refluxing."""
        if l in self._level_step_jits:
            return self._level_step_jits[l]

        opts = self.level_opts[l]
        ng = self.ng
        periodic = self.periodic
        active = self.grid.active_axes

        nh = self.layout.nvar_hydro

        # Strang-split builtin sources run at every level, per substep, with
        # that level's dt (reference addStrangSplitSourcesWithBuiltin is
        # called inside advanceHydroAtLevel, QuokkaSimulation.hpp:1048)
        strang = self._strang if self._strang_active else None

        if l == 0:
            def step(U, dt):
                ok = jnp.asarray(True)
                if strang is not None:
                    U, ok1 = strang(U, 0.5 * dt)
                    ok = jnp.logical_and(ok, ok1)
                Uh_new, stats = hydro_advance.advance_hydro_rk2(
                    U[:nh], dt, opts, self._fill_level0, ng, periodic,
                    return_fluxes=True,
                )
                U_new = (jnp.concatenate([Uh_new, U[nh:]], axis=0)
                         if nh < U.shape[0] else Uh_new)
                if strang is not None:
                    U_new, ok2 = strang(U_new, 0.5 * dt)
                    ok = jnp.logical_and(ok, ok2)
                fluxes = stats.pop("fluxes")
                smax = jnp.max(euler.max_signal_speed(U_new, opts.eos))
                return U_new, fluxes, {"max_signal": smax, "valid": ok, **stats}
        else:
            def step(U, mask, Uc_old, Uc_new, theta1, theta2, dt):
                def fill1(Uf):
                    Uc = (1.0 - theta1) * Uc_old + theta1 * Uc_new
                    return self._fill_fine(Uf, mask, Uc[:nh], l)

                def fill2(Uf):
                    Uc = (1.0 - theta2) * Uc_old + theta2 * Uc_new
                    return self._fill_fine(Uf, mask, Uc[:nh], l)

                ok = jnp.asarray(True)
                if strang is not None:
                    U, ok1 = strang(U, 0.5 * dt)
                    ok = jnp.logical_and(ok, ok1)
                Uh_new, stats = hydro_advance.advance_hydro_rk2(
                    U[:nh], dt, opts, fill1, ng, periodic,
                    fill_fn2=fill2, return_fluxes=True,
                )
                U_new = (jnp.concatenate([Uh_new, U[nh:]], axis=0)
                         if nh < U.shape[0] else Uh_new)
                if strang is not None:
                    U_new, ok2 = strang(U_new, 0.5 * dt)
                    ok = jnp.logical_and(ok, ok2)
                fluxes = stats.pop("fluxes")
                # inactive cells are defined to carry prolonged coarse data;
                # re-impose it at the substep's end time so evolved garbage
                # in unrefined regions can never enter the hierarchy (the
                # reference's fine patches simply don't exist there)
                Uc_end = (1.0 - theta2) * Uc_old + theta2 * Uc_new
                U_new = jnp.where(
                    mask[None], U_new, ops.prolong(Uc_end, active)
                )
                # fluxes stay at THIS level's resolution: the reflux against
                # level l+1 needs them here; restriction for the parent's
                # flux register happens in the driver (once, after the
                # radiation components join)
                smax = jnp.max(
                    jnp.where(mask, euler.max_signal_speed(U_new, opts.eos), 0.0)
                )
                return U_new, fluxes, {"max_signal": smax, "valid": ok, **stats}

        jitted = jax.jit(step)
        self._level_step_jits[l] = jitted
        return jitted

    # ------------------------------------------- seeded root step (packed)
    def _get_root_seeded_step(self):
        """Root-level hydro step in the LEAN kernel formulation with
        IN-KERNEL flux-register seeding: the sweep kernels emit the
        boundary-masked flux divergence (the coarse-side register
        correction, pre-dt) next to the ordinary divergence totals, so at
        benchmark scale the root never materializes a face array -- the
        classic return_fluxes program's ~5 GB arena next to ~6 GB of pool
        state is what overran the chip. Requires an all-periodic f32 root
        whose fine coverage does not touch the domain boundary (the
        roll-frame boundary masks match the padded-zero convention only
        away from the edges; `_root_seed_masks` checks). The blended
        (FOFC) fluxes feed both the update and the register, so reflux
        stays exactly consistent with the update in every branch."""
        key = "seeded0"
        if key in self._level_step_jits:
            return self._level_step_jits[key]
        opts = self.level_opts[0]
        nh = self.layout.nvar_hydro
        strang = self._strang if self._strang_active else None
        bc_free = {0: None, 1: None, 2: None}

        def step(U, dt, bm0, bm1, bm2):
            ok = jnp.asarray(True)
            if strang is not None:
                U, ok1 = strang(U, 0.5 * dt)
                ok = jnp.logical_and(ok, ok1)
            Uh_new, stats = hydro_advance.advance_hydro_rk2(
                U[:nh], dt, opts, lambda x: x, (0, 0, 0),
                (True, True, True), bc_kinds=bc_free,
                reflux_corr_masks={0: bm0, 1: bm1, 2: bm2},
            )
            U_new = (jnp.concatenate([Uh_new, U[nh:]], axis=0)
                     if nh < U.shape[0] else Uh_new)
            if strang is not None:
                U_new, ok2 = strang(U_new, 0.5 * dt)
                ok = jnp.logical_and(ok, ok2)
            corr = stats.pop("reflux_corr")
            smax = jnp.max(euler.max_signal_speed(U_new, opts.eos))
            return U_new, corr, {"max_signal": smax, "valid": ok, **stats}

        jitted = jax.jit(step)
        self._level_step_jits[key] = jitted
        return jitted

    def _root_seeded_eligible(self) -> bool:
        from ..registry import BC_PERIODIC

        if getattr(self, "_root_seed_ok", None) is None:
            p = self.problem
            self._root_seed_ok = (
                self.pool_packed
                and self.do_reflux
                and self.dtype == jnp.float32
                and self.decomp is None
                and all(bc == BC_PERIODIC for d in range(3)
                        for bc in p.bcs.axis(d))
                and self.level_opts[0].use_pallas
            )
        return self._root_seed_ok

    def _root_seed_masks(self):
        """Per-axis coarse-fine boundary face masks of level 1's coverage
        on the root grid (roll frame), rebuilt per regrid epoch; None when
        fine coverage touches the domain boundary (fall back to the
        classic padded step there)."""
        import numpy as np

        st = self.level_pool[1] if self._is_pool(1) else None
        epoch = (st.meta.epoch if st is not None else
                 int(self.level_steps[0]))
        cached = getattr(self, "_root_bmasks", None)
        if cached is not None and cached[0] == epoch:
            return cached[1]
        mask_fine = (st.coverage_dense() if st is not None
                     else self.level_mask[1])
        key = "root_bmasks"
        if key not in self._pool_jits:
            active = self.grid.active_axes

            def build(mf):
                cmask = ops.restrict_mask_any(mf, active)
                bms = tuple(
                    (cmask != sh(cmask, -1, d)).astype(self.dtype)
                    for d in range(3)
                )
                edges = []
                for d in range(3):
                    n_d = cmask.shape[d]
                    idx = jnp.asarray([0, n_d - 1])
                    edges.append(jnp.any(jnp.take(cmask, idx, axis=d)))
                return bms, jnp.any(jnp.stack(edges))

            self._pool_jits[key] = jax.jit(build)
        bms, edge = self._pool_jits[key](mask_fine)
        masks = None if bool(edge) else bms
        self._root_bmasks = (epoch, masks)
        return masks

    def _get_level_rad(self, l: int):
        if l not in self._level_rad:
            from ..radiation.advance import LevelRadiation

            self._level_rad[l] = LevelRadiation(self, l, self.level_grids[l])
        return self._level_rad[l]

    def _get_pool_rad(self, l: int):
        if l not in self._pool_rad:
            from ..radiation.pool import PoolLevelRadiation

            self._pool_rad[l] = PoolLevelRadiation(self, l, self.level_grids[l])
        return self._pool_rad[l]

    def _barrier(self, *xs):
        """Host sync between heavyweight phases (see `sync_dispatch`)."""
        if self.sync_dispatch:
            jax.block_until_ready([x for x in xs if x is not None])

    # ---------------------------------------------------------------- reflux
    #
    # The flux-register correction is applied in TWO stages (reference
    # `YAFluxRegister` CrseInit/FineAdd/Reflux semantics): the COARSE side
    # is converted into a cell-centered correction field EAGERLY, right
    # after the level's fluxes exist (`_reflux_seed`), so the full-size
    # face dicts (3 x nvar full fields -- 2.4 GB at the 256^3 benchmark
    # root) never stay resident through the radiation subcycle and the
    # whole fine-level recursion; the FINE side is added when the
    # subcycled children finish (`_reflux_apply`). The correction is
    # linear in the fluxes, so seed(F_fine) - seed(F_crse) equals the
    # one-shot formulation up to FP re-association (conservation still
    # telescopes exactly: each stage's cell sums cancel per face).
    def _reflux_corr(self, l: int, F: dict, mask_fine, dt_c, acc=None):
        """Cell-centered reflux correction contribution of face-flux dict
        `F` on the coarse-fine boundary faces of `mask_fine` (interior
        shape, F.ncomp components).

        One jitted program PER AXIS, consuming (popping) `F` as it goes:
        at the 256^3 benchmark root the three full-size face fields are
        1.3-2.4 GB next to ~8 GB of pool state, so neither a single
        3-axis program's temp arena nor the full dict may stay live."""
        key = ("reflux_corr", l)
        if key not in self._reflux_jits:
            opts = self.level_opts[l]
            ng = self.ng
            active = self.grid.active_axes

            def corr_axis(Fd, mask_fine, dt_c, acc, d):
                from ..stencil import interior

                cmask = ops.restrict_mask_any(mask_fine, active)
                m_p = jnp.pad(cmask, [(g, g) for g in ng])
                # boundary faces: covered/uncovered status differs
                # across the face (mask in padded coords)
                boundary = m_p != sh(m_p, -1, d)
                dF = jnp.where(boundary[None], Fd, 0.0)
                contrib = interior(
                    (dF - sh(dF, 1, d + 1)) * (dt_c / opts.dx[d]), ng
                )
                return contrib if acc is None else acc + contrib

            self._reflux_jits[key] = jax.jit(
                corr_axis, static_argnums=(4,), donate_argnums=(3,)
            )
        fn = self._reflux_jits[key]
        dt_a = jnp.asarray(dt_c, self.level_U[l].dtype)
        corr = acc
        for d in sorted(F):
            Fd = F.pop(d)  # free each face field as soon as it is seeded
            corr = fn(Fd, mask_fine, dt_a, corr, d)
            self._barrier(corr)
        return corr

    def _reflux_apply(self, l: int, corr_crse, corr_fine, mask_fine):
        """U[l] += (corr_fine - corr_crse) on uncovered coarse cells."""
        key = ("reflux_apply", l)
        if key not in self._reflux_jits:
            active = self.grid.active_axes

            def apply_fn(U, mask_fine, corr_crse, corr_fine):
                cmask = ops.restrict_mask_any(mask_fine, active)
                corr = corr_fine - corr_crse
                if corr.shape[0] < U.shape[0]:
                    # flux register covers only the leading components
                    pad = jnp.zeros(
                        (U.shape[0] - corr.shape[0], *corr.shape[1:]),
                        corr.dtype,
                    )
                    corr = jnp.concatenate([corr, pad], axis=0)
                # apply only to uncovered coarse cells (covered ones get
                # averaged down)
                U = U + jnp.where(cmask[None], 0.0, corr)
                return self._rad_fixup(U)

            self._reflux_jits[key] = jax.jit(apply_fn)
        self.level_U[l] = self._reflux_jits[key](
            self.level_U[l], mask_fine, corr_crse, corr_fine
        )

    def _reflux(self, l: int, F_crse: dict, F_fine_sum: dict, dt_c: float):
        """One-shot convenience (dense children): seed both sides, apply."""
        mask_fine = self.level_mask[l + 1]
        corr_c = self._reflux_corr(l, F_crse, mask_fine, dt_c)
        corr_f = self._reflux_corr(l, F_fine_sum, mask_fine, dt_c)
        self._reflux_apply(l, corr_c, corr_f, mask_fine)

    def _rad_fixup(self, U):
        """Radiation floor after reflux corrections (the radiation analog of
        the reference's post-reflux FixupState; its radiation system floors
        Erad everywhere it updates it, ``src/radiation/radiation_system.hpp``
        Erad_floor_). A reflux correction can push an uncovered coarse
        cell's Erad negative; prolongation then seeds the fine level's
        transport with it, whose donor-cell admissibility fallback divides
        by the (negative) cell Erad -> NaN. Flooring here keeps the
        invariant Erad > 0 that the transport fallback relies on."""
        if not self.layout.radiation_enabled or self._radiation is None:
            return U
        rs = self.layout.rad_start
        G = self.layout.n_groups
        floor = self._radiation.opts.erad_floor
        R = U[rs:].reshape(G, 4, *U.shape[1:])
        R = R.at[:, 0].set(jnp.maximum(R[:, 0], floor))
        return U.at[rs:].set(R.reshape(G * 4, *U.shape[1:]))

    def _average_down(self, l: int):
        """U_l := restriction of U_{l+1} where covered (one jitted call)."""
        if l not in self._avgdown_jits:
            opts = self.level_opts[l]
            active = self.grid.active_axes

            def avgdown_fn(U, U_fine, mask_fine):
                cmask = ops.restrict_mask_any(mask_fine, active)
                Uf_r = ops.restrict(U_fine, active)
                U = jnp.where(cmask[None], Uf_r, U)
                # fixup after reflux/averaging (reference FixupState)
                return euler.enforce_limits(
                    U, opts.eos, opts.density_floor, opts.temperature_floor,
                    opts.n_scalars,
                )

            self._avgdown_jits[l] = jax.jit(avgdown_fn)
        self.level_U[l] = self._avgdown_jits[l](
            self.level_U[l], self.level_U[l + 1], self.level_mask[l + 1]
        )

    # ---------------------------------------------------------------- gravity
    def _setup_gravity(self):
        """Hierarchy gravity (reference `calculateGpotAllLevels`,
        ``src/simulation.hpp:1011-1096``).  TPU-first formulation: every
        level in the dense-mask hierarchy is a FULL-DOMAIN field (carrying
        prolonged coarse data where unrefined), so the finest level already
        IS the composite density field -- one FFT Poisson solve at the
        finest resolution replaces the reference's multi-level OpenBCSolver,
        and each coarser level is kicked with the conservatively restricted
        potential."""
        if self.max_level == 0:
            super()._setup_gravity()
            return
        self.particles = self.problem.create_initial_particles(self.grid)
        self._greens_level: Dict[int, jnp.ndarray] = {}
        self._grav_solve_jits: Dict[int, Callable] = {}
        self.phi = None
        self._phi_level = 0

    def _gravity_greens(self, l: int):
        if l not in self._greens_level:
            from ..gravity import poisson as pg

            g = self.level_grids[l]
            # kernel at the FFT dtype (TPU backends have no complex128)
            fdt = pg._fft_real_dtype(self.dtype)
            Gk = pg.greens_function_kernel(g.n_cell, g.dx, fdt)
            self._greens_level[l] = jnp.fft.rfftn(Gk)
        return self._greens_level[l]

    def _get_grav_solve(self, lf: int):
        """Jitted: (rho_finest, particle_rhs) -> phi at the finest level."""
        if lf in self._grav_solve_jits:
            return self._grav_solve_jits[lf]
        from ..gravity import poisson as pg

        gf = self.level_grids[lf]

        # greens passed as an argument (a closure constant would be
        # host-materialized at lowering; complex transfers are unimplemented
        # on some TPU attachment backends)
        if self.gravity_bc == "open":
            def solve(rho, prhs, greens):
                rhs = 4.0 * jnp.pi * self.Gconst * rho + prhs
                return pg.solve_poisson_open(rhs, gf.dx, greens)

            jitted = jax.jit(solve)
            fn = lambda rho, prhs: jitted(rho, prhs, self._gravity_greens(lf))
        else:
            def solve(rho, prhs):
                rhs = 4.0 * jnp.pi * self.Gconst * rho + prhs
                return pg.solve_poisson_periodic(rhs, gf.dx)

            fn = jax.jit(solve)
        self._grav_solve_jits[lf] = fn
        return fn

    def _gravity_solve_hierarchy(self):
        from ..particles import cic

        lf = self.finest_level
        gf = self.level_grids[lf]
        if self.particles is not None:
            prhs = cic.cic_deposit(self.particles, gf,
                                   4.0 * jnp.pi * self.Gconst)
        else:
            prhs = jnp.zeros(gf.n_cell, dtype=self.dtype)
        self.phi = self._get_grav_solve(lf)(self.level_U[lf][0], prhs)
        self._phi_level = lf

    def _particle_accel(self):
        from ..gravity import poisson as pg
        from ..particles import cic

        if self.max_level == 0:
            return super()._particle_accel()
        gf = self.level_grids[self._phi_level]
        g3 = pg.gravity_accel(self.phi, gf.dx)
        return cic.cic_gather(g3, self.particles, gf)

    def _gravity_before_step(self, dt: float):
        if self.max_level == 0:
            super()._gravity_before_step(dt)
            return
        from ..particles import cic

        if self.particles is not None:
            if self.phi is None:
                self._gravity_solve_hierarchy()
            self.particles = cic.kick(self.particles, self._particle_accel(),
                                      0.5 * dt)

    def _gravity_after_step(self, dt: float):
        """Post-step composite solve + operator-split kick at every level
        (reference `ellipticSolveAllLevels` -> `gravAccelAllLevels` +
        `applyPoissonGravityAtLevel`, ``simulation.hpp:1071-1096``)."""
        if self.max_level == 0:
            super()._gravity_after_step(dt)
            return
        from ..gravity import poisson as pg
        from ..particles import cic

        lf_grid = self.level_grids[self.finest_level]
        if self.particles is not None:
            self.particles = cic.drift(self.particles, dt, lf_grid,
                                       self.periodic)
        self._gravity_solve_hierarchy()
        phi_l = self.phi
        for l in range(self._phi_level, -1, -1):
            self.level_U[l] = pg.apply_gravity_kick(
                self.level_U[l], phi_l, self.level_grids[l].dx, dt
            )
            if l > 0:
                phi_l = ops.restrict(phi_l, self.grid.active_axes)
        self.U = self.level_U[0]
        if self.particles is not None:
            self.particles = cic.kick(self.particles, self._particle_accel(),
                                      0.5 * dt)

    # ------------------------------------------------------ tile-pool regrid
    def _padded_current(self, l: int):
        """Ghost-padded FULL state of level l at the current time (regrid
        and IC paths; the hot loop threads padded parent pairs instead)."""
        if not self._is_pool(l):
            return self._get_dense_pad(l)(self.level_U[l])
        st = self.level_pool[l]
        ppad = self._padded_current(l - 1)
        nbr, org, ps, po = self._pool_pad_args(l)
        one = jnp.asarray(1.0, st.U.dtype)
        return self._get_pool_pad(l)(st.U, nbr, org, ps, po, ppad, ppad, one)

    def _pool_active_mask(self, l: int) -> jnp.ndarray:
        m = self.level_pool[l].meta
        return jnp.arange(m.capacity) < m.n_active

    def _pool_sharding(self):
        """Tile-axis sharding over the device mesh (the pool analog of the
        dense per-level block sharding: tiles are the distribution unit,
        like AMReX boxes under a DistributionMapping)."""
        if self.decomp is None:
            return None
        from jax.sharding import NamedSharding, PartitionSpec as P

        return NamedSharding(
            self.decomp.mesh, P(tuple(self.decomp.mesh.axis_names))
        )

    def _shard_pool(self, l: int):
        sh = self._pool_sharding()
        if sh is not None and self.level_pool[l] is not None:
            self.level_pool[l].U = jax.device_put(self.level_pool[l].U, sh)

    def _regrid_ctx(self, l: int):
        """Parent context for padding LEVEL-l tiles at the CURRENT time
        (regrid/tag path; see `sparse.current_backdrop_fn`). The lazy
        "pool" kind keeps the benchmark-scale first pool level from ever
        materializing a full padded array."""
        lp = l - 1
        if not self._is_pool(lp):
            return ("dense", (self._get_dense_pad(lp)(self.level_U[lp]),))
        if self.pool_chunk and not self._is_pool(lp - 1):
            stp = self.level_pool[lp]
            nbr_p, org_p, _, _ = self._pool_pad_args(lp)
            gp_pad = self._get_dense_pad(lp - 1)(self.level_U[lp - 1])
            return ("pool", (stp.U, nbr_p, org_p, gp_pad))
        return ("poolpad", (self._padded_current(lp),))

    def _pool_octant_tags(self, l: int) -> np.ndarray:
        """[T, 2, 2, 2] bool: tagged octants of pool level l's tiles
        (buffered by n_error_buf via exact cross-tile dilation on the
        ghost-padded tags). The padded tiles are assembled and consumed
        PER CHUNK -- the full padded pool (8x the state at benchmark
        scale, with lane padding on top) is never materialized."""
        st = self.level_pool[l]
        g = self._g
        if self.n_error_buf > g:
            raise ValueError(
                f"amr.n_error_buf {self.n_error_buf} exceeds the pool ghost "
                f"width {g} (cross-tile tag dilation would be inexact)"
            )
        kind, arrs = self._regrid_ctx(l)
        key = ("octags", l, kind)
        if key not in self._pool_jits:
            problem = self.problem
            grid = self.level_grids[l]
            n_buf = self.n_error_buf
            ts = self.tile_shape
            active = self.grid.active_axes
            chunk = max(self.pool_chunk, 16) if self.pool_chunk else 64

            def fn(U, nbr, org, ps, po, ctx_arrs):
                mk = sp.current_backdrop_fn(kind, ctx_arrs, ts, g, active)
                slabs = tp.slice_slabs(U, g)

                def one(up, o):
                    tags = problem.error_est_local(up, grid, l, o)
                    tags = ops.dilate(tags, n_buf, (0, 1, 2), (False,) * 3)
                    tags = tags[g:-g, g:-g, g:-g]
                    return tags.reshape(
                        2, ts[0] // 2, 2, ts[1] // 2, 2, ts[2] // 2
                    ).any(axis=(1, 3, 5))

                def body(args):
                    u_c, nbr_c, org_c, ps_c, po_c = args
                    bd = mk(org_c, ps_c, po_c)
                    up = tp.assemble_padded(u_c, nbr_c, bd, slabs, g)
                    return jax.vmap(one)(up, org_c)

                return sp._chunked_map(body, (U, nbr, org, ps, po), chunk)

            self._pool_jits[key] = jax.jit(fn)
        nbr, org, ps, po = self._pool_pad_args(l)
        octs = self._pool_jits[key](st.U, nbr, org, ps, po, arrs)
        return np.asarray(octs)[: st.meta.n_active]

    def _regrid_pool_level(self, l: int) -> bool:
        """(Re)build POOL level l+1 from tags on level l (dense or pool)."""
        ts = self.tile_shape
        active = self.grid.active_axes
        child_shape = self.level_grids[l + 1].n_cell
        g = self._g

        if self._is_pool(l):
            if self.pool_packed:
                from . import packed_driver as pd

                octs = pd.octant_tags_packed(self, l)
            else:
                octs = self._pool_octant_tags(l)
            meta_l = self.level_pool[l].meta
            tiles = []
            for s in range(meta_l.n_active):
                i, j, k = (int(v) for v in meta_l.ijk[s])
                for a in range(2):
                    for b in range(2):
                        for c in range(2):
                            if octs[s, a, b, c]:
                                tiles.append((2 * i + a, 2 * j + b, 2 * k + c))
        else:
            tags = self.problem.error_est(self, l)
            if tags is None:
                return self.finest_level > l
            tags = jnp.asarray(tags, dtype=bool)
            tags = ops.dilate(tags, self.n_error_buf, active, self.periodic)
            TX, TY, TZ = (child_shape[d] // ts[d] for d in range(3))
            hx, hy, hz = ts[0] // 2, ts[1] // 2, ts[2] // 2
            blocks = tags.reshape(TX, hx, TY, hy, TZ, hz).any(axis=(1, 3, 5))
            tiles = [tuple(int(v) for v in t)
                     for t in np.argwhere(np.asarray(blocks))]

        # keep the nesting invariant: existing grandchild tiles pin their
        # parent tiles until the grandchild's own regrid runs (the dense
        # path's full-domain arrays make this implicit)
        if l + 2 <= self.max_level and self.level_pool[l + 2] is not None:
            gc_meta = self.level_pool[l + 2].meta
            pins = {
                tuple(int(v) // 2 for v in gc_meta.ijk[s])
                for s in range(gc_meta.n_active)
            }
            tiles = sorted(set(tiles) | pins)

        self._active_cell_cache.pop(l + 1, None)
        if not tiles:
            self.finest_level = min(self.finest_level, l)
            self.level_pool[l + 1] = None
            if self._is_pool(l):
                self.level_pool[l].child_slots = None
            return False

        old = self.level_pool[l + 1]
        hr = self.pool_headroom
        if old is not None:
            cap = old.meta.grow_capacity(len(tiles), headroom=hr)
        else:
            cap = max(8, int(np.ceil(len(tiles) * hr)))
        if self.pool_chunk or self.pool_packed:
            # chunked execution maps fixed-size tile chunks: round the
            # capacity bucket up to a chunk multiple
            c = max(self.pool_chunk, self.packed_chunk if self.pool_packed
                    else 0)
            cap = ((cap + c - 1) // c) * c
        if self.decomp is not None:
            # tile-axis sharding: every device owns cap/ndev slots
            nd = self.decomp.n_devices
            cap = ((cap + nd - 1) // nd) * nd
        meta = tp.TileMeta.build(child_shape, ts, tiles, self.periodic,
                                 capacity=cap)

        if self.pool_packed:
            from . import packed_driver as pd

            self.level_pool[l + 1] = pd.build_packed_level(self, l, meta,
                                                           old)
            if l + 2 <= self.max_level and self.level_pool[l + 2] is not None:
                gc = self.level_pool[l + 2]
                gps, gpo = tp.parent_linkage(gc.meta, meta)
                gc.parent_slot, gc.parent_off = gps, gpo
                self.level_pool[l + 1].child_slots = tp.child_linkage(
                    meta, gc.meta
                )
            if self._is_pool(l):
                self.level_pool[l].child_slots = tp.child_linkage(
                    self.level_pool[l].meta, meta
                )
            self.finest_level = max(self.finest_level, l + 1)
            return True

        old_U = remap_dev = None
        if old is not None and old.meta.n_active:
            remap = np.full(meta.capacity, -1, np.int32)
            for t, s in meta.slot_of.items():
                remap[s] = old.meta.slot_of.get(t, -1)
            remap_dev = jnp.asarray(remap)
            old_U = old.U
        if self._is_pool(l):
            ps, po = tp.parent_linkage(meta, self.level_pool[l].meta)
            kind, arrs = self._regrid_ctx(l)
            nbr_l, org_l, ps_l, po_l = self._pool_pad_args(l)
            U_new = sp.prolong_tiles_from_pool_lazy(
                self.level_pool[l].U, nbr_l, org_l, ps_l, po_l, kind, arrs,
                ps, po, ts, g, active,
                chunk=max(self.pool_chunk, 16) if self.pool_chunk else 64,
                n_active=meta.n_active, old_U=old_U, remap=remap_dev,
            )
        else:
            ps = po = None
            U_new = sp.prolong_tiles_from_dense(
                self._padded_current(l), meta.origin_dev, ts, g, active,
                n_active=meta.n_active, old_U=old_U, remap=remap_dev,
            )

        # the child's OWN children must stay nested: rebuild the linkage
        # below if a grandchild pool exists (regrid proceeds top-down, so
        # the grandchild is rebuilt right after this call)
        self.level_pool[l + 1] = sp.PoolState(
            meta=meta, U=U_new, parent_slot=ps, parent_off=po
        )
        self._shard_pool(l + 1)
        if l + 2 <= self.max_level and self.level_pool[l + 2] is not None:
            gc = self.level_pool[l + 2]
            gps, gpo = tp.parent_linkage(gc.meta, meta)
            gc.parent_slot, gc.parent_off = gps, gpo
            self.level_pool[l + 1].child_slots = tp.child_linkage(meta, gc.meta)
        if self._is_pool(l):
            self.level_pool[l].child_slots = tp.child_linkage(
                self.level_pool[l].meta, meta
            )
        self.finest_level = max(self.finest_level, l + 1)
        return True

    # ---------------------------------------------------------------- regrid
    def _regrid_level(self, l: int) -> bool:
        """(Re)build level l+1 from error tags on level l. Returns True if
        level l+1 exists afterwards."""
        if self._is_pool(l + 1):
            return self._regrid_pool_level(l)
        tags = self.problem.error_est(self, l)
        if tags is None:
            return self.finest_level > l
        tags = jnp.asarray(tags, dtype=bool)
        tags = ops.dilate(tags, self.n_error_buf, self.grid.active_axes, self.periodic)
        if l > 0:
            # proper nesting: stay inside the current level-l refined region
            inner = jnp.logical_not(
                ops.dilate(jnp.logical_not(self.level_mask[l]), 1,
                           self.grid.active_axes, self.periodic)
            )
            tags = tags & inner

        new_mask = ops.prolong_mask(tags, self.grid.active_axes)
        self._active_cell_cache.pop(l + 1, None)
        if not bool(jnp.any(new_mask)):
            self.finest_level = min(self.finest_level, l)
            self.level_U[l + 1] = None
            self.level_mask[l + 1] = None
            return False

        prolonged = ops.prolong(self.level_U[l], self.grid.active_axes)
        old_U = self.level_U[l + 1]
        old_mask = self.level_mask[l + 1]
        if old_U is None:
            U_new = prolonged
        else:
            keep = old_mask & new_mask
            U_new = jnp.where(keep[None], old_U, prolonged)
        self.level_U[l + 1] = U_new
        self.level_mask[l + 1] = new_mask
        self.finest_level = max(self.finest_level, l + 1)
        self._shard_level(l + 1)
        return True

    # ---------------------------------------------------------------- advance
    def compute_timestep(self) -> float:
        if self.constant_dt > 0.0:
            return min(self.constant_dt, self.stop_time - self.t)
        # dt_0 = min over levels of 2^l * cfl * dx_l / smax_l  (reference
        # computeTimestep with default subcycling, src/simulation.hpp:722-818).
        # One jitted call per hierarchy depth; ONE host sync at the end.
        finest = self.finest_level
        dt0 = np.inf
        for l in range(finest + 1):
            if self.layout.radiation_enabled and self._radiation is not None:
                # cap dt so the per-level radiation subcycle count stays
                # within max_substeps, at the RADIATION cfl (reference
                # computeNumberOfRadiationSubsteps)
                fac = (2**l) if self.do_subcycle else 1
                ropts = self._radiation.opts
                dt_l = (ropts.max_substeps * ropts.cfl
                        * self.level_grids[l].dx_min / ropts.chat)
                dt0 = min(dt0, fac * dt_l)
        dense_top = min(finest, self.sparse_min_level - 1)
        if self.pool_packed and finest > dense_top:
            # packed pools: streamed per-level signal maxima (their 5D
            # state never exists); dense levels via the dense-only jit
            from . import packed_driver as pd

            for l in range(dense_top + 1, finest + 1):
                fac = (2**l) if self.do_subcycle else 1
                smax = float(pd.packed_max_signal(self, l))
                if smax > 0:
                    dt0 = min(dt0, fac * self.cfl
                              * self.level_grids[l].dx_min / smax)
            finest = dense_top  # dt_fn below sees only the dense levels
        if finest not in self._dt_jits:
            nh = self.layout.nvar_hydro
            cfl = self.cfl
            subcyc = self.do_subcycle

            def dt_fn(Us, masks, pools, pmasks):
                parts = []
                for l in range(dense_top + 1):
                    # subcycled: level l runs 2^l substeps per coarse step
                    fac = (2**l) if subcyc else 1
                    opts = self.level_opts[l]
                    sig = euler.max_signal_speed(Us[l][:nh], opts.eos)
                    if l > 0:
                        sig = jnp.where(masks[l], sig, 0.0)
                    smax = jnp.max(sig)
                    parts.append(jnp.where(
                        smax > 0,
                        fac * cfl * self.level_grids[l].dx_min / smax,
                        jnp.inf,
                    ))
                for i, l in enumerate(range(dense_top + 1, finest + 1)):
                    fac = (2**l) if subcyc else 1
                    opts = self.level_opts[l]
                    sig = jax.vmap(
                        lambda u: jnp.max(euler.max_signal_speed(u, opts.eos))
                    )(pools[i][:, :nh])
                    smax = jnp.max(jnp.where(pmasks[i], sig, 0.0))
                    parts.append(jnp.where(
                        smax > 0,
                        fac * cfl * self.level_grids[l].dx_min / smax,
                        jnp.inf,
                    ))
                return jnp.min(jnp.stack(parts))

            self._dt_jits[finest] = jax.jit(dt_fn)
        dt_dev = self._dt_jits[finest](
            tuple(self.level_U[: dense_top + 1]),
            tuple(self.level_mask[: dense_top + 1]),
            tuple(self.level_pool[l].U
                  for l in range(dense_top + 1, finest + 1)),
            tuple(self._pool_active_mask(l)
                  for l in range(dense_top + 1, finest + 1)),
        )
        dt0 = min(dt0, float(dt_dev))
        dt0 = min(dt0, 1.1 * self.dt_prev, self.max_dt)
        if self.t == 0.0:
            dt0 = min(dt0, self.init_dt)
        eps = 1.0e-3 * dt0
        if self.t + dt0 > self.stop_time - eps:
            dt0 = self.stop_time - self.t
        return dt0

    def advance_single_step(self, dt: float) -> bool:
        """Coarse step with a retry ladder: on solver failure anywhere in the
        hierarchy, restore the pre-step state and redo the whole coarse step
        as 2^k substeps of dt/2^k (the reference retries per level,
        ``src/QuokkaSimulation.hpp:886-990``; retrying the coarse step is the
        conservative equivalent for the dense-level hierarchy)."""
        import dataclasses as _dc

        max_retries = 6
        if self.pool_packed:
            # packed substeps advance in place with donated buffers: a
            # pre-step stash would both defeat the memory design (an
            # extra copy of a benchmark-scale hierarchy) and block the
            # donation (live second references force copies). On failure
            # the step aborts instead of retrying.
            max_retries = 0
            saved_U = saved_mask = saved_steps = None
            saved_finest = self.finest_level
            saved_pool = None
        else:
            saved_U = [u for u in self.level_U]
            saved_mask = [m for m in self.level_mask]
            saved_steps = list(self.level_steps)
            saved_finest = self.finest_level
            saved_pool = [
                _dc.replace(st) if st is not None else None
                for st in self.level_pool
            ]

        for retry in range(max_retries + 1):
            nsub = 2**retry
            ok = True
            for i in range(nsub):
                self._substep_valid_flags = []
                self._timestep_with_subcycling(0, self.t + i * dt / nsub, dt / nsub)
                # strang-source failures (burn/cooling non-convergence) AND
                # per-level state-finiteness flags are all collected
                # ON-DEVICE across levels/substeps; exactly ONE host sync per
                # coarse substep triggers the retry ladder (the reference
                # host-checks per level, src/QuokkaSimulation.hpp:886-990)
                if self._substep_valid_flags and not bool(
                    jnp.all(jnp.stack(self._substep_valid_flags))
                ):
                    ok = False
                    break
            if ok:
                self.U = self.level_U[0]
                return True
            if saved_U is None:
                return False  # packed mode: no stash to restore
            # restore and retry with halved dt
            self.level_U = [u for u in saved_U]
            self.level_mask = [m for m in saved_mask]
            self.level_steps = list(saved_steps)
            self.finest_level = saved_finest
            self.level_pool = [
                _dc.replace(st) if st is not None else None
                for st in saved_pool
            ]
            if self.verbose:
                print(f"\t>> Re-trying AMR coarse step (nsubsteps={2*nsub})")
        return False

    def _timestep_with_subcycling(self, l: int, t_level: float, dt_l: float):
        # regrid below this level periodically
        if (
            l < self.max_level
            and self.level_steps[l] > 0
            and self.level_steps[l] % self.regrid_interval == 0
        ):
            self._regrid_level(l)

        from ..utils.profiler import prof

        U_old = self.level_U[l]
        # in-kernel-seeded lean root (benchmark-scale packed mode): the
        # step emits the register correction directly; no face arrays
        seeded_corr = None
        use_seeded = (
            l == 0 and l < self.finest_level and self._root_seeded_eligible()
        )
        if use_seeded:
            bms = self._root_seed_masks()
            use_seeded = bms is not None
        step = (self._get_root_seeded_step() if use_seeded
                else self._get_level_step(l))
        with prof.region(f"hydro_L{l}"):
            if l == 0 and use_seeded:
                U_new, corr_raw, _stats = step(U_old, dt_l, *bms)
                fluxes = None
                seeded_corr = dt_l * corr_raw
            elif l == 0:
                U_new, fluxes, _stats = step(U_old, dt_l)
            else:
                theta1 = (t_level - self._parent_t) / self._parent_dt
                theta2 = theta1 + dt_l / self._parent_dt
                U_new, fluxes, _stats = step(
                    U_old, self.level_mask[l], self._parent_U_old, self._parent_U_new,
                    jnp.asarray(theta1, U_old.dtype), jnp.asarray(theta2, U_old.dtype),
                    dt_l,
                )
            prof.sync(U_new)
        self._barrier(U_new)
        if "valid" in _stats and hasattr(self, "_substep_valid_flags"):
            self._substep_valid_flags.append(_stats["valid"])

        # eager coarse-side flux-register seeding at the root: convert the
        # hydro face fluxes into the cell-centered reflux correction NOW so
        # the 3 full-size face fields are freed before the radiation
        # subcycle and the fine-level recursion (at the 256^3 benchmark
        # root they are 1.3-2.4 GB that would otherwise stay resident
        # through everything below). l > 0 seeds after `publish` (its
        # fluxes must be own-mask-neutralized first).
        seed_corr = None
        seed_mask = None
        want_seed = l < self.finest_level and self.do_reflux
        if want_seed:
            seed_mask = (
                self.level_pool[l + 1].coverage_dense()
                if self._is_pool(l + 1) else self.level_mask[l + 1]
            )
        if want_seed and l == 0:
            if seeded_corr is not None:
                seed_corr = seeded_corr  # emitted by the lean step kernels
            else:
                seed_corr = self._reflux_corr(l, fluxes, seed_mask, dt_l)
            fluxes = None

        # radiation subcycle at this level (reference order: hydro then
        # radiation at each level, QuokkaSimulation::advanceSingleTimestepAtLevel)
        if self.layout.radiation_enabled and self._radiation is not None:
            radL = self._get_level_rad(l)
            if l == 0:
                # seeded root: consume each substep's transport flux into
                # the register correction as it is produced -- the
                # accumulated full-size flux_sum dict never exists
                consume = None
                rad_seed = {"corr": None}
                if fluxes is None:
                    def consume(eff, w):
                        Fw = {d: w * Fd for d, Fd in eff.items()}
                        rad_seed["corr"] = self._reflux_corr(
                            l, Fw, seed_mask, dt_l, acc=rad_seed["corr"]
                        )
                with prof.region(f"rad_L{l}"):
                    U_new, rad_flux = radL.subcycle(U_new, t_level, dt_l,
                                                    flux_reduce=consume)
                    prof.sync(U_new)
            else:
                with prof.region(f"rad_L{l}"):
                    U_new, rad_flux = radL.subcycle(
                        U_new, t_level, dt_l, mask=self.level_mask[l],
                        Uc_old=self._parent_U_old, Uc_new=self._parent_U_new,
                        theta_bounds=(theta1, theta2),
                    )
                    prof.sync(U_new)
                # inactive cells are defined to carry prolonged coarse data;
                # re-impose it after the radiation advance as well
                Uc_end = (1.0 - theta2) * self._parent_U_old + theta2 * self._parent_U_new
                U_new = jnp.where(
                    self.level_mask[l][None], U_new,
                    ops.prolong(Uc_end, self.grid.active_axes),
                )
            # radiation components join the flux register like hydro ones;
            # the dict stays at THIS level's resolution (the reflux against
            # level l+1 reads it) -- restriction to the parent happens below.
            # At the root the hydro part is already seeded: seed the
            # radiation part too and free the face dict (per-component the
            # correction is independent, so seeding the parts separately is
            # bit-identical to seeding the concatenated dict).
            if fluxes is None:
                seed_corr = jnp.concatenate(
                    [seed_corr, rad_seed["corr"]], axis=0
                )
                rad_flux = None
            else:
                fluxes = {
                    d: jnp.concatenate([fluxes[d], rad_flux[d]], axis=0)
                    for d in fluxes
                }
        if l > 0:
            # one jitted pass: neutralize inactive-region fluxes (garbage-
            # territory faces outside the level's mask must not reach the
            # reflux, see ops.mask_face_flux) AND restrict to the parent's
            # resolution for its flux register
            if l not in self._publish_jits:
                ng = self.ng
                active = self.grid.active_axes

                def publish_fn(fluxes, mask):
                    masked = {
                        d: ops.mask_face_flux(F, mask, d, ng)
                        for d, F in fluxes.items()
                    }
                    restricted = {
                        d: ops.restrict_face_flux(F, d, active, ng, ng)
                        for d, F in masked.items()
                    }
                    return masked, restricted

                self._publish_jits[l] = jax.jit(publish_fn)
            fluxes, restricted_for_parent = self._publish_jits[l](
                fluxes, self.level_mask[l]
            )
            if want_seed:
                # seed from the own-mask-neutralized fluxes and free them
                # before the child recursion (the restricted copy for the
                # parent's register is 8x smaller and survives)
                seed_corr = self._reflux_corr(l, fluxes, seed_mask, dt_l)
                fluxes = None
        self.level_U[l] = U_new
        self.level_steps[l] += 1
        # FOM counts ACTIVE cells only (the reference counts real patch
        # cells, ``src/simulation.hpp:972-980`` cellUpdatesEachLevel_);
        # the dense representation also advances unrefined backdrop cells,
        # tracked separately as raw work
        self.cell_updates += self._active_cells(l)
        self.cell_updates_raw += self.level_grids[l].num_cells
        # device-side finiteness flag (stays on device; the coarse-substep
        # driver stacks all flags and syncs once)
        if hasattr(self, "_substep_valid_flags"):
            self._substep_valid_flags.append(jnp.all(jnp.isfinite(U_new)))

        if l < self.finest_level:
            # save parent old/new for the children's space-time ghost fill
            child_pool = self._is_pool(l + 1)
            saved = (
                getattr(self, "_parent_U_old", None),
                getattr(self, "_parent_U_new", None),
                getattr(self, "_parent_t", None),
                getattr(self, "_parent_dt", None),
            )
            self._parent_U_old = U_old
            self._parent_U_new = U_new
            self._parent_t = t_level
            self._parent_dt = dt_l
            if child_pool:
                # pool children consume ghost-PADDED parent endpoints
                # (packed children prolong (2g+2)-deep fused-halo
                # backdrops -> donor width g+2)
                saved_pad = getattr(self, "_parent_ctx", None)
                if self.pool_packed:
                    from . import packed as pk

                    from ..registry import BC_USER

                    w = pk.donor_pad_width(self._g)
                    nh_ = self.layout.nvar_hydro
                    nr_ = self.layout.nvar - nh_
                    has_user = any(
                        BC_USER in self.problem.bcs.axis(d) for d in range(3)
                    )
                    if has_user:
                        # user BC hooks read the full state: pad whole,
                        # split after (costs transient full-pad copies)
                        pad = self._get_dense_pad(l, width=w)
                        po, pn = pad(U_old), pad(U_new)
                        ctx4 = (po[:nh_], pn[:nh_],
                                po[nh_:] if nr_ else None,
                                pn[nh_:] if nr_ else None)
                    else:
                        # pad the hydro and radiation parts SEPARATELY:
                        # the packed engine consumes them split, and at
                        # benchmark scale the full-layout pads plus their
                        # eager component slices were ~3 GB of duplicates
                        ph = self._get_dense_pad_part(l, "h", width=w)
                        pr = (self._get_dense_pad_part(l, "r", width=w)
                              if nr_ else None)
                        ctx4 = (ph(U_old), ph(U_new),
                                pr(U_old) if pr else None,
                                pr(U_new) if pr else None)
                    self._parent_ctx = ("dense", ctx4)
                else:
                    pad = self._get_dense_pad(l)
                    self._parent_ctx = ("dense", (pad(U_old), pad(U_new)))

            # subcycled: 2 fine substeps per parent step; global stepping:
            # one fine step with the same dt (reference do_subcycle=0)
            n_fine = 2 if self.do_subcycle else 1
            w = 1.0 / n_fine
            fine_flux_sum = None
            for i in range(n_fine):
                if child_pool and self.pool_packed:
                    from . import packed_driver as pd

                    pd.timestep_pool_packed(
                        self, l + 1, t_level + i * dt_l * w, dt_l * w
                    )
                elif child_pool:
                    self._timestep_pool(l + 1, t_level + i * dt_l * w, dt_l * w)
                else:
                    self._timestep_with_subcycling(
                        l + 1, t_level + i * dt_l * w, dt_l * w
                    )
                ff = self._last_restricted_fluxes
                if fine_flux_sum is None:
                    fine_flux_sum = {d: w * F for d, F in ff.items()}
                else:
                    fine_flux_sum = {
                        d: fine_flux_sum[d] + w * ff[d] for d in ff
                    }

            (self._parent_U_old, self._parent_U_new,
             self._parent_t, self._parent_dt) = saved
            if child_pool:
                self._parent_ctx = saved_pad

            if self.do_reflux:
                with prof.region(f"reflux_L{l}"):
                    if child_pool:
                        self._pool_child_reflux_dense(
                            l, seed_corr, fine_flux_sum, dt_l
                        )
                    else:
                        corr_f = self._reflux_corr(
                            l, fine_flux_sum, seed_mask, dt_l
                        )
                        self._reflux_apply(l, seed_corr, corr_f, seed_mask)
                    prof.sync(self.level_U[l])
            with prof.region(f"avgdown_L{l}"):
                if child_pool and self.pool_packed:
                    from . import packed_driver as pd

                    pd.avgdown_packed_into_dense(self, l)
                elif child_pool:
                    self._pool_child_avgdown_dense(l)
                else:
                    self._average_down(l)
                prof.sync(self.level_U[l])

        if l > 0:
            # publish to the parent AFTER the child recursion (which
            # overwrites _last_restricted_fluxes with its own): restriction
            # is linear, so restrict-then-average over fine substeps equals
            # average-then-restrict
            self._last_restricted_fluxes = restricted_for_parent

    # ------------------------------------------------------- tile-pool levels
    def _is_pool(self, l: int) -> bool:
        return 0 < self.sparse_min_level <= l

    @property
    def _g(self) -> int:
        return self.ng[0]

    def _pool_opts(self, l: int):
        """Pool levels run the classic (XLA) flux formulation vmapped over
        tiles; the Pallas sweep kernels are single-domain programs."""
        import dataclasses

        return dataclasses.replace(
            self.level_opts[l], use_pallas=False, fuse_update=False
        )

    def _get_dense_pad(self, l: int, width: int | None = None):
        """Jitted full-layout ghost fill of a dense level (the padded
        parent consumed by pool-child backdrops). `width` overrides the
        ghost width (the packed engine's fused halos prolong from
        (g+2)-deep parents)."""
        key = ("dense_pad", l, width)
        if key not in self._pool_jits:
            grid = self.level_grids[l]
            ng = tuple(width for _ in self.ng) if width else self.ng

            def pad(U):
                return fill_ghosts(
                    U, ng, self.problem.bcs, self.layout,
                    problem=self.problem, grid=grid,
                )

            self._pool_jits[key] = jax.jit(pad)
        return self._pool_jits[key]

    def _get_dense_pad_part(self, l: int, part: str,
                            width: int | None = None):
        """Jitted ghost fill of ONE component part ("h" = hydro, "r" =
        radiation) of a dense level: the packed engine consumes the parent
        pads split, and padding the parts directly avoids the full-layout
        pads + eager component-slice duplicates (~3 GB at the benchmark
        root). Valid when no BC_USER hook needs the full state; the slice
        happens inside the jit so no standalone copy is materialized."""
        key = ("dense_pad_part", l, part, width)
        if key not in self._pool_jits:
            grid = self.level_grids[l]
            ng = tuple(width for _ in self.ng) if width else self.ng
            nh = self.layout.nvar_hydro
            G = self.layout.n_groups

            if part == "h":
                class _HSlice:
                    nvar = nh
                    hydro_enabled = True
                    radiation_enabled = False
                    n_groups = 0

                lay = _HSlice()
                c0, c1 = 0, nh
            else:
                class _RSlice:
                    nvar = 4 * G
                    hydro_enabled = False
                    radiation_enabled = True
                    n_groups = G

                    @staticmethod
                    def rad_index(g, comp):
                        return 4 * g + comp

                lay = _RSlice()
                c0, c1 = nh, self.layout.nvar

            def pad(U):
                return fill_ghosts(
                    U[c0:c1], ng, self.problem.bcs, lay,
                    problem=None, grid=grid,
                )

            self._pool_jits[key] = jax.jit(pad)
        return self._pool_jits[key]

    def _get_pool_pad(self, l: int):
        """Jitted ghost fill of pool level l's FULL state at parent-window
        time theta (backdrop from the parent's padded old/new pair). The
        per-tile backdrop prolongation runs in lax.map chunks -- vmapped
        whole-pool it allocates ~6 prolong intermediates per tile and
        OOMs at benchmark scale."""
        key = ("pool_pad", l)
        if key not in self._pool_jits:
            parent_pool = self._is_pool(l - 1)
            ts = self.tile_shape
            g = self._g
            active = self.grid.active_axes
            chunk = max(self.pool_chunk, 16)

            def pad(U, nbr, org, ps, po, ppad_old, ppad_new, theta):
                pp = (1.0 - theta) * ppad_old + theta * ppad_new
                slabs = tp.slice_slabs(U, g)

                def body(args):
                    u_c, nbr_c, org_c, ps_c, po_c = args
                    if parent_pool:
                        bd = tp.make_backdrop_from_pool(
                            pp, ps_c, po_c, ts, g, g, active
                        )
                    else:
                        bd = tp.make_backdrop_from_dense(
                            pp, org_c, ts, g, g, active
                        )
                    return tp.assemble_padded(u_c, nbr_c, bd, slabs, g)

                return sp._chunked_map(body, (U, nbr, org, ps, po), chunk)

            self._pool_jits[key] = jax.jit(pad)
        return self._pool_jits[key]

    def _ctx_pair(self, lp: int, ctx):
        """Materialized padded parent pair from a parent context (for the
        deep-hierarchy `_get_pool_pad` chain). Lazy pool contexts are
        materialized here by assembling level lp's full padded pair
        (small pools only -- the lazy path exists so the LARGE first pool
        level never materializes its pair)."""
        kind, arrs = ctx
        if kind in ("dense", "poolpad"):
            return arrs[0], arrs[1]
        # lazy: (U_old, U_new, nbr, org, tha, thb, gp_old, gp_new); level
        # lp's parent is dense by construction of the lazy gate
        U_old, U_new, nbr, org, tha, thb, gpo, gpn = arrs
        st = self.level_pool[lp]
        zero = jnp.zeros((st.meta.capacity,), jnp.int32)
        zero3 = jnp.zeros((st.meta.capacity, 3), jnp.int32)
        pad = self._get_pool_pad(lp)
        return (
            pad(U_old, nbr, org, zero, zero3, gpo, gpn, tha),
            pad(U_new, nbr, org, zero, zero3, gpo, gpn, thb),
        )

    def _pool_pad_args(self, l: int):
        st = self.level_pool[l]
        m = st.meta
        zero = jnp.zeros((m.capacity,), jnp.int32)
        zero3 = jnp.zeros((m.capacity, 3), jnp.int32)
        ps = st.parent_slot if st.parent_slot is not None else zero
        po = st.parent_off if st.parent_off is not None else zero3
        return m.nbr_dev, m.origin_dev, ps, po

    def _get_pool_step(self, l: int, with_own: bool, kind: str):
        """Jitted one-substep hydro advance of pool level l. Returns
        (U_new, faces_own, faces_restr, stats): faces_own = the level's
        own time-averaged tile faces [0..t] (the coarse side of refluxing
        against level l+1; None unless `with_own`); faces_restr = the
        same restricted to parent resolution (this level's contribution
        to the parent's register).

        `kind` = the parent-context representation:
        - "dense":   ctx = (padded dense parent old, new)
        - "poolpad": ctx = (materialized padded parent POOL old, new)
        - "pool":    lazy ctx = (U_old_p, U_new_p, nbr_p, org_p, tha, thb,
          gp_padded_old, gp_padded_new) -- parent tiles are assembled ON
          DEMAND per chunk from the parent pool + the dense grandparent
          pair, so no full parent padded pool is ever materialized (the
          benchmark-scale path; identical expressions to the materialized
          scheme, just evaluated per chunk)."""
        key = (l, with_own, kind)
        if key in self._pool_step_jits:
            return self._pool_step_jits[key]
        parent_pool = kind != "dense"
        ts = self.tile_shape
        g = self._g
        active = self.grid.active_axes
        opts = self._pool_opts(l)
        nh = self.layout.nvar_hydro
        strang = self._strang if self._strang_active else None
        chunk = self.pool_chunk
        if kind == "pool" and not chunk:
            raise ValueError("lazy pool parent context requires amr.pool_chunk")

        def step(U_pool, nbr, org, ps, po, amask, ctx, th1, th2, dt):
            ok = jnp.asarray(True)
            if strang is not None:
                U_pool, ok1 = jax.vmap(lambda u: strang(u, 0.5 * dt))(U_pool)
                ok = jnp.logical_and(ok, jnp.all(jnp.where(amask, ok1, True)))

            if kind == "pool":
                (Uo_p, Un_p, nbr_p, org_p, tha, thb, gpo, gpn) = ctx
                gpa = ((1.0 - tha) * gpo + tha * gpn)[:nh]
                gpb = ((1.0 - thb) * gpo + thb * gpn)[:nh]
                Uo_h = Uo_p[:, :nh]
                Un_h = Un_p[:, :nh]
                sla = tp.slice_slabs(Uo_h, g)
                slb = tp.slice_slabs(Un_h, g)

                def make_backdrop(org_c, ps_c, po_c, tau):
                    rows = jnp.maximum(ps_c, 0)
                    bda = tp.make_backdrop_from_dense(
                        gpa, org_p[rows], ts, g, g, active
                    )
                    p_old = tp.assemble_padded(
                        Uo_h[rows], nbr_p[rows], bda, sla, g
                    )
                    bdb = tp.make_backdrop_from_dense(
                        gpb, org_p[rows], ts, g, g, active
                    )
                    p_new = tp.assemble_padded(
                        Un_h[rows], nbr_p[rows], bdb, slb, g
                    )
                    ppt = (1.0 - tau) * p_old + tau * p_new
                    loc = jnp.arange(ps_c.shape[0], dtype=jnp.int32)
                    return tp.make_backdrop_from_pool(
                        ppt, loc, po_c, ts, g, g, active
                    )

                Uh_new, faces_own, faces_restr, stats = (
                    pa.advance_pool_hydro_rk2_chunked(
                        U_pool[:, :nh], dt, opts, nbr, org, ps, po,
                        make_backdrop, th1, th2, chunk, with_own,
                        active_axes=active,
                    )
                )
            elif chunk:
                ppad_old, ppad_new = ctx

                def make_backdrop(org_c, ps_c, po_c, pph):
                    if parent_pool:
                        return tp.make_backdrop_from_pool(
                            pph, ps_c, po_c, ts, g, g, active
                        )
                    return tp.make_backdrop_from_dense(
                        pph, org_c, ts, g, g, active
                    )

                pp1 = (1.0 - th1) * ppad_old + th1 * ppad_new
                pp2 = (1.0 - th2) * ppad_old + th2 * ppad_new
                pp1h = pp1[:, :nh] if parent_pool else pp1[:nh]
                pp2h = pp2[:, :nh] if parent_pool else pp2[:nh]
                Uh_new, faces_own, faces_restr, stats = (
                    pa.advance_pool_hydro_rk2_chunked(
                        U_pool[:, :nh], dt, opts, nbr, org, ps, po,
                        make_backdrop, pp1h, pp2h, chunk, with_own,
                        active_axes=active,
                    )
                )
            else:
                ppad_old, ppad_new = ctx
                def backdrop(theta):
                    pp = (1.0 - theta) * ppad_old + theta * ppad_new
                    pph = pp[:, :nh] if parent_pool else pp[:nh]
                    if parent_pool:
                        return tp.make_backdrop_from_pool(
                            pph, ps, po, ts, g, g, active
                        )
                    return tp.make_backdrop_from_dense(
                        pph, org, ts, g, g, active
                    )

                def fill1(Up):
                    return tp.fill_pool_ghosts(Up, nbr, backdrop(th1), g)

                def fill2(Up):
                    return tp.fill_pool_ghosts(Up, nbr, backdrop(th2), g)

                Uh_new, stats = pa.advance_pool_hydro_rk2(
                    U_pool[:, :nh], dt, opts, fill1, fill2, nbr,
                    return_fluxes=True,
                )
                fluxes = stats.pop("fluxes")
                faces_own = pa.slice_tile_faces(fluxes, g, ts)
                faces_restr = pa.restrict_tile_faces(faces_own, active)
                if not with_own:
                    faces_own = None

            U_new = (
                jnp.concatenate([Uh_new, U_pool[:, nh:]], axis=1)
                if nh < U_pool.shape[1] else Uh_new
            )
            if strang is not None:
                U_new, ok2 = jax.vmap(lambda u: strang(u, 0.5 * dt))(U_new)
                ok = jnp.logical_and(ok, jnp.all(jnp.where(amask, ok2, True)))
            sig = jax.vmap(
                lambda u: jnp.max(euler.max_signal_speed(u, opts.eos))
            )(U_new[:, :nh])
            smax = jnp.max(jnp.where(amask, sig, 0.0))
            fin = jax.vmap(lambda u: jnp.all(jnp.isfinite(u)))(U_new)
            ok = jnp.logical_and(ok, jnp.all(jnp.where(amask, fin, True)))
            return U_new, faces_own, faces_restr, {
                "max_signal": smax, "valid": ok, **stats
            }

        jitted = jax.jit(step)
        self._pool_step_jits[key] = jitted
        return jitted

    def _pool_jit_key(self, tag: str, l: int, meta):
        """Cache key for a pool jit that CLOSES OVER `meta`'s host tables:
        keyed on the monotonic regrid epoch (id(meta) can be recycled by
        CPython), evicting this (tag, level)'s entries from earlier
        epochs so stale closures + compiled executables don't accumulate
        across regrids."""
        key = (tag, l, meta.epoch)
        if key not in self._pool_jits:
            stale = [
                k for k in self._pool_jits
                if isinstance(k, tuple) and len(k) == 3
                and k[0] == tag and k[1] == l and k[2] != meta.epoch
            ]
            for k in stale:
                del self._pool_jits[k]
        return key

    # ---- pool reflux / average-down (level l against a pool child l+1)
    def _pool_child_reflux_dense(self, l: int, corr_crse,
                                 F_fine_pool_sum: dict, dt_c: float):
        """Dense level l refluxed against a pool child: assemble the
        child's restricted tile faces into dense face arrays (transient,
        inside one program), convert to the fine-side correction, and
        apply against the eagerly-seeded coarse correction."""
        st = self.level_pool[l + 1]
        # fine_faces_to_dense closes over host metadata (tile index
        # arrays); jit per regrid epoch (keyed on meta.epoch, evicting
        # the previous epoch's entry so executables don't accumulate)
        key = self._pool_jit_key("ffd", l + 1, st.meta)
        F_fine = self._pool_jits.get(key)
        if F_fine is None:
            meta = st.meta
            ngt = tuple(self.ng)
            fn = jax.jit(lambda Fp: sp.fine_faces_to_dense(Fp, meta, ngt))
            self._pool_jits[key] = fn
            F_fine = fn
        F_fine_dense = F_fine(F_fine_pool_sum)
        mask_fine = st.coverage_dense()
        corr_f = self._reflux_corr(l, F_fine_dense, mask_fine, dt_c)
        del F_fine_dense
        self._reflux_apply(l, corr_crse, corr_f, mask_fine)

    def _pool_child_avgdown_dense(self, l: int):
        """Dense level l overwritten with restricted pool-child data."""
        st = self.level_pool[l + 1]
        key = self._pool_jit_key("avgdown_dense_parent", l, st.meta)
        if key not in self._pool_jits:
            meta = st.meta
            active = self.grid.active_axes
            opts = self.level_opts[l]
            tsc = tuple(t // 2 for t in meta.tile_shape)
            TX, TY, TZ = meta.tiles_shape
            ijk = meta.ijk[: meta.n_active]
            lin = jnp.asarray((ijk[:, 0] * TY + ijk[:, 1]) * TZ + ijk[:, 2])
            n_act = meta.n_active

            def fn(U, U_child):
                restr = jax.vmap(lambda u: ops.restrict(u, active))(
                    U_child[:n_act]
                )
                nv = U.shape[0]
                blocks = U.reshape(nv, TX, tsc[0], TY, tsc[1], TZ, tsc[2])
                blocks = jnp.moveaxis(blocks, (1, 3, 5), (0, 1, 2))
                flat = blocks.reshape(TX * TY * TZ, nv, *tsc)
                flat = flat.at[lin].set(restr)
                blocks = flat.reshape(TX, TY, TZ, nv, *tsc)
                blocks = jnp.moveaxis(blocks, (0, 1, 2), (1, 3, 5))
                U = blocks.reshape(U.shape)
                return euler.enforce_limits(
                    U, opts.eos, opts.density_floor, opts.temperature_floor,
                    opts.n_scalars,
                )

            self._pool_jits[key] = jax.jit(fn)
        self.level_U[l] = self._pool_jits[key](
            self.level_U[l], self.level_pool[l + 1].U
        )

    def _pool_child_reflux_pool(self, l: int, faces_own: dict,
                                F_fine_pool_sum: dict, dt_c: float):
        """Pool level l refluxed against its pool child."""
        st = self.level_pool[l]
        child = self.level_pool[l + 1]
        key = ("reflux_pool_parent", l)
        if key not in self._pool_jits:
            ts = self.tile_shape
            dx = self.level_opts[l].dx
            rad_fix = self._rad_fixup_pool

            def fn(U, faces_own, F_pool, child_slots, nbr, dt_c):
                F_fine = tp.assemble_children_faces(
                    F_pool, child_slots, nbr, ts
                )
                U = pa.reflux_pool_parent(
                    U, faces_own, F_fine, child_slots, nbr, dt_c, dx, ts
                )
                return rad_fix(U)

            self._pool_jits[key] = jax.jit(fn)
        # the child fluxes live on the CHILD pool; gather them onto the
        # parent's octants inside the jit via child_slots
        st.U = self._pool_jits[key](
            st.U, faces_own, F_fine_pool_sum, st.child_slots,
            st.meta.nbr_dev, jnp.asarray(dt_c, st.U.dtype),
        )

    def _rad_fixup_pool(self, U):
        if not self.layout.radiation_enabled or self._radiation is None:
            return U
        rs = self.layout.rad_start
        G = self.layout.n_groups
        floor = self._radiation.opts.erad_floor
        R = U[:, rs:].reshape(U.shape[0], G, 4, *U.shape[2:])
        R = R.at[:, :, 0].set(jnp.maximum(R[:, :, 0], floor))
        return U.at[:, rs:].set(R.reshape(U.shape[0], G * 4, *U.shape[2:]))

    def _pool_child_avgdown_pool(self, l: int):
        st = self.level_pool[l]
        child = self.level_pool[l + 1]
        key = ("avgdown_pool_parent", l)
        if key not in self._pool_jits:
            active = self.grid.active_axes
            opts = self.level_opts[l]

            def fn(U, U_child, child_slots):
                U = tp.average_down_into_pool(U, U_child, child_slots, active)
                return jax.vmap(
                    lambda u: euler.enforce_limits(
                        u, opts.eos, opts.density_floor,
                        opts.temperature_floor, opts.n_scalars,
                    )
                )(U)

            self._pool_jits[key] = jax.jit(fn)
        st.U = self._pool_jits[key](st.U, child.U, st.child_slots)

    # ------------------------------------------------- tile-pool subcycling
    def _timestep_pool(self, l: int, t_level: float, dt_l: float):
        """One substep of pool level l (the pool branch of
        `_timestep_with_subcycling`); requires `self._parent_padded_old/
        _new` (the parent's ghost-padded endpoint states) to be stashed by
        the caller."""
        if (
            l < self.max_level
            and self.level_steps[l] > 0
            and self.level_steps[l] % self.regrid_interval == 0
        ):
            self._regrid_level(l)

        from ..utils.profiler import prof

        st = self.level_pool[l]
        U_old = st.U
        dtype = U_old.dtype
        theta1 = (t_level - self._parent_t) / self._parent_dt
        theta2 = theta1 + dt_l / self._parent_dt
        nbr, org, ps, po = self._pool_pad_args(l)
        amask = self._pool_active_mask(l)
        ctx_kind, ctx_arrs = self._parent_ctx
        step = self._get_pool_step(l, with_own=l < self.finest_level,
                                   kind=ctx_kind)
        with prof.region(f"hydro_P{l}"):
            U_new, faces_own, faces_restr, stats = step(
                U_old, nbr, org, ps, po, amask, ctx_arrs,
                jnp.asarray(theta1, dtype), jnp.asarray(theta2, dtype),
                jnp.asarray(dt_l, dtype),
            )
            prof.sync(U_new)
        if hasattr(self, "_substep_valid_flags"):
            self._substep_valid_flags.append(stats["valid"])
        if "n_fofc" in stats:
            self.fofc_counts.append(stats["n_fofc"])

        if self.layout.radiation_enabled and self._radiation is not None:
            radp = self._get_pool_rad(l)
            with prof.region(f"rad_P{l}"):
                U_new, rad_own, rad_restr = radp.subcycle(
                    U_new, t_level, dt_l, nbr, org, ps, po, amask,
                    ctx_kind, ctx_arrs,
                    theta1, theta2, with_own=l < self.finest_level,
                )
                prof.sync(U_new)
            if faces_own is not None:
                faces_own = {
                    d: jnp.concatenate([faces_own[d], rad_own[d]], axis=1)
                    for d in faces_own
                }
            faces_restr = {
                d: jnp.concatenate([faces_restr[d], rad_restr[d]], axis=1)
                for d in faces_restr
            }

        st.U = U_new
        self.level_steps[l] += 1
        self.cell_updates += st.meta.active_cells
        self.cell_updates_raw += st.meta.active_cells

        if l < self.finest_level:
            th1a = jnp.asarray(theta1, dtype)
            th2a = jnp.asarray(theta2, dtype)
            if self.pool_chunk and ctx_kind == "dense":
                # lazy child context: children assemble THIS level's padded
                # tiles on demand from (our pool pair + the dense parent
                # pair) -- no full padded pool is materialized (the
                # benchmark-scale path)
                child_ctx = ("pool", (
                    U_old, U_new, nbr, org, th1a, th2a,
                    ctx_arrs[0], ctx_arrs[1],
                ))
            else:
                ppo, ppn = self._ctx_pair(l - 1, self._parent_ctx)
                pad = self._get_pool_pad(l)
                pad_old = pad(U_old, nbr, org, ps, po, ppo, ppn, th1a)
                pad_new = pad(U_new, nbr, org, ps, po, ppo, ppn, th2a)
                child_ctx = ("poolpad", (pad_old, pad_new))
            saved = (self._parent_ctx, self._parent_t, self._parent_dt)
            self._parent_ctx = child_ctx
            self._parent_t = t_level
            self._parent_dt = dt_l

            n_fine = 2 if self.do_subcycle else 1
            w = 1.0 / n_fine
            fine_sum = None
            for i in range(n_fine):
                self._timestep_pool(l + 1, t_level + i * dt_l * w, dt_l * w)
                ff = self._last_restricted_fluxes
                if fine_sum is None:
                    fine_sum = {d: w * F for d, F in ff.items()}
                else:
                    fine_sum = {d: fine_sum[d] + w * ff[d] for d in ff}

            (self._parent_ctx, self._parent_t, self._parent_dt) = saved

            if self.do_reflux:
                with prof.region(f"reflux_P{l}"):
                    self._pool_child_reflux_pool(l, faces_own, fine_sum, dt_l)
                    prof.sync(self.level_pool[l].U)
            with prof.region(f"avgdown_P{l}"):
                self._pool_child_avgdown_pool(l)
                prof.sync(self.level_pool[l].U)

        self._last_restricted_fluxes = faces_restr

    # ------------------------------------------------------------ diagnostics
    def _active_cells(self, l: int) -> int:
        """Active (mask=True) cell count at level l, cached per regrid.
        Level-l work in the FOM counts only these (reference
        ``cellUpdatesEachLevel_``, src/simulation.hpp:972-980)."""
        if l == 0:
            return self.level_grids[0].num_cells
        if self._is_pool(l):
            return self.level_pool[l].meta.active_cells
        c = self._active_cell_cache.get(l)
        if c is None:
            c = int(jnp.sum(self.level_mask[l]))
            self._active_cell_cache[l] = c
        return c

    def _composite_sums(self):
        """Conservation sums over the composite grid (finest data wins):
        mask-weighted true composite (reference `computeVolumeIntegral`
        over the uncovered cells of every level, ``src/simulation.hpp:
        848-851, 1966-1990``). Unlike a level-0-only sum (which leans on
        the average-down invariant), this also sees fine-level-only
        corruption that average-down would launder into the coarse sum."""
        finest = self.finest_level
        dense_top = min(finest, self.sparse_min_level - 1)
        if self.pool_packed and finest > dense_top:
            from . import packed_driver as pd

            total = None
            for l in range(dense_top + 1, finest + 1):
                part = pd.packed_level_sums(self, l)
                total = part if total is None else total + part
            # dense part: reuse the standard machinery with finest capped
            # (the pool child's coverage still blanks covered cells)
            # pool-top coverage over the last dense level
            st_top = self.level_pool[dense_top + 1]
            cov_top = ops.restrict_mask_any(st_top.coverage_dense(),
                                            self.grid.active_axes)
            vols = [self.level_grids[l].cell_volume()
                    for l in range(dense_top + 1)]
            dense_part = None
            for l in range(dense_top + 1):
                w = (jnp.ones(self.level_U[l].shape[1:], bool) if l == 0
                     else self.level_mask[l])
                if l == dense_top:
                    w = w & jnp.logical_not(cov_top)
                elif l < dense_top:
                    w = w & jnp.logical_not(
                        ops.restrict_mask_any(self.level_mask[l + 1],
                                              self.grid.active_axes))
                part = jnp.sum(
                    jnp.where(w[None], self.level_U[l], 0.0), axis=(1, 2, 3)
                ) * vols[l]
                dense_part = part if dense_part is None else dense_part + part
            return total + dense_part
        key = finest
        if not hasattr(self, "_compsum_jits"):
            self._compsum_jits: Dict[int, Callable] = {}
        if key not in self._compsum_jits:
            active = self.grid.active_axes
            ts = self.tile_shape
            vols = [self.level_grids[l].cell_volume() for l in range(finest + 1)]

            def compsum_fn(Us, masks, cov_pool_top, pools, pmasks, childs):
                total = None
                for l in range(dense_top + 1):
                    w = (jnp.ones(Us[l].shape[1:], bool) if l == 0
                         else masks[l])
                    if l < finest:
                        if l == dense_top:
                            covered = cov_pool_top  # pool child's coverage
                        else:
                            covered = ops.restrict_mask_any(masks[l + 1], active)
                        w = w & jnp.logical_not(covered)
                    part = jnp.sum(
                        jnp.where(w[None], Us[l], 0.0), axis=(1, 2, 3)
                    ) * vols[l]
                    total = part if total is None else total + part
                for i, l in enumerate(range(dense_top + 1, finest + 1)):
                    cov = tp.coverage_cells(childs[i], ts)
                    w = pmasks[i][:, None, None, None] & ~cov
                    part = jnp.sum(
                        jnp.where(w[:, None], pools[i], 0.0),
                        axis=(0, 2, 3, 4),
                    ) * vols[l]
                    total = part if total is None else total + part
                return total

            self._compsum_jits[key] = jax.jit(compsum_fn)
        pool_lvls = list(range(dense_top + 1, finest + 1))
        cov_top = None
        if pool_lvls:
            st_top = self.level_pool[pool_lvls[0]]
            cov_top = ops.restrict_mask_any(st_top.coverage_dense(),
                                            self.grid.active_axes)
        childs = []
        for l in pool_lvls:
            st = self.level_pool[l]
            childs.append(st.child_slots if st.child_slots is not None
                          else st.no_children())
        return self._compsum_jits[key](
            tuple(self.level_U[: dense_top + 1]),
            tuple(self.level_mask[: dense_top + 1]),
            cov_top,
            tuple(self.level_pool[l].U for l in pool_lvls),
            tuple(self._pool_active_mask(l) for l in pool_lvls),
            tuple(childs),
        )

    def _conservation_audit(self):
        final = np.asarray(self._composite_sums())
        init = self.init_sums
        self.conservation_abs_err = final - init
        with np.errstate(divide="ignore", invalid="ignore"):
            self.conservation_rel_err = np.where(init != 0, (final - init) / init, np.nan)
        if self.verbose:
            print(f"conservation rel err: {self.conservation_rel_err}")
