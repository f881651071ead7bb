"""The simulation driver: state ownership, evolve loop, timestep control.

TPU-native rebuild of `AMRSimulation` + `QuokkaSimulation` (reference
``src/simulation.hpp:141`` and ``src/QuokkaSimulation.hpp:64``): owns the
level state, the `evolve()` loop, CFL timestep computation with the dt
change limiter, the hydro retry ladder, radiation subcycling, conservation
audit, the performance figure-of-merit, plotfile/checkpoint output, and the
L1 error-norm self-check against a problem's reference solution.

Host Python orchestrates only O(steps * levels) control flow, exactly as the
reference's host C++ does; everything per-cell is inside a single jitted
step function per level (shard_mapped over the device mesh when multi-chip).
"""

from __future__ import annotations

import time as _time
from functools import partial
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .boundaries import fill_ghosts
from .config import ParmParse
from .eos import IdealGasEOS
from .grid import Grid
from .hydro import advance as hydro_advance
from .hydro import euler
from .hydro.advance import HydroOptions
from .indices import EGAS, EINT, MX1, RHO, SCALAR0
from .registry import Problem
from .stencil import ghost_widths


class Simulation:
    """Single-level (unigrid) simulation driver.

    AMR (multi-level state, regridding, subcycling, refluxing) extends this
    class; the unigrid path is also the per-level building block there.
    """

    def __init__(self, problem: Problem, pp: Optional[ParmParse] = None, *,
                 decomp=None, precision: str | None = None):
        self.problem = problem
        self.pp = pp or ParmParse()

        # ---- geometry (reference: amr.n_cell / geometry.* ParmParse keys)
        n_cell = self.pp.get_list("amr.n_cell", [64, 1, 1])
        while len(n_cell) < 3:
            n_cell.append(1)
        prob_lo = self.pp.get_list("geometry.prob_lo", [0.0, 0.0, 0.0])
        prob_hi = self.pp.get_list("geometry.prob_hi", [1.0, 1.0, 1.0])
        while len(prob_lo) < 3:
            prob_lo.append(0.0)
        while len(prob_hi) < 3:
            prob_hi.append(1.0)
        self.grid = Grid(tuple(n_cell), tuple(prob_lo), tuple(prob_hi))

        # ---- precision policy
        prec = precision or self.pp.get_str("precision", "double")
        self.dtype = jnp.float64 if prec == "double" else jnp.float32

        # ---- runtime knobs (defaults mirror the reference's readParameters,
        # src/simulation.hpp:541-636, and readParmParse, QuokkaSimulation.hpp:340-396)
        self.cfl = self.pp.get_float("cfl", 0.3)
        self.stop_time = self.pp.get_float("stop_time", 1.0)
        self.max_timesteps = self.pp.get_int("max_timesteps", 10000)
        self.init_dt = self.pp.get_float("init_dt", 1.0e30)
        self.max_dt = self.pp.get_float("max_dt", 1.0e30)
        self.constant_dt = self.pp.get_float("constant_dt", -1.0)
        self.plotfile_interval = self.pp.get_int("plotfile_interval", -1)
        self.checkpoint_interval = self.pp.get_int("checkpoint_interval", -1)
        self.projection_interval = self.pp.get_int("projection_interval", -1)
        self.projection_dirs = [
            str(d) for d in self.pp.get_list("projection.dirs", [])
        ]
        self.statistics_interval = self.pp.get_int("statistics_interval", -1)
        self.derived_vars = [str(v) for v in self.pp.get_list("derived_vars", [])]
        # max_walltime "HH:MM:SS"; stop at 90% like the reference
        # (src/simulation.hpp:618-629, 948-951)
        wt = self.pp.get_str("max_walltime", "")
        self.max_walltime = None
        if wt:
            h, m, s = (int(p) for p in wt.split(":"))
            self.max_walltime = 3600 * h + 60 * m + s
        self.verbose = self.pp.get_int("verbose", 1)
        # debug.check_states: validate the state after every step and fail
        # loudly with the first offending cell (the reference's
        # CHECK_HYDRO_STATES / AMREX_ASSERT debug build, checked in
        # computeTimestep; here a runtime switch)
        self.check_states = bool(self.pp.get_int("debug.check_states", 0))
        self.metadata = {}

        hpp = self.pp
        self.layout = problem.physics.layout()
        self.eos: IdealGasEOS = problem.make_eos()

        # chemistry-coupled hydro EOS (reference ``src/hydro/EOS.hpp:82-112``:
        # with the network compiled in, EVERY hydro EOS call -- pressure,
        # sound speed, Riemann interface states -- sees the composition):
        # wrap the trait EOS so the hydro kernels derive the per-cell
        # effective gamma from the advected species partial densities.
        # `hydro.chem_eos = 0` restores fixed-trait behavior.
        if (
            bool(hpp.get_int("chemistry.enabled", 0))
            and bool(hpp.get_int("hydro.chem_eos", 1))
            and getattr(problem, "chemistry_network", None) is not None
        ):
            import dataclasses as _dc

            from .microphysics.chem_coupling import MixtureHydroEOS

            self.eos = MixtureHydroEOS(
                network=problem.chemistry_network,
                **{f.name: getattr(self.eos, f.name)
                   for f in _dc.fields(IdealGasEOS)},
            )

        ng = 4  # nghost_cc: PPM + flattening (reference src/simulation.hpp:363)
        self.ng = ghost_widths(self.grid, ng)
        self.periodic = tuple(problem.bcs.is_periodic(d) for d in range(3))

        self.hydro_opts = HydroOptions(
            eos=self.eos,
            active_axes=self.grid.active_axes,
            dx=self.grid.dx,
            nghost=ng,
            reconstruction_order=hpp.get_int("hydro.reconstruction_order", 3),
            use_flattening=bool(hpp.get_int("hydro.use_flattening", 1)),
            reconstruct_eint=problem.hydro.reconstruct_eint,
            riemann="hllc",
            K_visc=hpp.get_float("hydro.artificial_viscosity_coefficient", 0.0),
            n_scalars=problem.physics.n_scalars,
            n_mscalars=problem.physics.n_mscalars,
            density_floor=hpp.get_float("density_floor", 0.0),
            temperature_floor=hpp.get_float("temperature_floor", 0.0),
            use_dual_energy=bool(hpp.get_int("hydro.use_dual_energy", 1)),
            rk_order=hpp.get_int("hydro.rk_integrator_order", 2),
            # fused Pallas sweep kernels: default on for TPU backends, off on
            # CPU (where Pallas would run interpreted); forced off under the
            # chemistry-coupled mixture EOS (the sweep kernels hard-code the
            # trait gamma)
            use_pallas=bool(
                hpp.get_int(
                    "hydro.use_pallas",
                    0 if jax.default_backend() == "cpu" else 1,
                )
            ) and not hasattr(self.eos, "gamma_of_scalars"),
            # kernel-fused divergence update (pointwise common-path RK
            # apply). Identical numerics up to XLA FMA contraction -- the
            # same reassociation freedom the reference forfeits by
            # compiling with DISABLE_FMAD (CMakeLists.txt:31); we keep the
            # contraction (it is free VPU throughput) and validate the
            # fused-vs-classic agreement at ulp tolerance instead
            # (tests/test_fused_update.py).
            fuse_update=bool(hpp.get_int("hydro.fuse_update", 1)),
        )

        # ---- domain decomposition over the device mesh (multi-chip)
        if decomp == "auto":
            from .parallel.decomp import make_decomposition

            decomp = make_decomposition(self.grid.n_cell)
        self.decomp = decomp

        # ---- code units (TPU-first addition; no reference analog).  The
        # TPU f64 emulation is a float32 pair with the *f32 exponent range*
        # (~3.4e38), so raw-CGS self-gravity problems (cell volumes ~1e51
        # cm^3, PopIII scales) overflow on-chip.  `units.{density,length,
        # time}` give the CGS value of one code unit; the solver runs
        # unit-agnostic in code units while the CGS microphysics (cooling
        # tables, chemistry rate fits) are fed CGS values by scaling the
        # state around the Strang step.  Defaults come from the problem's
        # `units` attribute (rho0, L0, t0), overridable per deck.
        u_def = getattr(problem, "units", (1.0, 1.0, 1.0))
        self.units = (
            self.pp.get_float("units.density", u_def[0]),
            self.pp.get_float("units.length", u_def[1]),
            self.pp.get_float("units.time", u_def[2]),
        )
        self._units_nontrivial = any(u != 1.0 for u in self.units)
        if self._units_nontrivial and problem.physics.radiation_enabled:
            raise ValueError(
                "units.* scaling currently supports hydro(+gravity+chem) "
                "states only, not radiation"
            )

        # ---- gravity (reference: doPoissonSolve_ + gravity.Gconst).  In
        # code units the default G is G_cgs rho0 t0^2 (dimensionless form
        # of 4 pi G rho).
        self.gravity_enabled = problem.physics.gravity_enabled
        g_default = 6.674e-8 * self.units[0] * self.units[2] ** 2
        self.Gconst = self.pp.get_float("gravity.Gconst", g_default)
        self.gravity_bc = self.pp.get_str("gravity.bc", "open")
        self.particles = None
        self.tracers = None
        self._greens_fft = None

        # ---- dynamic state
        self.U: Optional[jnp.ndarray] = None
        self.t = 0.0
        self.dt_prev = float("inf")
        self.istep = 0
        self.cell_updates = 0
        # raw advanced-cell work (AMR's dense levels also advance unrefined
        # backdrop cells; cell_updates counts active cells only)
        self.cell_updates_raw = 0
        # per-substep FOFC redo-cell counts (device scalars, appended by the
        # pool/packed level steps without a host sync; `sum(int(c) for c in
        # sim.fofc_counts)` on demand -- the reference prints the analogous
        # redoFlag count per step at verbose>=2)
        self.fofc_counts: list = []
        self.error_norm = float("nan")
        self.init_sums: Optional[np.ndarray] = None
        self._radiation = None  # attached lazily when radiation is enabled

        self._build_compiled()

    # ------------------------------------------------------------- compiled fns
    def _ghost_free_config(self):
        """Stepping-mode selection for the hydro advance: None = classic
        ghost-padded fill; otherwise a dict with

          ng:        per-axis ghost widths actually padded (only axes that
                     truly need a fill: halo-exchanged sharded axes and
                     BC_USER/NSCBC hook axes),
          bc_kinds:  {axis: (lo,hi)|None} -- wall axes the Pallas sweep
                     kernels assemble in VMEM; None = roll wrap (periodic)
                     or a padded axis.

        The LANE (z) axis is never padded: padding it is the one layout
        change the TPU punishes (~1.6x HBM bandwidth -- 264 lanes tile to
        384), so z walls must be kernel-assemblable (periodic / reflect /
        outflow) and z must be unsharded, else the classic path is used.
        x/y padding costs only sublane-alignment-friendly copies."""
        from .registry import BC_OUTFLOW, BC_PERIODIC, BC_REFLECT

        opts = self.hydro_opts
        from .hydro.advance import _PALLAS_MAX_DIM

        # per-shard interior extents are what the sweep kernels see
        tiles0 = self.decomp.tiles if self.decomp is not None else (1, 1, 1)
        local_max = max(
            n // t for n, t in zip(self.grid.n_cell, tiles0)
        )
        # above the classic kernels' VMEM ceiling the LEAN divergence mode
        # (sweep-chunked, div-only kernels) carries ghost-free stepping to
        # 512^3-class extents -- and staying unpadded there is what keeps
        # the working set inside HBM
        import os as _os

        _lean_ok = (
            opts.fuse_update
            and opts.rk_order == 2
            and _os.environ.get("QUOKKA_PALLAS_LEAN", "auto") != "0"
        )
        max_ext = (
            int(_os.environ.get("QUOKKA_PALLAS_LEAN_MAX_DIM", "1088"))
            if _lean_ok else _PALLAS_MAX_DIM
        )
        from .hydro.advance import _pallas_shape_ok

        local_shape = tuple(
            n // t for n, t in zip(self.grid.n_cell, tiles0)
        )
        if (
            self.dtype != jnp.float32
            or not opts.use_pallas
            or len(opts.active_axes) != 3
            or int(self.pp.get_int("hydro.ghost_free", 1)) == 0
            or local_max > max_ext  # VMEM ceiling: XLA path instead
            or not _pallas_shape_ok(local_shape)  # fat whole-z blocks
        ):
            return None
        allowed = (BC_PERIODIC, BC_REFLECT, BC_OUTFLOW)
        tiles = self.decomp.tiles if self.decomp is not None else (1, 1, 1)

        z_lo, z_hi = self.problem.bcs.axis(2)
        if tiles[2] != 1 or z_lo not in allowed or z_hi not in allowed:
            return None

        ng = [0, 0, 0]
        kinds = {}
        for d in opts.active_axes:
            lo, hi = self.problem.bcs.axis(d)
            if tiles[d] > 1 or (lo not in allowed or hi not in allowed):
                # halo-exchanged or hook-filled axis: conventional padding
                ng[d] = self.ng[d]
                kinds[d] = None
            else:
                kinds[d] = None if self.periodic[d] else (lo, hi)
        return {"ng": tuple(ng), "bc_kinds": kinds}

    def _fill(self, U, time=0.0):
        return fill_ghosts(
            U, self.ng, self.problem.bcs, self.layout,
            problem=self.problem, grid=self.grid, time=time,
        )

    def _build_compiled(self):
        opts = self.hydro_opts
        ng = self.ng
        periodic = self.periodic

        # Strang-split builtin sources (reference
        # `addStrangSplitSourcesWithBuiltin`, QuokkaSimulation.hpp:520-580):
        # half-dt cooling/chemistry (+ user sources) before and after the
        # hydro update; per-cell pointwise, so it runs unchanged inside
        # shard_map on the multi-chip path
        cooling_on = bool(self.pp.get_int("cooling.enabled", 0))
        # cooling.cooling_table_type (reference QuokkaSimulation.hpp:524-531):
        #   "" (problem-provided Lambda(T) curve), "grackle", or
        #   "cloudy_cooling_tools" (real table files via cooling.table_file)
        cooling_type = self.pp.get_str("cooling.cooling_table_type", "")
        cooling_tables2d = getattr(self.problem, "cooling_tables2d", None)
        if cooling_on and cooling_type:
            from .microphysics import tables as _ctab

            if cooling_tables2d is None:
                tfile = self.pp.get_str("cooling.table_file", "")
                if not tfile:
                    raise ValueError(
                        "cooling.cooling_table_type set but no cooling.table_file "
                        "given and the problem provides no cooling_tables2d"
                    )
                if cooling_type == "grackle":
                    cooling_tables2d = _ctab.read_grackle_tables(tfile)
                elif cooling_type == "cloudy_cooling_tools":
                    cooling_tables2d = _ctab.read_cloudy_tables(tfile)
                else:
                    raise ValueError(
                        f"invalid cooling.cooling_table_type '{cooling_type}'"
                    )
        cooling_table = getattr(self.problem, "cooling_table", None)
        if cooling_on and cooling_table is None and cooling_tables2d is None:
            raise ValueError("cooling.enabled=1 but problem defines no cooling_table")
        T_floor_cool = self.pp.get_float("cooling.T_floor", 2.73)

        # chemistry (reference: chemistry.enabled + computeChemistry inside
        # addStrangSplitSourcesWithBuiltin, QuokkaSimulation.hpp:520-563)
        chem_on = bool(self.pp.get_int("chemistry.enabled", 0))
        chem_network = getattr(self.problem, "chemistry_network", None)
        if chem_on and chem_network is None:
            raise ValueError("chemistry.enabled=1 but problem defines no chemistry_network")
        if chem_on and self.problem.physics.n_mscalars < getattr(chem_network, "n_species", 0):
            raise ValueError(
                "chemistry needs n_mscalars >= network.n_species "
                f"({self.problem.physics.n_mscalars} < {chem_network.n_species})"
            )
        chem_min_density = self.pp.get_float("chemistry.min_density_allowed", 0.0)
        self.chem_enabled = chem_on

        # state-component CGS scaling factors for the code-units mode: the
        # cooling/chemistry microphysics consume CGS (cm^-3, K, erg) values,
        # so the Strang step sees U * fac (CGS) and returns U / fac
        u_rho, u_len, u_t = self.units
        u_v = u_len / u_t
        if self._units_nontrivial and (cooling_on or chem_on):
            fac = np.ones(self.layout.nvar)
            fac[RHO] = u_rho
            fac[MX1:MX1 + 3] = u_rho * u_v
            fac[EGAS] = fac[EINT] = u_rho * u_v * u_v
            fac[SCALAR0:] = u_rho  # (partial) densities
            self._cgs_fac = jnp.asarray(fac).reshape(-1, 1, 1, 1)
        else:
            self._cgs_fac = None
        cgs_fac = self._cgs_fac

        def strang(U, half_dt):
            """Strang-split builtin sources; returns (U, ok) where ok feeds
            the retry ladder (reference burn_success contract)."""
            if cgs_fac is not None:
                fc = cgs_fac.astype(U.dtype)
                U_c, ok = strang_cgs(U * fc, half_dt * u_t)
                return U_c / fc, ok
            return strang_cgs(U, half_dt)

        def strang_cgs(U, half_dt):
            ok = jnp.asarray(True)
            if cooling_on and cooling_tables2d is not None:
                from .microphysics.tables import strang_cooling_step_tabulated

                U, ok_c = strang_cooling_step_tabulated(
                    U, half_dt, self.problem.eos_traits.gamma, cooling_tables2d,
                    T_floor=T_floor_cool,
                )
                ok = jnp.logical_and(ok, ok_c)
            elif cooling_on:
                from .microphysics.cooling import strang_cooling_step

                U, ok_c = strang_cooling_step(
                    U, half_dt, self.eos, cooling_table,
                    mean_mol_weight=self.problem.eos_traits.mean_molecular_weight,
                    T_floor=T_floor_cool,
                )
                ok = jnp.logical_and(ok, ok_c)
            if chem_on:
                from .microphysics.chem_coupling import ChemEOS, strang_chemistry_step

                U, ok_b = strang_chemistry_step(
                    U, half_dt, chem_network, ChemEOS(network=chem_network),
                    n_mscalars=chem_network.n_species,
                    min_density=chem_min_density,
                )
                ok = jnp.logical_and(ok, ok_b)
            return U, ok

        self._strang = strang
        self._strang_active = cooling_on or chem_on

        if self.decomp is not None:
            from .parallel.sharded import build_sharded_step

            self._step_jit = build_sharded_step(
                opts, self.decomp, ng, periodic, self.problem.bcs, self.layout,
                self.problem, self.grid, strang=strang,
                ghost_free=self._ghost_free_config(),
            )
        else:
            # the hydro advance operates on the hydro block only; radiation
            # components are evolved solely by the radiation subsystem
            # (reference: hydro fluxes cover ncompHydro_ components,
            # QuokkaSimulation.hpp:1104)
            nh = self.layout.nvar_hydro
            if self.layout.radiation_enabled:
                from .indices import StateLayout

                layout_h = StateLayout(
                    hydro_enabled=True, radiation_enabled=False,
                    n_scalars=self.layout.n_scalars,
                    n_mscalars=self.layout.n_mscalars,
                )

                def fill_h(X):
                    return fill_ghosts(
                        X, self.ng, self.problem.bcs, layout_h,
                        problem=self.problem, grid=self.grid,
                    )
            else:
                fill_h = self._fill

            # fully periodic domains need NO ghost padding at all: every
            # stencil operator is a roll (`stencil.sh`), and a roll's wrap IS
            # the periodic boundary.  Skipping the fill keeps every array at
            # its natural lane-aligned size (256 vs 264 on the 256^3 bench --
            # the padded layout is not a multiple of the 128-lane TPU tile
            # and measurably degrades the bandwidth of every op that touches
            # it: 158.6 -> 100.2 ms/step at 256^3 f32, bitwise identical).
            # The radiation transport fast path has done this since round 1.
            #
            # Reflecting/outflow walls get the same treatment through the
            # GHOST-FREE path: wall ghosts are local transforms of the
            # interior (mirror / edge copy), so the Pallas sweep kernels
            # assemble them in VMEM from their own block edges and return
            # the hi-wall face fluxes as separate planes; the few prologue
            # stencils are wall-corrected with fused masked reads
            # (stencil.sh_bc). Hook-filled (BC_USER/NSCBC) x/y axes are
            # still padded -- only the lane axis must stay unpadded.
            ng_h = ng
            bc_kinds_h = None
            gf = self._ghost_free_config()
            if all(periodic):
                fill_h = lambda X: X
                ng_h = (0, 0, 0)
            elif gf is not None:
                ng_h = gf["ng"]
                bc_kinds_h = gf["bc_kinds"]
                if all(g == 0 for g in ng_h):
                    fill_h = lambda X: X
                else:
                    lay_h = layout_h if self.layout.radiation_enabled else self.layout
                    fill_h = lambda X: fill_ghosts(
                        X, ng_h, self.problem.bcs, lay_h,
                        problem=self.problem, grid=self.grid,
                    )

            def step(U, dt):
                U, ok1 = strang(U, 0.5 * dt)
                Uh = U[:nh]
                Uh_new, stats = hydro_advance.advance_hydro_rk2(
                    Uh, dt, opts, fill_h, ng_h, periodic, bc_kinds=bc_kinds_h
                )
                if nh < U.shape[0]:
                    U_new = jnp.concatenate([Uh_new, U[nh:]], axis=0)
                else:
                    U_new = Uh_new
                U_new, ok2 = strang(U_new, 0.5 * dt)
                # post-step CFL / validity diagnostics (reference isCflViolated,
                # src/QuokkaSimulation.hpp:992-1013); a failed Strang burn also
                # triggers the retry ladder (reference burn_success contract)
                smax = jnp.max(euler.max_signal_speed(U_new, opts.eos))
                all_valid = jnp.all(euler.is_state_valid(U_new, opts.eos))
                all_valid = jnp.logical_and(all_valid, jnp.logical_and(ok1, ok2))
                return U_new, {"max_signal": smax, "valid": all_valid, **stats}

            self._step_jit = jax.jit(step)

        def max_signal(U):
            return jnp.max(euler.max_signal_speed(U, self.eos))

        self._max_signal_jit = jax.jit(max_signal)

        # ---- fused multi-step window: runs K coarse steps in ONE device
        # program (timestep computation + step + validity check all
        # on-device), so the host syncs once per window instead of once per
        # step.  This is the production-loop analog of the async benchmark
        # loop: the per-step host round-trip (stats["valid"]/max_signal
        # pulls) otherwise serializes dispatch on TPU.  On failure anywhere
        # in the window the host rolls back and replays the window step by
        # step through the retry ladder.
        step_fn = self._step_jit
        eos = self.eos
        cfl = self.cfl
        dx_min = self.grid.dx_min
        max_dt = self.max_dt

        @partial(jax.jit, static_argnums=2)
        def fused_window(U, dt_prev, K):
            from jax import lax

            def body(carry, _):
                U, dt_prev, ok = carry
                smax = jnp.max(euler.max_signal_speed(U, eos))
                dt = jnp.minimum(cfl * dx_min / smax,
                                 jnp.minimum(1.1 * dt_prev, max_dt))
                U2, stats = step_fn(U, dt)
                dt_cfl = cfl * dx_min / stats["max_signal"]
                ok_step = jnp.logical_and(stats["valid"], dt <= 1.1 * dt_cfl)
                # once a step fails, freeze the carry; the host discards the
                # whole window and replays it through the retry ladder
                U2 = jnp.where(ok, U2, U)
                dt_prev_new = jnp.where(ok, dt, dt_prev)
                return (U2, dt_prev_new, jnp.logical_and(ok, ok_step)), \
                    jnp.where(ok, dt, 0.0)

            (Uf, dtp, ok), dts = lax.scan(
                body, (U, dt_prev, jnp.asarray(True)), None, length=K
            )
            return Uf, dtp, ok, dts

        self._fused_window_jit = fused_window

        def sums(U):
            return jnp.sum(U, axis=(1, 2, 3)) * self.grid.cell_volume()

        self._sums_jit = jax.jit(sums)

    # ------------------------------------------------------------------- setup
    def set_initial_conditions(self):
        tr = self.problem.create_initial_tracer_particles(self.grid)
        if tr is not None:
            from .particles.cic import ParticleData

            tr = jnp.asarray(tr, dtype=self.dtype)
            self.tracers = ParticleData(
                tr, jnp.zeros_like(tr), jnp.zeros(tr.shape[0], dtype=self.dtype)
            )
        else:
            self.tracers = None

        # run the IC under jit so XLA fuses the problem's (f64, x64 is on
        # globally) intermediates into the final-dtype write: at 512^3 the
        # eager path materializes ~7 full f64 arrays (~10 GB) before the
        # f32 cast. Host-side (numpy) ICs trace as embedded constants;
        # anything untraceable falls back to the eager path.
        def _ic():
            return jnp.asarray(
                self.problem.set_initial_conditions(self.grid),
                dtype=self.dtype,
            )

        try:
            U = jax.jit(_ic)()
        except (jax.errors.JAXTypeError, jax.errors.JAXIndexError,
                TypeError) as e:
            # untraceable IC (host-side control flow / numpy mutation):
            # run it eagerly. Anything else (a genuinely broken IC) must
            # surface -- the eager retry would execute the failure twice
            # and at 512^3-class extents double peak memory.
            if self.verbose:
                print(f"IC not jittable ({type(e).__name__}); running eagerly")
            U = _ic()
        expected = (self.layout.nvar, *self.grid.n_cell)
        if U.shape != expected:
            raise ValueError(f"IC shape {U.shape} != expected {expected}")

        # face-centered state (MHD-ready bookkeeping; reference
        # state_new_fc_ per level, src/simulation.hpp:345-348). No induction
        # update exists yet -- stub-level parity with the reference's MHD.
        fc = self.problem.set_initial_conditions_fc(self.grid)
        if fc is not None:
            self.U_fc = [jnp.asarray(a, dtype=self.dtype) for a in fc]
            for d, a in enumerate(self.U_fc):
                want = list(self.grid.n_cell)
                want[d] += 1
                if tuple(a.shape[1:]) != tuple(want):
                    raise ValueError(
                        f"fc IC axis {d}: spatial shape {a.shape[1:]} != "
                        f"staggered {tuple(want)}"
                    )
        else:
            self.U_fc = None
        if self.decomp is not None:
            U = jax.device_put(U, self.decomp.state_sharding())
        self.U = U
        self.init_sums = np.asarray(self._sums_jit(U))
        if self.layout.radiation_enabled:
            self._attach_radiation()
        if self.gravity_enabled:
            self._setup_gravity()

        # restart from a checkpoint (reference: `restartfile=` ParmParse key,
        # src/simulation.hpp:638-660 + ReadCheckpointFile :2676) -- derived
        # structures are built from the deck as usual, then the dynamic state
        # is replaced wholesale by the checkpoint contents
        restart = self.pp.get_str("restartfile", "")
        if restart:
            import os as _os

            from .io.checkpoint import read_checkpoint

            if _os.path.islink(restart):
                restart = _os.path.join(_os.path.dirname(restart), _os.readlink(restart))
            read_checkpoint(self, restart)

        # static external acceleration (problem hook): operator-split kick
        g_ext = self.problem.external_acceleration(self.grid)
        self._g_ext = None
        if g_ext is not None:
            g_ext = jnp.asarray(g_ext, self.dtype)

            def ext_kick(U, dt):
                from .indices import EGAS, MX1, RHO

                rho = U[RHO]
                mom_old = U[MX1:MX1 + 3]
                mom_new = mom_old + dt * rho[None] * g_ext
                dE = 0.5 * dt * jnp.sum(g_ext * (mom_old + mom_new), axis=0)
                U = U.at[MX1:MX1 + 3].set(mom_new)
                return U.at[EGAS].add(dE)

            self._g_ext = jax.jit(ext_kick)

    def _attach_radiation(self):
        from .radiation.advance import RadiationAdvance

        self._radiation = RadiationAdvance(self)
        if self.layout.hydro_enabled:
            self._build_fused_radhydro_window()

    def _build_fused_radhydro_window(self):
        """Fused multi-step window for radhydro: K coarse steps, each = on-
        device dt (CFL + substep cap), hydro advance, and the radiation
        subcycle with a DEVICE-SIDE substep count (`lax.fori_loop` with a
        dynamic trip count, capped at max_substeps+1 exactly like the host
        `n_substeps`). One host sync per window instead of one per coarse
        step, so production `evolve()` radhydro throughput matches the bench
        loop (the hydro-only window has done this since round 2; reference
        measures its FOM on the real loop, simulation.hpp:972-980)."""
        from jax import lax

        rad = self._radiation
        step_fn = self._step_jit
        substep_fn = rad._substep_jit
        ropts = rad.opts
        eos = self.eos
        cfl = self.cfl
        dx_min = self.grid.dx_min
        max_dt = self.max_dt
        dt_rad_unit = ropts.cfl * dx_min / ropts.chat
        nsub_cap = ropts.max_substeps
        # same association as compute_timestep's host expression so the
        # capped dt is bit-identical to the per-step loop
        dt_cap = ropts.max_substeps * ropts.cfl * dx_min / ropts.chat

        @partial(jax.jit, static_argnums=3)
        def fused_window_rad(U, dt_prev, t0, K):
            def body(carry, _):
                U, dt_prev, t, ok = carry
                smax = jnp.max(euler.max_signal_speed(U, eos))
                dt = jnp.minimum(cfl * dx_min / smax,
                                 jnp.minimum(1.1 * dt_prev, max_dt))
                # radhydro substep cap (mirrors compute_timestep)
                dt = jnp.minimum(dt, dt_cap)
                U2, stats = step_fn(U, dt)
                dt_cfl = cfl * dx_min / stats["max_signal"]
                ok_step = jnp.logical_and(stats["valid"], dt <= 1.1 * dt_cfl)
                # radiation subcycle with on-device substep count (host
                # formula: max(1, ceil(dt / (cfl_rad dx_min / chat))))
                nsub = jnp.maximum(
                    jnp.ceil(dt / dt_rad_unit).astype(jnp.int32), 1)
                ok_step = jnp.logical_and(ok_step, nsub <= nsub_cap + 1)
                nsub = jnp.clip(nsub, 1, nsub_cap + 1)
                dt_r = dt / nsub.astype(dt.dtype)

                def sub_body(i, Us):
                    Un, _st = substep_fn(
                        Us, t + i.astype(dt.dtype) * dt_r, dt_r)
                    return Un

                U3 = lax.fori_loop(0, nsub, sub_body, U2)
                # once a step fails, freeze the carry; the host discards the
                # window and replays it through the retry ladder
                U3 = jnp.where(ok, U3, U)
                dt_prev_new = jnp.where(ok, dt, dt_prev)
                t_new = jnp.where(ok, t + dt, t)
                return (U3, dt_prev_new, t_new,
                        jnp.logical_and(ok, ok_step)), jnp.where(ok, dt, 0.0)

            (Uf, dtp, _tf, ok), dts = lax.scan(
                body, (U, dt_prev, t0, jnp.asarray(True)), None, length=K
            )
            return Uf, dtp, ok, dts

        self._fused_window_rad_jit = fused_window_rad

    # ---------------------------------------------------------------- gravity
    def _setup_gravity(self):
        """Poisson solver setup + initial solve (reference
        `calculateGpotAllLevels` at setInitialConditions)."""
        from .gravity import poisson as pg

        self.particles = self.problem.create_initial_particles(self.grid)

        if self.gravity_bc == "open":
            # kernel built at the FFT dtype (TPU backends have no complex128)
            fdt = pg._fft_real_dtype(self.dtype)
            Gk = pg.greens_function_kernel(self.grid.n_cell, self.grid.dx, fdt)
            self._greens_fft = jnp.fft.rfftn(Gk)

        # NB: the Green's-function FFT is passed as an ARGUMENT, not closed
        # over -- a closure would embed it as a compiled constant, which
        # materializes the device array to host (complex transfers are
        # unimplemented on some TPU attachment backends)
        def solve_phi_open(U, particle_rhs, greens):
            rhs = 4.0 * jnp.pi * self.Gconst * U[RHO] + particle_rhs
            return pg.solve_poisson_open(rhs, self.grid.dx, greens)

        def solve_phi_periodic(U, particle_rhs):
            rhs = 4.0 * jnp.pi * self.Gconst * U[RHO] + particle_rhs
            return pg.solve_poisson_periodic(rhs, self.grid.dx)

        if self.gravity_bc == "open":
            _open_jit = jax.jit(solve_phi_open)
            self._solve_phi_jit = lambda U, prhs: _open_jit(U, prhs, self._greens_fft)
        else:
            self._solve_phi_jit = jax.jit(solve_phi_periodic)
        self._gravity_kick_jit = jax.jit(
            lambda U, phi, dt: pg.apply_gravity_kick(U, phi, self.grid.dx, dt)
        )
        self.phi = self._solve_phi_jit(self.U, self._particle_rhs())

    def _particle_rhs(self):
        from .particles import cic

        if self.particles is None:
            return jnp.zeros(self.grid.n_cell, dtype=self.dtype)
        return cic.cic_deposit(self.particles, self.grid, 4.0 * jnp.pi * self.Gconst)

    def _particle_accel(self):
        from .gravity import poisson as pg
        from .particles import cic

        g3 = pg.gravity_accel(self.phi, self.grid.dx)
        return cic.cic_gather(g3, self.particles, self.grid)

    def _gravity_after_step(self, dt: float):
        """Post-step elliptic solve + operator-split kick (reference
        `ellipticSolveAllLevels`, ``src/simulation.hpp:1086-1096``)."""
        from .particles import cic

        if self.particles is not None:
            self.particles = cic.drift(self.particles, dt, self.grid, self.periodic)
        self.phi = self._solve_phi_jit(self.U, self._particle_rhs())
        self.U = self._gravity_kick_jit(self.U, self.phi, dt)
        if self.particles is not None:
            self.particles = cic.kick(self.particles, self._particle_accel(), 0.5 * dt)

    def _gravity_before_step(self, dt: float):
        """First particle kick of the leapfrog (reference
        `kickParticlesAllLevels` before timeStepWithSubcycling)."""
        from .particles import cic

        if self.particles is not None:
            self.particles = cic.kick(self.particles, self._particle_accel(), 0.5 * dt)

    # ---------------------------------------------------------------- timestep
    def compute_timestep(self) -> float:
        if self.constant_dt > 0.0:
            dt = self.constant_dt
        else:
            if not self.layout.hydro_enabled and self.layout.radiation_enabled:
                # radiation-only: signal speed is the reduced speed of light,
                # and the coarse step is limited by the GLOBAL `cfl` (the
                # reference's cflNumber_, default 0.3) -- radiationCflNumber_
                # only sets the subcycle count (reference
                # computeMaxSignalLocal QuokkaSimulation.hpp:408-430 +
                # computeNumberOfRadiationSubsteps :397-406)
                smax = self.problem.rad.c_hat
            else:
                smax = float(self._max_signal_jit(self.U))
            dt = self.cfl * self.grid.dx_min / smax
            if self.layout.radiation_enabled and self._radiation is not None:
                # radhydro: cap dt so the radiation subcycle count stays
                # within max_substeps (reference ``:424-434``); the count is
                # taken at the RADIATION cfl, so the cap must use it too
                ropts = self._radiation.opts
                dt = min(dt, ropts.max_substeps * ropts.cfl
                         * self.grid.dx_min / ropts.chat)
            dt = min(dt, 1.1 * self.dt_prev)  # change_max limiter
            dt = min(dt, self.max_dt)
            if self.t == 0.0:
                dt = min(dt, self.init_dt)
        # avoid overshooting stop_time (reference src/simulation.hpp:805-809)
        eps = 1.0e-3 * dt
        if self.t + dt > self.stop_time - eps:
            dt = self.stop_time - self.t
        return dt

    # ------------------------------------------------------------------ evolve
    def advance_single_step(self, dt: float) -> bool:
        """One hydro(+radiation) step with the retry ladder (reference
        `advanceHydroAtLevelWithRetries`, ``src/QuokkaSimulation.hpp:886-990``).
        Returns True on success (self.U/self.t updated)."""
        # radiation-only problems: no hydro advance, a single "hydro step"
        # is just the radiation subcycle (reference: radiation test problems
        # run with constant_dt and no hydro state update)
        if not self.layout.hydro_enabled and self._radiation is not None:
            from .utils.profiler import prof

            with prof.region("RadiationSolver"):
                self.U = prof.sync(self._radiation.subcycle(self.U, self.t, dt))
            return True

        max_retries = 6
        U_start = self.U
        for retry in range(max_retries + 1):
            nsub = 2**retry
            dt_sub = dt / nsub
            U = U_start
            ok = True
            for _ in range(nsub):
                U, stats = self._step_jit(U, dt_sub)
                # failure: invalid state or post-step CFL violation
                valid = bool(stats["valid"])
                smax = float(stats["max_signal"])
                dt_cfl = self.cfl * self.grid.dx_min / smax
                cfl_violated = dt_sub > 1.1 * dt_cfl
                if not (valid and not cfl_violated):
                    ok = False
                    break
                if self._radiation is not None:
                    from .utils.profiler import prof

                    with prof.region("RadiationSolver"):
                        U = prof.sync(self._radiation.subcycle(U, self.t, dt_sub))
            if ok:
                self.U = U
                return True
            if self.verbose:
                print(
                    f"\t>> Re-trying hydro advance with reduced timestep "
                    f"(nsubsteps={2*nsub}, dt={dt/(2*nsub):.3e})"
                )
        return False

    def _check_states_valid(self):
        """Fail with the first invalid cell (NaN/Inf anywhere, non-positive
        density or internal energy in the hydro block)."""
        import numpy as np

        U = np.asarray(self.U)
        bad = ~np.isfinite(U)
        if self.layout.hydro_enabled:
            bad[0] |= U[0] <= 0.0
            bad[5] |= U[5] <= 0.0
        if bad.any():
            comp, i, j, k = (int(ix[0]) for ix in np.where(bad))
            x = self.grid.prob_lo[0] + (i + 0.5) * self.grid.dx[0]
            raise FloatingPointError(
                f"invalid state at step {self.istep}: component {comp} at "
                f"cell ({i},{j},{k}) (x = {x:.6g}) has value "
                f"{U[comp, i, j, k]!r} (debug.check_states = 1)"
            )

    def _performance_hints(self):
        """Warn about configurations that underutilize the device
        (reference `PerformanceHints`, ``src/simulation.hpp:486-520``:
        too-few/too-small boxes per rank; here: small grids that cannot
        fill the TPU's vector units, and f64 states that fall off the
        Pallas fast path)."""
        import jax as _jax

        backend = _jax.default_backend()
        if backend == "cpu":
            return
        n = self.grid.n_cell
        if self.grid.num_cells < 64 ** 3 and len(self.grid.active_axes) == 3:
            print(f"[performance] grid {n} is small for a TPU chip; "
                  "expect low MXU/VPU utilization (the benchmark sweet spot "
                  "is >= 128^3 per chip)")
        if any(self.grid.n_cell[d] % 128 != 0 for d in (2,) if self.grid.n_cell[2] > 1):
            print(f"[performance] n_cell z = {n[2]} is not a multiple of 128 "
                  "(the TPU lane width); padding wastes vector lanes")
        if self.dtype == jnp.float64:
            print("[performance] f64 state: the fused Pallas kernels are "
                  "f32-only (Mosaic cannot take f64 operands), falling back "
                  "to the XLA formulation (~3x slower; set precision=single "
                  "if f32 suffices)")

    def _fused_eligible(self) -> bool:
        """The fused multi-step window reproduces the per-step loop exactly
        only when nothing host-side happens between steps."""
        base_hook = type(self.problem).compute_before_timestep is Problem.compute_before_timestep
        rad_ok = (self._radiation is None
                  or hasattr(self, "_fused_window_rad_jit"))
        return (
            self.layout.hydro_enabled
            and getattr(self, "max_level", 0) == 0
            and rad_ok
            and not self.gravity_enabled
            and getattr(self, "_g_ext", None) is None
            and self.tracers is None
            and not self.check_states
            and not self.pp.contains("quokka.diagnostics")
            and self.constant_dt <= 0.0
            and base_hook
            and bool(self.pp.get_int("fused_windows", 1))
        )

    def _fused_window_size(self) -> int:
        """Steps until the next host-side event (output interval boundary,
        max_timesteps, or stop_time proximity); 0 disables the fused path
        for this step."""
        K = self.pp.get_int("fused_window", 16)
        K = min(K, self.max_timesteps - self.istep)
        for iv in (self.plotfile_interval, self.checkpoint_interval,
                   self.projection_interval, self.statistics_interval,
                   self.pp.get_int("ascent_interval", -1)):
            if iv > 0:
                K = min(K, iv - (self.istep % iv))
        if K < 2 or self.t == 0.0 or not np.isfinite(self.dt_prev):
            return 0
        # worst-case window duration: dt may grow 1.1x per step
        remaining = self.stop_time - self.t
        while K >= 2:
            growth = 1.1 * (1.1 ** K - 1.0) / 0.1  # sum_{i=1..K} 1.1^i
            worst = min(K * self.max_dt, self.dt_prev * growth)
            if worst < remaining * (1.0 - 1e-9):
                return K
            K -= 1
        return 0

    def evolve(self):
        from .utils.profiler import prof

        if self.U is None:
            self.set_initial_conditions()
        if self.verbose:
            self._performance_hints()
        prof.reset(enabled=bool(self.pp.get_int("profile.enabled", 0)))

        start_walltime = _time.perf_counter()
        ncells = self.grid.num_cells
        fused_ok = self._fused_eligible() and not prof.enabled

        while self.t < self.stop_time * (1.0 - 1e-14) and self.istep < self.max_timesteps:
            if fused_ok:
                K = self._fused_window_size()
                if K >= 2:
                    if self._radiation is not None:
                        U_new, dtp, ok, dts = self._fused_window_rad_jit(
                            self.U, jnp.asarray(self.dt_prev, self.dtype),
                            jnp.asarray(self.t, self.dtype), K
                        )
                    else:
                        U_new, dtp, ok, dts = self._fused_window_jit(
                            self.U, jnp.asarray(self.dt_prev, self.dtype), K
                        )
                    if bool(ok):
                        self.U = U_new
                        for d in np.asarray(dts):
                            self.t += float(d)
                        self.dt_prev = float(dtp)
                        self.istep += K
                        self.cell_updates += K * ncells
                        self.cell_updates_raw += K * ncells
                        if self.verbose:
                            print(f"Coarse STEPS {self.istep - K + 1}..{self.istep} "
                                  f"(fused window) t = {self.t:.6e}")
                        self._maybe_write_outputs()
                        if self._walltime_exceeded(start_walltime):
                            break
                        continue
                    # failure inside the window: fall through and replay
                    # step-by-step below (U was not modified)

            self.problem.compute_before_timestep(self)
            with prof.region("computeTimestep"):
                dt = self.compute_timestep()
            if dt <= 0.0:
                break
            if self.verbose:
                print(f"Coarse STEP {self.istep + 1} starts t = {self.t:.6e} dt = {dt:.6e}")

            if self.gravity_enabled:
                with prof.region("GravitySolver"):
                    self._gravity_before_step(dt)

            with prof.region("HydroSolver"):
                ok = self.advance_single_step(dt)
                prof.sync(self.U)
            if not ok:
                raise RuntimeError(
                    f"Hydro update exceeded max_retries at step {self.istep}; cannot continue."
                )

            if self.gravity_enabled:
                with prof.region("GravitySolver"):
                    self._gravity_after_step(dt)
                    prof.sync(self.U)

            if getattr(self, "_g_ext", None) is not None:
                self.U = self._g_ext(self.U, dt)

            if self.check_states:
                self._check_states_valid()

            if self.tracers is not None:
                self._advect_tracers(dt)

            self.t += dt
            self.dt_prev = dt
            self.istep += 1
            self.cell_updates += ncells
            self.cell_updates_raw += ncells

            with prof.region("IO"):
                self._maybe_write_outputs()
            if self._walltime_exceeded(start_walltime):
                break

        jax.block_until_ready(self.U)
        prof.report()
        elapsed = _time.perf_counter() - start_walltime
        self.elapsed_walltime = elapsed

        # performance FOM (reference src/simulation.hpp:972-980)
        if elapsed > 0 and self.cell_updates > 0:
            mzones = self.cell_updates / elapsed / 1.0e6
            self.zone_updates_per_second = mzones * 1.0e6
            if self.verbose:
                print(f"Performance figure-of-merit: {elapsed/self.cell_updates*1e6:.6f} μs/zone-update [={mzones:.3f} Mupdates/s]")
        else:
            self.zone_updates_per_second = 0.0

        self._conservation_audit()
        self._compute_error_norm()
        self.problem.compute_after_evolve(self)

    def _maybe_write_outputs(self):
        if self.plotfile_interval > 0 and self.istep % self.plotfile_interval == 0:
            self.write_plotfile()
        if self.projection_interval > 0 and self.istep % self.projection_interval == 0:
            from .io.diagnostics import write_projection

            write_projection(self, self.projection_dirs or ("z",))
        if self.statistics_interval > 0 and self.istep % self.statistics_interval == 0:
            from .io.diagnostics import write_statistics

            write_statistics(self)
        if self.pp.contains("quokka.diagnostics"):
            from .io.diagnostics import run_configured_diagnostics

            run_configured_diagnostics(self)
        # in-situ rendering (reference Ascent interval, simulation.hpp:899)
        if self.pp.get_int("ascent_interval", -1) > 0:
            from .io.insitu import maybe_render

            maybe_render(self)
        # NB: checkpoint written after plotfile (reference issue #554 ordering)
        if self.checkpoint_interval > 0 and self.istep % self.checkpoint_interval == 0:
            self.write_checkpoint()

    def _walltime_exceeded(self, start_walltime: float) -> bool:
        """Graceful walltime-bounded stop at 90% + final checkpoint
        (reference src/simulation.hpp:948-951, 998-1003)."""
        if self.max_walltime is None:
            return False
        if _time.perf_counter() - start_walltime > 0.9 * self.max_walltime:
            if self.verbose:
                print("Reached 90% of max_walltime; writing checkpoint and stopping.")
            self.write_checkpoint()
            return True
        return False

    # ------------------------------------------------------------- diagnostics
    def _conservation_audit(self):
        final = np.asarray(self._sums_jit(self.U))
        init = self.init_sums
        self.conservation_abs_err = final - init
        with np.errstate(divide="ignore", invalid="ignore"):
            self.conservation_rel_err = np.where(init != 0, (final - init) / init, np.nan)
        if self.verbose:
            Egas0, Egas = init[EGAS], final[EGAS]
            print(f"\nInitial gas energy = {Egas0:.12e}")
            print(f"Final gas energy   = {Egas:.12e}")
            if Egas0 != 0:
                print(f"\trelative conservation error = {(Egas - Egas0)/Egas0:.3e}\n")

    def _compute_error_norm(self):
        """Relative rms-of-L1 error norm against the problem's reference
        solution (reference `computeAfterEvolve`,
        ``src/QuokkaSimulation.hpp:620-645``)."""
        ref = self.problem.compute_reference_solution(self)
        if ref is None:
            return
        ref = jnp.asarray(ref, dtype=self.dtype)
        resid = ref - self.U
        sol_norm = jnp.sqrt(jnp.sum(jnp.sum(jnp.abs(ref), axis=(1, 2, 3)) ** 2))
        err_norm = jnp.sqrt(jnp.sum(jnp.sum(jnp.abs(resid), axis=(1, 2, 3)) ** 2))
        self.error_norm = float(err_norm / sol_norm)
        if self.verbose:
            print(f"Relative rms L1 error norm = {self.error_norm:.6e}")

    def _advect_tracers(self, dt: float):
        """Advect massless tracer particles with the CIC-gathered gas
        velocity (the reference advects with time-averaged face velocities,
        ``src/QuokkaSimulation.hpp:1290-1316``; cell-centered gather is the
        dense-array equivalent)."""
        from .indices import MX1, MX2, MX3, RHO
        from .particles import cic

        U = self.U
        rho = U[RHO]
        vel = (U[MX1] / rho, U[MX2] / rho, U[MX3] / rho)
        v_at = cic.cic_gather(vel, self.tracers, self.grid)
        tr = cic.ParticleData(self.tracers.x, v_at, self.tracers.mass)
        self.tracers = cic.drift(tr, dt, self.grid, self.periodic)

    # -------------------------------------------------------------------- I/O
    def write_plotfile(self, prefix: str = "plt"):
        # runtime analog of the reference's compile-time QUOKKA_USE_OPENPMD
        # plotfile-format switch (src/simulation.hpp:2304-2323)
        if self.pp.get_str("plotfile_format", "native") == "openpmd":
            from .io.openpmd import write_openpmd

            write_openpmd(self, prefix)
            return
        from .io.plotfile import write_plotfile

        write_plotfile(self, prefix)

    def write_checkpoint(self, prefix: str = "chk"):
        from .io.checkpoint import write_checkpoint

        write_checkpoint(self, prefix)
