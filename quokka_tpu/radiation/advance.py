"""Radiation subcycling driver: IMEX PD-ARS substeps within a hydro step.

TPU-native rebuild of `QuokkaSimulation::subcycleRadiationAtLevel` +
`advanceRadiationForwardEuler` / `advanceRadiationMidpointRK2` /
`operatorSplitSourceTerms` (reference ``src/QuokkaSimulation.hpp:
1577-1916``). Each radiation substep is one jitted function:

  1. forward-Euler transport predict (fluxes from the old state),
  2. stage-1 implicit matter coupling (gas advanced by IMEX_a32 * dt),
  3. midpoint-RK2 transport combine (fluxes from the intermediate state),
  4. stage-2 implicit matter coupling ((1 - IMEX_a32) * dt).

The number of substeps is ceil(dt_hydro / (CFL_rad dx / c_hat)) as in the
reference (``:397-406``).
"""

from __future__ import annotations

import math
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from ..stencil import interior
from .source_terms import add_source_terms_single_group
from .system import RadOptions, add_fluxes_rk2, predict_step, rad_transport_div


_OPACITY_MODELS = ("piecewise_constant", "ppl_fixed_slope", "ppl_full_spectrum")


def _check_opacity_model(name: str) -> str:
    if name not in _OPACITY_MODELS:
        raise ValueError(
            f"radiation.opacity_model = '{name}' is not one of {_OPACITY_MODELS}"
        )
    return name


class RadiationAdvance:
    """Per-simulation radiation subsystem (built lazily when
    `Physics_Traits.radiation_enabled`)."""

    def __init__(self, sim):
        self.sim = sim
        problem = sim.problem
        rt = problem.rad
        pp = sim.pp

        self.opts = RadOptions(
            c=rt.c_light,
            chat=rt.c_hat,
            arad=rt.radiation_constant,
            erad_floor=rt.Erad_floor,
            beta_order=rt.beta_order,
            reconstruction_order=pp.get_int("radiation.reconstruction_order", 3),
            use_wavespeed_correction=bool(pp.get_int("radiation.wavespeed_correction", 0)),
            cfl=pp.get_float("radiation.cfl", 0.3),
            max_substeps=pp.get_int("radiation.max_substeps", 10),
            include_work_term=bool(pp.get_int("radiation.include_work_term", 1)),
            n_groups=problem.physics.n_groups,
            opacity_model=_check_opacity_model(
                pp.get_str("radiation.opacity_model", "piecewise_constant")
            ),
            mixed_precision_coupling=bool(
                pp.get_int("radiation.mixed_precision_coupling", 0)
            ),
            use_pallas=bool(
                pp.get_int(
                    "radiation.use_pallas",
                    0 if jax.default_backend() == "cpu" else 1,
                )
            ),
        )
        self.rad_start = sim.layout.rad_start
        self.boundaries = tuple(rt.group_edges) if rt.group_edges else (0.0, float("inf"))
        # runtime override of the dust-gas interaction coefficient
        # (reference key radiation.dust_gas_interaction_coeff)
        coeff = pp.get_float("radiation.dust_gas_interaction_coeff", -1.0)
        if coeff >= 0.0:
            import dataclasses

            problem.ism = dataclasses.replace(problem.ism, dust_gas_coeff=coeff)
        self._build()

    def _build(self):
        sim = self.sim
        opts = self.opts
        rad_start = self.rad_start
        ng = sim.ng
        dx = sim.grid.dx
        active = sim.grid.active_axes
        eos = sim.eos
        problem = sim.problem
        G = opts.n_groups

        kappa_p = problem.compute_planck_opacity
        kappa_e = problem.compute_energy_mean_opacity
        kappa_f = problem.compute_flux_mean_opacity

        def rad_part(U):
            return U[rad_start:].reshape(G, 4, *U.shape[1:])

        def with_rad(U, R):
            return U.at[rad_start:].set(R.reshape(G * 4, *U.shape[1:]))

        # transport only reads the radiation block (+ gas only via the
        # optional optical-depth wavespeed correction); when no user BC hook
        # needs the full state, fill just the rad components (the fill is
        # ~27% of a substep at 256^3)
        from ..registry import BC_PERIODIC, BC_USER
        from ..boundaries import fill_ghosts
        from ..indices import StateLayout

        has_user_bc = any(
            BC_USER in problem.bcs.axis(d) for d in range(3)
        )
        all_periodic = all(
            bc == BC_PERIODIC for d in range(3) for bc in problem.bcs.axis(d)
        )
        ng_t = ng  # ghost widths of the transport arrays
        if sim.decomp is not None and (has_user_bc or opts.use_wavespeed_correction):
            # multi-chip + full-state consumers: the optical-depth wavespeed
            # correction reads gas RHO/EINT from the filled array and user BC
            # hooks may read any component, so halo-exchange the FULL state
            from ..parallel.halo import make_sharded_fill

            fill_for_transport = make_sharded_fill(
                sim.decomp, sim.ng, problem.bcs, sim.layout,
                problem if has_user_bc else None, sim.grid,
            )
            rad_start_eff = rad_start
        elif sim.decomp is not None:
            # multi-chip: halo-exchange the radiation slice over the mesh
            from ..parallel.halo import make_sharded_fill

            class _RadSliceLayoutS:
                nvar = 4 * G
                hydro_enabled = False
                radiation_enabled = True
                n_groups = G

                @staticmethod
                def rad_index(g, comp):
                    return 4 * g + comp

            sharded_fill_r = make_sharded_fill(
                sim.decomp, sim.ng, problem.bcs, _RadSliceLayoutS(),
                problem if has_user_bc else None, sim.grid,
            )
            fill_for_transport = lambda U: sharded_fill_r(U[rad_start:])
            rad_start_eff = 0
        elif all_periodic and not has_user_bc and not opts.use_wavespeed_correction:
            # fully periodic single-chip domain: every transport stencil is a
            # roll along the sweep axis, and a roll's wrap IS the periodic
            # boundary condition -- run on the unpadded radiation slice with
            # no ghost fill at all (the fill was ~20% of a substep at 256^3)
            fill_for_transport = lambda U: U[rad_start:]
            rad_start_eff = 0
            ng_t = (0, 0, 0)
        elif has_user_bc or opts.use_wavespeed_correction:
            fill_for_transport = sim._fill
            rad_start_eff = rad_start
        else:
            class _RadSliceLayout:
                """Layout of the bare radiation slice (rad comps start at 0)."""

                nvar = 4 * G
                hydro_enabled = False
                radiation_enabled = True
                n_groups = G

                @staticmethod
                def rad_index(g, comp):
                    return 4 * g + comp

            layout_r = _RadSliceLayout()

            def fill_rad_only(U):
                Ur = U[rad_start:]
                return fill_ghosts(
                    Ur, sim.ng, problem.bcs, layout_r,
                    problem=None, grid=sim.grid,
                )

            fill_for_transport = fill_rad_only
            rad_start_eff = 0

        multigroup = G > 1
        boundaries = self.boundaries
        kB = problem.eos_traits.boltzmann_constant

        # asymptotic wavespeed correction: face-harmonic-mean cell optical
        # depth from the flux-mean opacity (reference ComputeCellOpticalDepth,
        # radiation_system.hpp:805-880); requires the full-state fill
        tau_fn = None
        if opts.use_wavespeed_correction:
            from ..stencil import sh as _sh
            from ..indices import EINT as _EINT, RHO as _RHO

            def tau_fn(Ug, d):
                rho = Ug[_RHO]
                T = eos.tgas_from_eint(rho, Ug[_EINT])
                if multigroup:
                    kf = problem.compute_group_opacities(boundaries, rho, T)
                else:
                    kf = kappa_f(rho, T)[None]
                tau_c = rho[None] * kf * dx[d]
                tau_l = _sh(tau_c, -1, d + 1)
                return 2.0 * tau_l * tau_c / jnp.maximum(tau_l + tau_c, 1e-300)

        dust_enabled = problem.ism.enable_dust_gas_thermal_coupling_model

        def source_update(U, rad_src, dt, stage):
            if dust_enabled:
                from .dust import add_source_terms_gas_dust

                src = rad_src if rad_src.ndim == 4 else jnp.broadcast_to(
                    rad_src[None], (G, *rad_src.shape))
                return add_source_terms_gas_dust(
                    U, src, dt, stage, opts, eos, problem, rad_start,
                    boundaries, kB,
                )
            if multigroup:
                from .multigroup import add_source_terms_multi_group

                return add_source_terms_multi_group(
                    U, rad_src, dt, stage, opts, eos, problem, rad_start,
                    boundaries, kB,
                )
            if (opts.use_pallas and U.dtype == jnp.float32
                    and not opts.mixed_precision_coupling):
                from .pallas_source import source_update_pallas

                return source_update_pallas(
                    U, rad_src, dt, stage, opts, eos,
                    kappa_p, kappa_e, kappa_f, rad_start,
                )
            return add_source_terms_single_group(
                U, rad_src, dt, stage, opts, eos, kappa_p, kappa_e, kappa_f, rad_start
            )

        def eval_rad_src(time, dtype):
            """User radiation energy source dE/dt on the GLOBAL grid
            (reference SetRadEnergySource). Evaluated outside shard_map so
            the hook sees full-domain coordinates; GSPMD shards the result."""
            src = jnp.asarray(
                problem.set_radiation_energy_source(sim.grid, time), dtype
            )
            if multigroup and src.ndim == 3:
                src = jnp.broadcast_to(src[None], (G, *src.shape)) / G
            return src

        def substep_core(U, rad_src, dt):
            # stage 1: forward-Euler transport
            Ug0 = fill_for_transport(U)
            divF0 = interior(rad_transport_div(Ug0, rad_start_eff, opts, active, dx, tau_fn), ng_t)
            R0 = rad_part(U)
            R1 = predict_step(R0, divF0, dt, opts)
            U1 = with_rad(U, R1)

            # stage-1 matter coupling (IMEX_a22 = 1 > 0)
            U1, st1 = source_update(U1, rad_src, dt, 1)

            # stage 2: midpoint RK2 transport from the source-updated state
            Ug1 = fill_for_transport(U1)
            divF1 = interior(rad_transport_div(Ug1, rad_start_eff, opts, active, dx, tau_fn), ng_t)
            R_new = add_fluxes_rk2(R0, rad_part(U1), divF0, divF1, dt, opts)
            U2 = with_rad(U1, R_new)

            # stage-2 matter coupling
            U2, st2 = source_update(U2, rad_src, dt, 2)
            n_it = jnp.maximum(st1["newton_iters_max"], st2["newton_iters_max"])
            if sim.decomp is not None:
                from ..parallel.decomp import AXIS_NAMES

                red = tuple(AXIS_NAMES[d] for d in sim.decomp.sharded_dims())
                if red:
                    n_it = jax.lax.pmax(n_it, red)
            return U2, {"newton_iters_max": n_it}

        # fully-fused substep (pallas_substep.py): one kernel per IMEX
        # stage -- 3-axis transport + predict/combine + the Newton matter
        # coupling in VMEM. Exactly the single-group periodic ghost-free
        # single-chip f32 hot path (the radhydro benchmark configuration).
        fused_ok = (
            not multigroup
            and not dust_enabled
            and opts.use_pallas
            and not opts.mixed_precision_coupling
            and tau_fn is None
            and all_periodic
            and not has_user_bc
            and sim.decomp is None
            and sim.grid.active_axes == (0, 1, 2)
            and bool(sim.pp.get_int("radiation.fused_substep", 1))
        )

        def substep_core_dispatch(U, rad_src, dt):
            if fused_ok and U.dtype == jnp.float32:
                from .pallas_substep import fused_substep_pallas

                return fused_substep_pallas(
                    U, rad_src, dt, opts, eos, kappa_p, kappa_e, kappa_f,
                    rad_start, dx,
                )
            return substep_core(U, rad_src, dt)

        def substep(U, time, dt):
            # python-float dt/time become f64 under jax_enable_x64; keep the
            # whole solve in the state dtype
            dt = jnp.asarray(dt, U.dtype)
            time = jnp.asarray(time, U.dtype)
            return substep_core_dispatch(U, eval_rad_src(time, U.dtype), dt)

        if sim.decomp is not None:
            from jax.sharding import PartitionSpec as P

            spec = sim.decomp.state_spec()
            spatial = tuple(spec)[1:]
            src_spec = P(None, *spatial) if multigroup else P(*spatial)
            core_mapped = jax.shard_map(
                substep_core, mesh=sim.decomp.mesh,
                in_specs=(spec, src_spec, P()),
                out_specs=(spec, {"newton_iters_max": P()}),
                check_vma=False,
            )

            def substep_sharded(U, time, dt):
                dt = jnp.asarray(dt, U.dtype)
                time = jnp.asarray(time, U.dtype)
                return core_mapped(U, eval_rad_src(time, U.dtype), dt)

            self._substep_jit = jax.jit(substep_sharded)
        else:
            self._substep_jit = jax.jit(substep)

        # device-side multi-substep runner: one lax.scan per call (used for
        # subcycles and long constant-dt radiation runs; avoids per-substep
        # host dispatch, which the reference's host loop pays on every step)
        def run_steps(U, t0, dt, n):
            def body(carry, _):
                U_c, t_c = carry
                U_n, _st = substep(U_c, t_c, dt)
                return (U_n, t_c + dt), None

            (U_f, t_f), _ = jax.lax.scan(body, (U, t0), None, length=n)
            return U_f

        self._run_steps_jit = jax.jit(run_steps, static_argnames=("n",))

    def n_substeps(self, dt_hydro: float) -> int:
        """ceil(dt_hydro / (CFL_rad dx_min / c_hat)), clamped to
        max_substeps+1 (reference computeNumberOfRadiationSubsteps). This
        applies to radiation-only problems too: their coarse dt comes from
        the global `cfl`, and the radiation CFL subdivides it."""
        sim = self.sim
        if sim.constant_dt > 0.0:
            return 1
        dt_rad = self.opts.cfl * sim.grid.dx_min / self.opts.chat
        n = max(1, int(math.ceil(dt_hydro / dt_rad)))
        if n > self.opts.max_substeps + 1:
            raise RuntimeError(
                f"radiation substeps {n} exceeds max_substeps={self.opts.max_substeps}"
            )
        return n

    def subcycle(self, U, time: float, dt_hydro: float):
        nsub = self.n_substeps(dt_hydro)
        dt_rad = dt_hydro / nsub
        if nsub == 1:
            U, _stats = self._substep_jit(U, time, dt_rad)
            return U
        if self.sim.decomp is not None:
            # sharded: async python-loop dispatch of the shard_mapped substep
            for i in range(nsub):
                U, _stats = self._substep_jit(U, time + i * dt_rad, dt_rad)
            return U
        return self._run_steps_jit(U, time, dt_rad, nsub)

    def run_steps(self, U, t0: float, dt: float, n: int):
        """Run `n` radiation substeps of size `dt` on-device (lax.scan)."""
        return self._run_steps_jit(U, t0, dt, n)

class LevelRadiation:
    """Radiation subcycling for one AMR level (dense full-domain levels).

    TPU-native analog of the reference's per-level radiation advance
    (`QuokkaSimulation::subcycleRadiationAtLevel` called from
    `advanceSingleTimestepAtLevel`, reference ``src/QuokkaSimulation.hpp:
    1577-1650``). Unlike the unigrid fast path this keeps the flux-dict
    transport formulation so the RK2 time-averaged face fluxes can feed the
    parent's flux register: radiation components reflux exactly like hydro
    ones (the reference registers `ncompHyperbolic_` radiation components in
    its YAFluxRegister). Fine-level ghost fills interpolate the parent state
    in space (lincc prolongation) and time (theta lerp), the dense-level
    equivalent of the reference's FillPatcher.
    """

    def __init__(self, sim, level: int, grid):
        import dataclasses

        self.sim = sim
        self.level = level
        self.grid = grid
        base = sim._radiation.opts if getattr(sim, "_radiation", None) else None
        if base is None:
            raise RuntimeError("LevelRadiation requires the base RadiationAdvance")
        # flux-dict formulation (refluxing needs the face fluxes); the
        # Pallas transport kernel EMITS the flux dict, so the level path
        # rides it too (`compute_rad_fluxes` dispatches on use_pallas --
        # the per-level radiation was 63% of the AMR radhydro step with
        # the XLA formulation on v5e)
        self.opts = base
        self.rad_start = sim.layout.rad_start
        self._build()

    def _build(self):
        from ..amr import operators as amr_ops
        from ..boundaries import fill_ghosts
        from .multigroup import add_source_terms_multi_group
        from .system import compute_rad_fluxes, rad_div_fluxes

        sim = self.sim
        opts = self.opts
        grid = self.grid
        rad_start = self.rad_start
        ng = sim.ng
        dx = grid.dx
        active = grid.active_axes
        eos = sim.eos
        problem = sim.problem
        G = opts.n_groups
        layout = sim.layout
        kappa_p = problem.compute_planck_opacity
        kappa_e = problem.compute_energy_mean_opacity
        kappa_f = problem.compute_flux_mean_opacity
        multigroup = G > 1
        boundaries = tuple(problem.rad.group_edges) if problem.rad.group_edges \
            else (0.0, float("inf"))
        kB = problem.eos_traits.boltzmann_constant

        def rad_part(U):
            return U[rad_start:].reshape(G, 4, *U.shape[1:])

        def with_rad(U, R):
            return U.at[rad_start:].set(R.reshape(G * 4, *U.shape[1:]))

        def source_update(U, rad_src, dt, stage):
            if multigroup:
                return add_source_terms_multi_group(
                    U, rad_src, dt, stage, opts, eos, problem, rad_start,
                    boundaries, kB,
                )
            if opts.use_pallas and U.dtype == jnp.float32:
                from .pallas_source import source_update_pallas

                return source_update_pallas(
                    U, rad_src, dt, stage, opts, eos,
                    kappa_p, kappa_e, kappa_f, rad_start,
                )
            return add_source_terms_single_group(
                U, rad_src, dt, stage, opts, eos, kappa_p, kappa_e, kappa_f,
                rad_start,
            )

        # transport only reads the radiation block: when no user BC hook
        # needs the full state, the level fills (and the prolongation of
        # the parent data, for fine levels) touch ONLY the 4G radiation
        # components -- a ~nvar/4G traffic cut on the fills, same trick as
        # the unigrid path
        from ..registry import BC_USER

        has_user_bc = any(BC_USER in problem.bcs.axis(d) for d in range(3))

        class _RadSliceLayoutL:
            nvar = 4 * G
            hydro_enabled = False
            radiation_enabled = True
            n_groups = G

            @staticmethod
            def rad_index(g, comp):
                return 4 * g + comp

        layout_r = _RadSliceLayoutL()
        rad_start_eff = rad_start if has_user_bc else 0

        def substep_core(U, fill, time, dt):
            dt = jnp.asarray(dt, U.dtype)
            time = jnp.asarray(time, U.dtype)
            rad_src = jnp.asarray(
                problem.set_radiation_energy_source(grid, time), U.dtype
            )
            if multigroup and rad_src.ndim == 3:
                rad_src = jnp.broadcast_to(rad_src[None], (G, *rad_src.shape)) / G

            Ug0 = fill(U)
            fluxes0 = compute_rad_fluxes(Ug0, rad_start_eff, opts, active, dx)
            divF0 = interior(rad_div_fluxes(fluxes0, dx), ng)
            R0 = rad_part(U)
            R1 = predict_step(R0, divF0, dt, opts)
            U1 = with_rad(U, R1)
            U1, _ = source_update(U1, rad_src, dt, 1)

            Ug1 = fill(U1)
            fluxes1 = compute_rad_fluxes(Ug1, rad_start_eff, opts, active, dx)
            divF1 = interior(rad_div_fluxes(fluxes1, dx), ng)
            R_new = add_fluxes_rk2(R0, rad_part(U1), divF0, divF1, dt, opts)
            U2 = with_rad(U1, R_new)
            U2, _ = source_update(U2, rad_src, dt, 2)

            # effective transport flux through the substep: the PD-ARS combine
            # is algebraically U0 + dt (0.5 divF0 + 0.5 divF1) + local terms
            eff = {
                d: (0.5 * (fluxes0[d] + fluxes1[d])).reshape(
                    4 * G, *fluxes0[d].shape[2:]
                )
                for d in fluxes0
            }
            return U2, eff

        if self.level == 0:
            if has_user_bc:
                def fill0(U):
                    return fill_ghosts(
                        U, ng, problem.bcs, layout, problem=problem, grid=grid
                    )
            else:
                def fill0(U):
                    return fill_ghosts(
                        U[rad_start:], ng, problem.bcs, layout_r,
                        problem=None, grid=grid,
                    )

            def substep0(U, time, dt):
                return substep_core(U, fill0, time, dt)

            self._substep = jax.jit(substep0)

            # split-stage variant for the STREAMED register path
            # (`subcycle(flux_reduce=...)`, the benchmark-scale root):
            # each stage is its own program holding ONE flux set, and the
            # per-stage faces are seeded into the register correction and
            # freed immediately -- the one-program substep's arena (both
            # flux sets + the averaged eff, ~3 GB at 256^3) does not fit
            # next to benchmark-scale pools
            def _src(U, time):
                dt_ = jnp.asarray(time, U.dtype)
                rs = jnp.asarray(
                    problem.set_radiation_energy_source(grid, dt_), U.dtype
                )
                if multigroup and rs.ndim == 3:
                    rs = jnp.broadcast_to(rs[None], (G, *rs.shape)) / G
                return rs

            def substep0_s1(U, time, dt):
                dt = jnp.asarray(dt, U.dtype)
                rad_src = _src(U, time)
                Ug0 = fill0(U)
                fluxes0 = compute_rad_fluxes(Ug0, rad_start_eff, opts,
                                             active, dx)
                divF0 = interior(rad_div_fluxes(fluxes0, dx), ng)
                R0 = rad_part(U)
                R1 = predict_step(R0, divF0, dt, opts)
                U1 = with_rad(U, R1)
                U1, _ = source_update(U1, rad_src, dt, 1)
                return U1, divF0, fluxes0

            def substep0_s2(U, U1, divF0, time, dt):
                dt = jnp.asarray(dt, U.dtype)
                rad_src = _src(U, time)
                Ug1 = fill0(U1)
                fluxes1 = compute_rad_fluxes(Ug1, rad_start_eff, opts,
                                             active, dx)
                divF1 = interior(rad_div_fluxes(fluxes1, dx), ng)
                R_new = add_fluxes_rk2(rad_part(U), rad_part(U1), divF0,
                                       divF1, dt, opts)
                U2 = with_rad(U1, R_new)
                U2, _ = source_update(U2, rad_src, dt, 2)
                return U2, fluxes1

            self._substep_s1 = jax.jit(substep0_s1)
            self._substep_s2 = jax.jit(substep0_s2)
        else:
            def substepf(U, time, dt, mask, Uc_old, Uc_new, th_a, th_b):
                def make_fill(theta):
                    def fillf(Uf):
                        if has_user_bc:
                            Uc = (1.0 - theta) * Uc_old + theta * Uc_new
                            base = jnp.where(
                                mask[None], Uf, amr_ops.prolong(Uc, active)
                            )
                            return fill_ghosts(
                                base, ng, problem.bcs, layout,
                                problem=problem, grid=grid,
                            )
                        Uc_r = ((1.0 - theta) * Uc_old[rad_start:]
                                + theta * Uc_new[rad_start:])
                        base = jnp.where(
                            mask[None], Uf[rad_start:],
                            amr_ops.prolong(Uc_r, active),
                        )
                        return fill_ghosts(
                            base, ng, problem.bcs, layout_r,
                            problem=None, grid=grid,
                        )
                    return fillf

                # stage-1 fill at the substep start time, stage-2 at its end
                dt_c = jnp.asarray(dt, U.dtype)
                fills = [make_fill(th_a), make_fill(th_b)]
                state = {"i": 0}

                def fill_dispatch(Uf):
                    f = fills[min(state["i"], 1)]
                    state["i"] += 1
                    return f(Uf)

                return substep_core(U, fill_dispatch, time, dt_c)

            self._substep = jax.jit(substepf)

    def n_substeps(self, dt_level: float) -> int:
        sim = self.sim
        if not sim.layout.hydro_enabled or sim.constant_dt > 0.0:
            return 1
        dt_rad = self.opts.cfl * self.grid.dx_min / self.opts.chat
        n = max(1, int(math.ceil(dt_level / dt_rad)))
        if n > self.opts.max_substeps + 1:
            raise RuntimeError(
                f"radiation substeps {n} exceeds max_substeps={self.opts.max_substeps}"
            )
        return n

    def subcycle(self, U, time: float, dt_level: float, mask=None,
                 Uc_old=None, Uc_new=None, theta_bounds=None,
                 flux_reduce=None):
        """Advance the level's radiation by dt_level; returns
        (U, time-averaged transport flux dict [4G, padded]).

        ``flux_reduce(eff, weight)``: optional streaming consumer for the
        per-substep transport fluxes (the benchmark-scale root seeds its
        flux-register correction incrementally so the accumulated
        full-size flux dict never exists); the returned flux dict is then
        None."""
        nsub = self.n_substeps(dt_level)
        dt_r = dt_level / nsub
        flux_sum = None
        G = self.opts.n_groups
        for i in range(nsub):
            t_i = time + i * dt_r
            if self.level == 0 and flux_reduce is not None:
                # split-stage streamed path: each stage's faces are seeded
                # (0.5/nsub weight each -- the eff average is linear) and
                # freed before the other stage's exist
                sync = getattr(self.sim, "sync_dispatch", False)
                U1, divF0, F0 = self._substep_s1(U, t_i, dt_r)
                if sync:
                    jax.block_until_ready(U1)
                flux_reduce(
                    {d: F.reshape(4 * G, *F.shape[2:])
                     for d, F in F0.items()}, 0.5 / nsub,
                )
                del F0
                U, F1 = self._substep_s2(U, U1, divF0, t_i, dt_r)
                if sync:
                    jax.block_until_ready(U)
                flux_reduce(
                    {d: F.reshape(4 * G, *F.shape[2:])
                     for d, F in F1.items()}, 0.5 / nsub,
                )
                del F1, U1, divF0
                continue
            if self.level == 0:
                U, eff = self._substep(U, t_i, dt_r)
            else:
                th0, th1 = theta_bounds
                th_a = th0 + (th1 - th0) * (i / nsub)
                th_b = th0 + (th1 - th0) * ((i + 1) / nsub)
                U, eff = self._substep(
                    U, t_i, dt_r, mask, Uc_old, Uc_new,
                    jnp.asarray(th_a, U.dtype), jnp.asarray(th_b, U.dtype),
                )
            if flux_reduce is not None:
                flux_reduce(eff, 1.0 / nsub)
                continue
            if flux_sum is None:
                flux_sum = {d: F / nsub for d, F in eff.items()}
            else:
                flux_sum = {d: flux_sum[d] + eff[d] / nsub for d in eff}
        return U, flux_sum
