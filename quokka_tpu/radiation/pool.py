"""Radiation subcycling on tile-pool AMR levels.

Pool analog of `advance.LevelRadiation` (reference
`QuokkaSimulation::subcycleRadiationAtLevel`,
``src/QuokkaSimulation.hpp:1577-1650``): the IMEX PD-ARS substep runs
vmapped over the tile axis, with the per-stage ghost fills (radiation
components only -- transport never reads hydro ghosts) assembled by the
pool fill machinery: neighbor-tile gathers + prolongation of the parent's
padded endpoint states lerped to the stage time. Source coupling is
pointwise and needs no ghosts; per-tile radiation energy sources evaluate
the problem hook on a `TileGridView` (traced tile-origin coordinates).

The time-averaged transport fluxes are returned both at the level's own
resolution (faces [0..t] per tile -- the coarse side of refluxing against
a child pool) and restricted to the parent's resolution (this level's
contribution to the parent's flux register), mirroring how the dense
driver concatenates radiation components into the hydro register
(reference YAFluxRegister covers ncompHyperbolic_ components).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from ..amr import pool_advance as pa
from ..amr import tilepool as tp
from ..stencil import interior
from .source_terms import add_source_terms_single_group
from .system import add_fluxes_rk2, compute_rad_fluxes, predict_step, rad_div_fluxes


class TileGridView:
    """Grid-like coordinate view of one tile for per-tile problem hooks
    (duck-types the `Grid` surface those hooks read: prob_lo/hi, n_cell,
    dx, cell_centers, cell_center_mesh). `origin` is a traced int32[3]."""

    def __init__(self, level_grid, origin, tile_shape):
        self.prob_lo = level_grid.prob_lo
        self.prob_hi = level_grid.prob_hi
        self.dx = level_grid.dx
        self.n_cell = tuple(tile_shape)
        self._origin = origin

    def cell_centers(self, axis: int, dtype=jnp.float64):
        lo, dx, n = self.prob_lo[axis], self.dx[axis], self.n_cell[axis]
        return lo + (self._origin[axis] + jnp.arange(n, dtype=dtype) + 0.5) * dx

    def cell_center_mesh(self, dtype=jnp.float64):
        x = self.cell_centers(0, dtype).reshape(-1, 1, 1)
        y = self.cell_centers(1, dtype).reshape(1, -1, 1)
        z = self.cell_centers(2, dtype).reshape(1, 1, -1)
        return x, y, z


class PoolLevelRadiation:
    """Radiation subcycle for one POOL level."""

    def __init__(self, sim, level: int, grid):
        self.sim = sim
        self.level = level
        self.grid = grid
        base = sim._radiation.opts if getattr(sim, "_radiation", None) else None
        if base is None:
            raise RuntimeError("PoolLevelRadiation requires RadiationAdvance")
        # pool tiles run the XLA transport formulation under vmap
        self.opts = dataclasses.replace(base, use_pallas=False)
        self.rad_start = sim.layout.rad_start
        self.chunk = sim.pool_chunk
        self._substeps = {}
        self._build()

    def _build(self):
        sim = self.sim
        opts = self.opts
        grid = self.grid
        rad_start = self.rad_start
        ts = sim.tile_shape
        g = sim._g
        ng3 = (g, g, g)
        dx = grid.dx
        active = grid.active_axes
        eos = sim.eos
        problem = sim.problem
        G = opts.n_groups
        multigroup = G > 1
        parent_pool = sim._is_pool(self.level - 1)
        kappa_p = problem.compute_planck_opacity
        kappa_e = problem.compute_energy_mean_opacity
        kappa_f = problem.compute_flux_mean_opacity
        boundaries = tuple(problem.rad.group_edges) if problem.rad.group_edges \
            else (0.0, float("inf"))
        kB = problem.eos_traits.boltzmann_constant

        def rad_part(U):
            return U[:, rad_start:].reshape(U.shape[0], G, 4, *U.shape[2:])

        def with_rad(U, R):
            return U.at[:, rad_start:].set(
                R.reshape(U.shape[0], G * 4, *U.shape[2:])
            )

        def source_update(U, rad_src, dt, stage):
            # the coupling is pointwise: flatten the tile axis into x and
            # call the solver ONCE -- vmap's batching transform shifts FMA
            # contraction sites (~1 ulp vs the dense path), while the flat
            # call is bitwise-identical to the dense level's
            T = U.shape[0]
            nv = U.shape[1]
            tx, ty, tz = U.shape[2:]
            Uf = jnp.moveaxis(U, 0, 1).reshape(nv, T * tx, ty, tz)
            if multigroup and rad_src.ndim == 5:
                rf = jnp.moveaxis(rad_src, 0, 1).reshape(G, T * tx, ty, tz)
            else:
                rf = rad_src.reshape(T * tx, ty, tz)
            if multigroup:
                from .multigroup import add_source_terms_multi_group

                U2f, tel = add_source_terms_multi_group(
                    Uf, rf, dt, stage, opts, eos, problem, rad_start,
                    boundaries, kB,
                )
            else:
                U2f, tel = add_source_terms_single_group(
                    Uf, rf, dt, stage, opts, eos,
                    kappa_p, kappa_e, kappa_f, rad_start,
                )
            U2 = jnp.moveaxis(U2f.reshape(nv, T, tx, ty, tz), 1, 0)
            return U2, tel

        chunk = self.chunk

        def faces_of(fl_tiles, T):
            """Padded-coords transport fluxes -> [0..t] faces as
            4G-component dicts (slicing is rounding-free; restriction to
            the parent happens ONCE per hydro substep after the subcycle
            sum, the dense path's accumulation order)."""
            flat = {
                d: F.reshape(T, 4 * G, *F.shape[3:])
                for d, F in fl_tiles.items()
            }
            return pa.slice_tile_faces(flat, g, ts)

        def make_substep(kind: str, restrict_inline: bool):
            """kind = parent-context representation (see
            `hierarchy._get_pool_step`); `restrict_inline` restricts the
            transport faces to the parent resolution per substep (the
            chunked leaf-level memory mode -- reorders the subcycle sum's
            rounding vs the dense path, so it is used only where no
            bitwise-parity claim is made)."""

            def substep(U, nbr, org, ps, po, ctx, th_a, th_b, time, dt):
                dt = jnp.asarray(dt, U.dtype)
                time = jnp.asarray(time, U.dtype)
                T = U.shape[0]

                def rad_src_of(o):
                    gv = TileGridView(grid, o, ts)
                    src = jnp.asarray(
                        problem.set_radiation_energy_source(gv, time), U.dtype
                    )
                    if multigroup and src.ndim == 3:
                        src = jnp.broadcast_to(src[None], (G, *src.shape)) / G
                    return src

                rad_src = jax.vmap(rad_src_of)(org)

                if kind == "pool":
                    (Uo_p, Un_p, nbr_p, org_p, tha, thb, gpo, gpn) = ctx
                    gpa = ((1.0 - tha) * gpo + tha * gpn)[rad_start:]
                    gpb = ((1.0 - thb) * gpo + thb * gpn)[rad_start:]
                    Uo_r = Uo_p[:, rad_start:]
                    Un_r = Un_p[:, rad_start:]
                    sla = tp.slice_slabs(Uo_r, g)
                    slb = tp.slice_slabs(Un_r, g)

                    def backdrop(theta, org_c, ps_c, po_c):
                        rows = jnp.maximum(ps_c, 0)
                        p_old = tp.assemble_padded(
                            Uo_r[rows], nbr_p[rows],
                            tp.make_backdrop_from_dense(
                                gpa, org_p[rows], ts, g, g, active),
                            sla, g,
                        )
                        p_new = tp.assemble_padded(
                            Un_r[rows], nbr_p[rows],
                            tp.make_backdrop_from_dense(
                                gpb, org_p[rows], ts, g, g, active),
                            slb, g,
                        )
                        ppt = (1.0 - theta) * p_old + theta * p_new
                        loc = jnp.arange(ps_c.shape[0], dtype=jnp.int32)
                        return tp.make_backdrop_from_pool(
                            ppt, loc, po_c, ts, g, g, active
                        )
                else:
                    ppad_old, ppad_new = ctx

                    def backdrop(theta, org_c, ps_c, po_c):
                        pp = (1.0 - theta) * ppad_old + theta * ppad_new
                        ppr = (pp[:, rad_start:] if kind == "poolpad"
                               else pp[rad_start:])
                        if kind == "poolpad":
                            return tp.make_backdrop_from_pool(
                                ppr, ps_c, po_c, ts, g, g, active
                            )
                        return tp.make_backdrop_from_dense(
                            ppr, org_c, ts, g, g, active
                        )

                def transport(Up_rad, theta):
                    """(div interior, faces) of the HLL transport sweep;
                    chunked when configured."""
                    slabs = tp.slice_slabs(Up_rad, g)

                    def chunk_body(args):
                        u_c, nbr_c, org_c, ps_c, po_c = args
                        bd = backdrop(theta, org_c, ps_c, po_c)
                        ug = tp.assemble_padded(u_c, nbr_c, bd, slabs, g)
                        fl = jax.vmap(
                            lambda x: compute_rad_fluxes(x, 0, opts, active, dx)
                        )(ug)
                        div = jax.vmap(
                            lambda f: interior(rad_div_fluxes(f, dx), ng3)
                        )(fl)
                        faces = faces_of(fl, u_c.shape[0])
                        if restrict_inline:
                            faces = pa.restrict_tile_faces(faces, active)
                        return div, faces

                    if chunk:
                        Nc = T // chunk

                        def ch(x):
                            return x.reshape(Nc, chunk, *x.shape[1:])

                        out = jax.lax.map(chunk_body, (
                            ch(Up_rad), ch(nbr), ch(org), ch(ps), ch(po)
                        ))
                        return jax.tree_util.tree_map(
                            lambda x: x.reshape(T, *x.shape[2:]), out
                        )
                    return chunk_body((Up_rad, nbr, org, ps, po))

                divF0, own0 = transport(U[:, rad_start:], th_a)
                R0 = rad_part(U)
                R1 = jax.vmap(
                    lambda r, d: predict_step(r, d, dt, opts)
                )(R0, divF0)
                U1 = with_rad(U, R1)
                U1, _ = source_update(U1, rad_src, dt, 1)

                divF1, own1 = transport(U1[:, rad_start:], th_b)
                R_new = jax.vmap(
                    lambda r0, r1, d0, d1: add_fluxes_rk2(
                        r0, r1, d0, d1, dt, opts
                    )
                )(R0, rad_part(U1), divF0, divF1)
                U2 = with_rad(U1, R_new)
                U2, _ = source_update(U2, rad_src, dt, 2)

                own = {d: 0.5 * (own0[d] + own1[d]) for d in own0}
                return U2, own
            return substep

        def get_substep(kind: str, restrict_inline: bool):
            key = (kind, restrict_inline)
            if key not in self._substeps:
                self._substeps[key] = jax.jit(make_substep(*key))
            return self._substeps[key]

        self._get_substep = get_substep

        def finalize(own_sum):
            return pa.restrict_tile_faces(own_sum, active)

        self._restrict_faces = jax.jit(finalize)

    def n_substeps(self, dt_level: float) -> int:
        sim = self.sim
        if not sim.layout.hydro_enabled or sim.constant_dt > 0.0:
            return 1
        dt_rad = self.opts.cfl * self.grid.dx_min / self.opts.chat
        n = max(1, int(math.ceil(dt_level / dt_rad)))
        if n > self.opts.max_substeps + 1:
            raise RuntimeError(
                f"radiation substeps {n} exceeds max_substeps="
                f"{self.opts.max_substeps}"
            )
        return n

    def subcycle(self, U, time: float, dt_level: float, nbr, org, ps, po,
                 amask, ctx_kind: str, ctx_arrs, th0: float, th1: float,
                 with_own: bool = True) -> Tuple[jnp.ndarray, Dict, Dict]:
        """Advance the pool's radiation by dt_level; returns
        (U, own-resolution time-avg faces | None, parent-restricted
        faces). Leaf levels under chunked execution accumulate the faces
        pre-restricted (memory: the full-resolution face accumulator of a
        benchmark-scale finest level would rival the state itself)."""
        nsub = self.n_substeps(dt_level)
        dt_r = dt_level / nsub
        dtype = U.dtype
        restrict_inline = bool(self.chunk) and not with_own
        substep = self._get_substep(ctx_kind, restrict_inline)
        own_sum = None
        for i in range(nsub):
            th_a = th0 + (th1 - th0) * (i / nsub)
            th_b = th0 + (th1 - th0) * ((i + 1) / nsub)
            U, own = substep(
                U, nbr, org, ps, po, ctx_arrs,
                jnp.asarray(th_a, dtype), jnp.asarray(th_b, dtype),
                time + i * dt_r, dt_r,
            )
            if own_sum is None:
                own_sum = {d: F / nsub for d, F in own.items()}
            else:
                own_sum = {d: own_sum[d] + F / nsub for d, F in own.items()}
        if restrict_inline:
            return U, None, own_sum
        restr = self._restrict_faces(own_sum)
        return U, (own_sum if with_own else None), restr
