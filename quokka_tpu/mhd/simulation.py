"""Driver for the constrained-transport MHD solver.

Beyond-parity module (the reference's MHD is a stub; see
`quokka_tpu.mhd.advance`). Mirrors the `Simulation` driver surface --
ParmParse deck, `set_initial_conditions()` / `evolve()`, CFL timestep,
conservation audit, FOM -- for fully periodic domains, where the solver
runs ghost-free (every stencil wraps via `jnp.roll`).
"""

from __future__ import annotations

import time
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ParmParse
from ..grid import Grid
from .advance import (
    MHDOptions,
    advance_mhd_rk2,
    b_cell_from_faces,
    div_b,
    max_signal_mhd,
)


def faces_from_vector_potential(grid: Grid, A_fns, dtype=jnp.float64):
    """Staggered face B = discrete curl of an edge-registered vector
    potential: div B = 0 to machine roundoff by construction.

    `A_fns` = (A_x, A_y, A_z) callables of (x, y, z); entries may be None
    (zero component). A_k is evaluated at edges along k: coordinate k at
    cell centers, the other two at lo faces (index (i, j) = (i-1/2, j-1/2),
    matching the solver's edge registration)."""
    from ..stencil import sh

    def coords_for_edge(k):
        out = []
        for d in range(3):
            n = grid.n_cell[d]
            lo, dx = grid.prob_lo[d], grid.dx[d]
            if d == k:
                c = lo + (jnp.arange(n, dtype=dtype) + 0.5) * dx
            else:
                c = lo + jnp.arange(n, dtype=dtype) * dx  # lo faces
            shape = [1, 1, 1]
            shape[d] = n
            out.append(c.reshape(shape))
        return out

    A = []
    for k in range(3):
        fn = A_fns[k]
        if fn is None:
            A.append(jnp.zeros(grid.n_cell, dtype=dtype))
        else:
            x, y, z = coords_for_edge(k)
            A.append(jnp.broadcast_to(jnp.asarray(fn(x, y, z), dtype=dtype),
                                      grid.n_cell))

    dx = grid.dx
    Bf = []
    for d in range(3):
        d1 = (d + 1) % 3
        d2 = (d + 2) % 3
        Bf.append(
            (sh(A[d2], 1, d1) - A[d2]) / dx[d1]
            - (sh(A[d1], 1, d2) - A[d1]) / dx[d2]
        )
    return Bf


class MHDSimulation:
    """Evolve an ideal-MHD problem on a fully periodic uniform grid.

    Multi-chip: pass ``decomp`` (a `parallel.decomp.Decomposition`) to
    block-shard the state over the device mesh. The CT solver is written
    entirely in periodic rolls, so GSPMD shards it automatically -- XLA
    lowers each roll across a sharded axis to a collective permute of the
    boundary slabs (the halo exchange), with no shard_map or explicit
    halo code. Sharded == single-device to roundoff
    (tests/test_mhd.py::test_mhd_sharded_matches_single)."""

    def __init__(self, problem, pp: ParmParse, precision: str = "double",
                 decomp=None):
        self.problem = problem
        self.pp = pp
        self.dtype = jnp.float64 if precision == "double" else jnp.float32

        n_cell = [int(v) for v in pp.get_list("amr.n_cell", [32, 1, 1])]
        while len(n_cell) < 3:
            n_cell.append(1)
        prob_lo = [float(v) for v in pp.get_list("geometry.prob_lo", [0.0, 0.0, 0.0])]
        prob_hi = [float(v) for v in pp.get_list("geometry.prob_hi", [1.0, 1.0, 1.0])]
        self.grid = Grid(tuple(n_cell), tuple(prob_lo), tuple(prob_hi))

        self.cfl = pp.get_float("cfl", 0.3)
        self.stop_time = pp.get_float("stop_time", 1.0)
        self.max_timesteps = pp.get_int("max_timesteps", 10**8)
        self.verbose = pp.get_int("verbose", 1)
        self.checkpoint_interval = pp.get_int("checkpoint_interval", -1)
        self.plotfile_interval = pp.get_int("plotfile_interval", -1)
        self.restartfile = pp.get_str("restartfile", "")
        self.metadata = {}

        self.opts = MHDOptions(
            gamma=problem.gamma,
            dx=self.grid.dx,
            active_axes=self.grid.active_axes,
            reconstruction_order=pp.get_int("mhd.reconstruction_order", 2),
            density_floor=pp.get_float("density_floor", 0.0),
            pressure_floor=pp.get_float("pressure_floor", 0.0),
            # under a decomposition the solver is sharded by GSPMD roll
            # lowering; a pallas_call would not auto-partition, so the
            # kernels are single-chip only
            use_pallas=bool(pp.get_int("mhd.use_pallas", 1))
            and decomp is None,
        )

        self.decomp = decomp
        if decomp is not None:
            for d in range(3):
                if self.grid.n_cell[d] % decomp.tiles[d] != 0:
                    raise ValueError(
                        f"n_cell {self.grid.n_cell} not divisible by "
                        f"decomposition tiles {decomp.tiles}"
                    )

        self.U: Optional[jnp.ndarray] = None
        self.Bf: Optional[List[jnp.ndarray]] = None
        self.t = 0.0
        self.istep = 0
        self.cell_updates = 0

        opts = self.opts
        self._step_jit = jax.jit(
            lambda U, Bf, dt: advance_mhd_rk2(U, Bf, dt, opts)
        )
        self._signal_jit = jax.jit(lambda U, Bf: max_signal_mhd(U, Bf, opts))
        self._divb_jit = jax.jit(
            lambda Bf: jnp.max(jnp.abs(div_b(Bf, opts)))
        )

        # fused multi-step window (the hydro driver's device-side loop,
        # simulation.py:499-537): K steps per device program with the CFL
        # dt computed on-device, so the host syncs once per window instead
        # of once per step. dt/t bookkeeping runs in f64 regardless of the
        # state dtype (matching the host loop's python-float arithmetic).
        self.fused_window = pp.get_int("mhd.fused_window", 16)
        cfl = self.cfl
        dxm = self.grid.dx_min
        stop = self.stop_time

        from functools import partial

        from jax import lax

        @partial(jax.jit, static_argnums=3)
        def window(U, Bf, t, K):
            def body(carry, _):
                U, Bf, t = carry
                sig = max_signal_mhd(U, Bf, opts)
                dt64 = jnp.minimum(
                    cfl * dxm / sig.astype(jnp.float64), stop - t
                )
                dt64 = jnp.maximum(dt64, 0.0)
                do = dt64 > 0.0
                U2, B2 = advance_mhd_rk2(
                    U, Bf, dt64.astype(U.dtype), opts
                )
                U2 = jnp.where(do, U2, U)
                B2 = [jnp.where(do, b2, b) for b2, b in zip(B2, Bf)]
                return (U2, B2, t + dt64), dt64

            (Uf, Bff, tf), dts = lax.scan(
                body, (U, Bf, t), None, length=K
            )
            return Uf, Bff, tf, dts

        self._window_jit = window

    # ---------------------------------------------------------------- setup
    def set_initial_conditions(self):
        if self.restartfile:
            import os

            from ..io.checkpoint import read_checkpoint_mhd

            path = os.path.realpath(self.restartfile)
            read_checkpoint_mhd(self, path)
            if self.verbose:
                print(f"Restarted MHD from {path} at t = {self.t:.6e}")
            return
        U, Bf = self.problem.set_initial_conditions_mhd(self.grid)
        self.U = jnp.asarray(U, dtype=self.dtype)
        self.Bf = [jnp.asarray(b, dtype=self.dtype) for b in Bf]
        if self.decomp is not None:
            self.U = jax.device_put(self.U, self.decomp.state_sharding())
            self.Bf = [
                jax.device_put(b, self.decomp.mask_sharding())
                for b in self.Bf
            ]
        if self.U.shape != (5, *self.grid.n_cell):
            raise ValueError(
                f"MHD IC shape {self.U.shape} != (5, {self.grid.n_cell})"
            )
        for d, b in enumerate(self.Bf):
            if b.shape != self.grid.n_cell:
                raise ValueError(
                    f"face-B IC axis {d}: shape {b.shape} != {self.grid.n_cell}"
                )
        self.init_sums = np.asarray(self._sums())
        self.init_divb = float(self._divb_jit(self.Bf))

    def _sums(self):
        vol = self.grid.cell_volume()
        s = jnp.sum(self.U, axis=(1, 2, 3)) * vol
        B_cc = b_cell_from_faces(self.Bf)
        emag = 0.5 * jnp.sum(B_cc * B_cc) * vol
        return jnp.concatenate([s, emag[None]])

    # ---------------------------------------------------------------- evolve
    def _maybe_io(self):
        # plotfile BEFORE checkpoint (reference ordering constraint,
        # upstream issue #554; src/simulation.hpp:929-941)
        if (self.plotfile_interval > 0
                and self.istep % self.plotfile_interval == 0):
            from ..io.plotfile import write_plotfile_mhd

            write_plotfile_mhd(self)
        if (self.checkpoint_interval > 0
                and self.istep % self.checkpoint_interval == 0):
            from ..io.checkpoint import write_checkpoint_mhd

            write_checkpoint_mhd(self)

    def _next_io_steps(self) -> int:
        """Steps until the next plotfile/checkpoint event (inf if none)."""
        best = 10**9
        for iv in (self.plotfile_interval, self.checkpoint_interval):
            if iv > 0:
                best = min(best, iv - self.istep % iv)
        return best

    def evolve(self):
        t0 = time.monotonic()
        while self.t < self.stop_time and self.istep < self.max_timesteps:
            K = min(self.fused_window, self.max_timesteps - self.istep,
                    self._next_io_steps())
            # round down to a power of two: the window program is
            # compiled per K (static scan length), so an arbitrary K
            # schedule would recompile on every odd remainder
            K = 1 << (K.bit_length() - 1) if K > 0 else 0
            if K > 1 and not self.verbose:
                # device-side window: one host sync per K steps
                U, Bf, tf, dts = self._window_jit(
                    self.U, self.Bf, jnp.asarray(self.t, jnp.float64), K
                )
                dts = np.asarray(dts)
                n_done = int(np.count_nonzero(dts > 0.0))
                if n_done == 0:
                    break
                self.U, self.Bf = U, Bf
                self.t = float(tf)
                self.istep += n_done
                self.cell_updates += n_done * self.grid.num_cells
                self._maybe_io()
                continue
            sig = float(self._signal_jit(self.U, self.Bf))
            dt = self.cfl * self.grid.dx_min / sig
            dt = min(dt, self.stop_time - self.t)
            if self.verbose:
                print(
                    f"MHD STEP {self.istep + 1} t = {self.t:.6e} dt = {dt:.6e}"
                )
            self.U, self.Bf = self._step_jit(
                self.U, self.Bf, jnp.asarray(dt, self.dtype)
            )
            self.t += dt
            self.istep += 1
            self.cell_updates += self.grid.num_cells
            self._maybe_io()

        jax.block_until_ready(self.U)
        wall = time.monotonic() - t0
        if self.cell_updates and self.verbose:
            us = wall / self.cell_updates * 1e6
            print(
                f"Performance figure-of-merit: {us:.6f} μs/zone-update "
                f"[={1.0 / us if us > 0 else 0.0:.3f} Mupdates/s]"
            )
        self.final_divb = float(self._divb_jit(self.Bf))
        if self.verbose:
            s1 = np.asarray(self._sums())
            for name, i in (("mass", 0), ("energy", 4)):
                rel = (s1[i] - self.init_sums[i]) / max(abs(self.init_sums[i]), 1e-300)
                print(f"\trelative {name} conservation error = {rel:.3e}")
            print(f"\tmax |div B| = {self.final_divb:.3e} "
                  f"(initial {self.init_divb:.3e})")

    # ------------------------------------------------------------ accessors
    @property
    def B_cc(self) -> jnp.ndarray:
        return b_cell_from_faces(self.Bf)
