"""Driver for linear-advection problems (reference `AdvectionSimulation`)."""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..boundaries import fill_ghosts
from ..config import ParmParse
from ..grid import Grid
from ..indices import StateLayout
from ..registry import Problem
from ..simulation import Simulation
from ..stencil import ghost_widths
from . import system


class AdvectionSimulation(Simulation):
    """Scalar advection with the problem-supplied constant velocity
    (`problem.advection_velocity`, a 3-tuple)."""

    def _build_compiled(self):
        vel = tuple(float(v) for v in getattr(self.problem, "advection_velocity", (1.0, 0.0, 0.0)))
        order = self.pp.get_int("advection.reconstruction_order", 3)
        ng = self.ng
        active = self.grid.active_axes
        dx = self.grid.dx
        self._vel = vel

        def fill(u):
            return fill_ghosts(
                u, ng, self.problem.bcs, self.layout,
                problem=self.problem, grid=self.grid,
            )

        def step(u, dt):
            u_new = system.advance_advection_rk2(
                u, dt, vel, dx, active, order, fill, ng
            )
            smax = jnp.asarray(max(abs(v) for v in vel), u.dtype)
            return u_new, {
                "max_signal": smax,
                "valid": jnp.all(jnp.isfinite(u_new)),
                "n_fofc": jnp.int32(0),
            }

        self._step_jit = jax.jit(step)
        self._max_signal_jit = jax.jit(
            lambda u: jnp.asarray(max(abs(v) for v in vel), u.dtype)
        )
        self._sums_jit = jax.jit(
            lambda u: jnp.sum(u, axis=(1, 2, 3)) * self.grid.cell_volume()
        )

    def set_initial_conditions(self):
        u = self.problem.set_initial_conditions(self.grid)
        u = jnp.asarray(u, dtype=self.dtype)
        if u.ndim == 3:
            u = u[None]
        self.U = u
        self.init_sums = np.asarray(self._sums_jit(u))

    def _compute_error_norm(self):
        ref = self.problem.compute_reference_solution(self)
        if ref is None:
            return
        ref = jnp.asarray(ref, dtype=self.dtype)
        if ref.ndim == 3:
            ref = ref[None]
        resid = jnp.abs(ref - self.U)
        self.error_norm = float(jnp.sum(resid) / jnp.sum(jnp.abs(ref)))
        if self.verbose:
            print(f"Relative L1 error norm = {self.error_norm:.6e}")

    def _conservation_audit(self):
        final = np.asarray(self._sums_jit(self.U))
        init = self.init_sums
        self.conservation_abs_err = final - init
        with np.errstate(divide="ignore", invalid="ignore"):
            self.conservation_rel_err = np.where(init != 0, (final - init) / init, np.nan)
