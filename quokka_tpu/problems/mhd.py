"""MHD problem catalog for the constrained-transport solver.

Beyond-parity problems (the reference's MHD is stub-level,
``src/hydro/mhd_system.hpp:20``); setups follow the standard MHD test
literature: Toth 2000 (circularly polarized Alfven wave), Gardiner &
Stone 2005 (field loop advection), Orszag & Tang 1979, Brio & Wu 1988.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from ..registry import register_problem


def _energy(rho, vx, vy, vz, P, bx, by, bz, gamma):
    ke = 0.5 * rho * (vx * vx + vy * vy + vz * vz)
    pb = 0.5 * (bx * bx + by * by + bz * bz)
    return P / (gamma - 1.0) + ke + pb


@register_problem
class CPAlfvenWaveProblem:
    name = "CPAlfvenWave"

    """Circularly polarized Alfven wave (Toth 2000 sec. 6.3.1): an EXACT
    nonlinear solution of ideal MHD, propagating along x at the Alfven
    speed v_A = B_x/sqrt(rho) = 1. After one period (t = L/v_A) the state
    must return to the IC; the L1 deviation measures the scheme's
    dissipation and must converge at 2nd order."""

    gamma = 5.0 / 3.0
    rho0 = 1.0
    P0 = 0.1
    Bx0 = 1.0
    amp = 0.1

    def set_initial_conditions_mhd(self, grid):
        n = grid.n_cell
        x_c = np.asarray(grid.cell_centers(0)).reshape(-1, 1, 1)
        k = 2.0 * np.pi / (grid.prob_hi[0] - grid.prob_lo[0])

        # traveling wave moving in +x: perturbations delta v = -delta B /
        # sqrt(rho) (B in sqrt(4 pi)-absorbed units)
        by = self.amp * np.sin(k * x_c)
        bz = self.amp * np.cos(k * x_c)
        vy = -by / np.sqrt(self.rho0)
        vz = -bz / np.sqrt(self.rho0)

        rho = np.full(n, self.rho0)
        vx = np.zeros(n)
        vy = np.broadcast_to(vy, n).copy()
        vz = np.broadcast_to(vz, n).copy()
        P = np.full(n, self.P0)

        # face fields: Bx on x-faces (uniform), By/Bz on y/z-faces -- the
        # transverse components vary only with x (cell-centered in x), so
        # the staggering offset is along homogeneous axes: exact, div B = 0
        Bfx = np.full(n, self.Bx0)
        Bfy = np.broadcast_to(by, n).copy()
        Bfz = np.broadcast_to(bz, n).copy()

        bx_c = np.full(n, self.Bx0)
        by_c = np.broadcast_to(by, n)
        bz_c = np.broadcast_to(bz, n)
        E = _energy(rho, vx, vy, vz, P, bx_c, by_c, bz_c, self.gamma)
        U = np.stack([rho, rho * vx, rho * vy, rho * vz, E])
        return U, [Bfx, Bfy, Bfz]


@register_problem
class FieldLoopProblem:
    name = "FieldLoop"

    """Weak magnetic field loop advected by a uniform flow (Gardiner &
    Stone 2005 sec. 5.1): beta ~ 2e6, so the loop is a passive tracer of
    the CT scheme's dissipation and div-B maintenance."""

    gamma = 5.0 / 3.0
    rho0 = 1.0
    P0 = 1.0
    v0 = (2.0, 1.0, 0.0)
    A0 = 1.0e-3
    R0 = 0.3

    def set_initial_conditions_mhd(self, grid):
        from ..mhd.simulation import faces_from_vector_potential

        n = grid.n_cell
        cx = 0.5 * (grid.prob_lo[0] + grid.prob_hi[0])
        cy = 0.5 * (grid.prob_lo[1] + grid.prob_hi[1])

        def A_z(x, y, z):
            r = jnp.sqrt((x - cx) ** 2 + (y - cy) ** 2)
            return jnp.maximum(self.A0 * (self.R0 - r), 0.0)

        Bf = [np.asarray(b) for b in
              faces_from_vector_potential(grid, (None, None, A_z))]

        rho = np.full(n, self.rho0)
        vx = np.full(n, self.v0[0])
        vy = np.full(n, self.v0[1])
        vz = np.full(n, self.v0[2])
        P = np.full(n, self.P0)
        from ..mhd.advance import b_cell_from_faces

        B_cc = np.asarray(b_cell_from_faces([jnp.asarray(b) for b in Bf]))
        E = _energy(rho, vx, vy, vz, P, B_cc[0], B_cc[1], B_cc[2], self.gamma)
        U = np.stack([rho, rho * vx, rho * vy, rho * vz, E])
        return U, Bf


@register_problem
class OrszagTangProblem:
    name = "OrszagTang"

    """Orszag-Tang vortex (the canonical 2D MHD turbulence smoke test)."""

    gamma = 5.0 / 3.0

    def set_initial_conditions_mhd(self, grid):
        from ..mhd.simulation import faces_from_vector_potential
        from ..mhd.advance import b_cell_from_faces

        n = grid.n_cell
        x_c = np.asarray(grid.cell_centers(0)).reshape(-1, 1, 1)
        y_c = np.asarray(grid.cell_centers(1)).reshape(1, -1, 1)

        rho = np.full(n, 25.0 / (36.0 * np.pi))
        P = np.full(n, 5.0 / (12.0 * np.pi))
        vx = np.broadcast_to(-np.sin(2.0 * np.pi * y_c), n).copy()
        vy = np.broadcast_to(np.sin(2.0 * np.pi * x_c), n).copy()
        vz = np.zeros(n)

        B0 = 1.0 / np.sqrt(4.0 * np.pi)

        def A_z(x, y, z):
            return B0 * (jnp.cos(4.0 * np.pi * x) / (4.0 * np.pi)
                         + jnp.cos(2.0 * np.pi * y) / (2.0 * np.pi))

        Bf = [np.asarray(b) for b in
              faces_from_vector_potential(grid, (None, None, A_z))]
        B_cc = np.asarray(b_cell_from_faces([jnp.asarray(b) for b in Bf]))
        E = _energy(rho, vx, vy, vz, P, B_cc[0], B_cc[1], B_cc[2], self.gamma)
        U = np.stack([rho, rho * vx, rho * vy, rho * vz, E])
        return U, Bf


@register_problem
class BrioWuProblem:
    name = "BrioWu"

    """Brio & Wu 1988 MHD shocktube (gamma = 2, Bx = 0.75, By: +1 -> -1),
    doubled onto a periodic domain (interface at x = 0.5; the wrap
    interface's waves stay near the boundary for t <= 0.1)."""

    gamma = 2.0

    def set_initial_conditions_mhd(self, grid):
        n = grid.n_cell
        x_c = np.asarray(grid.cell_centers(0)).reshape(-1, 1, 1)
        left = np.broadcast_to(x_c < 0.5, n)

        rho = np.where(left, 1.0, 0.125)
        P = np.where(left, 1.0, 0.1)
        by = np.where(left, 1.0, -1.0)
        v0 = np.zeros(n)

        Bfx = np.full(n, 0.75)
        Bfy = by.copy()
        Bfz = np.zeros(n)
        E = _energy(rho, v0, v0, v0, P, Bfx, by, 0.0 * by, self.gamma)
        U = np.stack([rho, v0, v0, v0, E])
        return U, [Bfx, Bfy, Bfz]
