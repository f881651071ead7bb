"""Classic hydro test problems (catalog breadth).

Rebuilds of the reference's 1D/2D hydro validation problems:
  - Shu & Osher (1989) shock/entropy-wave interaction
    (``src/problems/HydroShuOsher``)
  - slow-moving shock (Jones et al. test; ``src/problems/HydroSMS``)
  - pressureless high-Mach collapse (``src/problems/HydroHighMach``)
  - double-rarefaction vacuum and stationary contact
    (``src/problems/HydroVacuum``, ``src/problems/HydroContact``)
  - Quirk's odd-even decoupling (carbuncle) test, 2D
    (``src/problems/HydroQuirk``)
"""

from __future__ import annotations

import jax.numpy as jnp

from ..indices import EGAS, EINT, MX1, RHO
from ..registry import (
    BC_OUTFLOW,
    BC_PERIODIC,
    BC_USER,
    BCSpec,
    EOSTraits,
    HydroTraits,
    PhysicsTraits,
    Problem,
    register_problem,
)


def _prim_state(grid, rho, vx, P, gamma):
    shape = grid.n_cell
    rho = jnp.broadcast_to(rho, shape)
    vx = jnp.broadcast_to(vx, shape)
    P = jnp.broadcast_to(P, shape)
    eint = P / (gamma - 1.0)
    zeros = jnp.zeros(shape)
    return jnp.stack([rho, rho * vx, zeros, zeros,
                      eint + 0.5 * rho * vx * vx, eint])


def _set_prim_slab(Ug, sl, rho, vx, P, gamma):
    eint = P / (gamma - 1.0)
    Ug = Ug.at[RHO, sl].set(rho)
    Ug = Ug.at[MX1, sl].set(rho * vx)
    Ug = Ug.at[MX1 + 1, sl].set(0.0)
    Ug = Ug.at[MX1 + 2, sl].set(0.0)
    Ug = Ug.at[EGAS, sl].set(eint + 0.5 * rho * vx * vx)
    Ug = Ug.at[EINT, sl].set(eint)
    return Ug


@register_problem
class ShuOsherProblem(Problem):
    """Mach-3 shock running into a sinusoidal entropy wave (Shu & Osher
    1989); reference deck: domain [0, 10], t_end = 1.8, gamma = 1.4."""

    name = "HydroShuOsher"
    physics = PhysicsTraits(hydro_enabled=True)
    eos_traits = EOSTraits(gamma=1.4)
    bcs = BCSpec(x=(BC_USER, BC_USER))

    RHO_L, VX_L, P_L = 3.857143, 2.629369, 10.33333

    def set_initial_conditions(self, grid):
        x, _y, _z = grid.cell_center_mesh()
        g = self.eos_traits.gamma
        left = x < 1.0
        rho = jnp.where(left, self.RHO_L, 1.0 + 0.2 * jnp.sin(5.0 * x))
        vx = jnp.where(left, self.VX_L, 0.0)
        P = jnp.where(left, self.P_L, 1.0)
        return _prim_state(grid, rho, vx, P, g)

    def fill_user_boundary(self, Ug, grid, ng, time, axis, side):
        if axis != 0:
            return Ug
        g = ng[0]
        gamma = self.eos_traits.gamma
        if side == 0:
            return _set_prim_slab(Ug, slice(0, g), self.RHO_L, self.VX_L,
                                  self.P_L, gamma)
        n = Ug.shape[1]
        x_hi = 10.0  # rho = 1 + 0.2 sin(5 x) evaluated at the edge
        return _set_prim_slab(Ug, slice(n - g, n),
                              1.0 + 0.2 * jnp.sin(5.0 * x_hi), 0.0, 1.0, gamma)


@register_problem
class SlowMovingShockProblem(Problem):
    """Slow-moving shock (v_shock = 0.1096): tests against the exact
    translated jump at t = 1 with the reference's 0.5% L1 criterion
    (``src/problems/HydroSMS/test_hydro_sms.cpp:230-296``)."""

    name = "HydroSMS"
    physics = PhysicsTraits(hydro_enabled=True)
    eos_traits = EOSTraits(gamma=1.4)
    bcs = BCSpec(x=(BC_USER, BC_USER))

    L = (3.86, -0.81, 10.3334)
    R = (1.0, -3.44, 1.0)
    VSHOCK = 0.1096

    def set_initial_conditions(self, grid):
        x, _y, _z = grid.cell_center_mesh()
        g = self.eos_traits.gamma
        left = x < 0.5
        rho = jnp.where(left, self.L[0], self.R[0])
        vx = jnp.where(left, self.L[1], self.R[1])
        P = jnp.where(left, self.L[2], self.R[2])
        return _prim_state(grid, rho, vx, P, g)

    def fill_user_boundary(self, Ug, grid, ng, time, axis, side):
        if axis != 0:
            return Ug
        g = ng[0]
        gamma = self.eos_traits.gamma
        if side == 0:
            return _set_prim_slab(Ug, slice(0, g), *self.L, gamma)
        n = Ug.shape[1]
        return _set_prim_slab(Ug, slice(n - g, n), *self.R, gamma)

    def exact_solution(self, x, t):
        import numpy as np

        left = x < 0.5 + self.VSHOCK * t
        rho = np.where(left, self.L[0], self.R[0])
        vx = np.where(left, self.L[1], self.R[1])
        P = np.where(left, self.L[2], self.R[2])
        return rho, vx, P


@register_problem
class HighMachProblem(Problem):
    """Pressureless high-Mach sinusoidal collapse (P = 1e-10): stresses
    positivity and the dual-energy machinery at Mach ~ 1e5."""

    name = "HydroHighMach"
    physics = PhysicsTraits(hydro_enabled=True)
    eos_traits = EOSTraits(gamma=5.0 / 3.0)
    bcs = BCSpec()  # periodic

    def set_initial_conditions(self, grid):
        x, _y, _z = grid.cell_center_mesh()
        g = self.eos_traits.gamma
        vx = jnp.sin(2.0 * jnp.pi * x)
        return _prim_state(grid, 1.0, vx, 1.0e-10, g)


@register_problem
class HydroVacuumProblem(Problem):
    """Double rarefaction into (near-)vacuum (Toro test 2)."""

    name = "HydroVacuum"
    physics = PhysicsTraits(hydro_enabled=True)
    eos_traits = EOSTraits(gamma=1.4)
    bcs = BCSpec(x=(BC_OUTFLOW, BC_OUTFLOW))

    def set_initial_conditions(self, grid):
        x, _y, _z = grid.cell_center_mesh()
        g = self.eos_traits.gamma
        vx = jnp.where(x < 0.5, -2.0, 2.0)
        return _prim_state(grid, 1.0, vx, 0.4, g)


@register_problem
class HydroContactProblem(Problem):
    """Stationary contact discontinuity: must be preserved exactly."""

    name = "HydroContact"
    physics = PhysicsTraits(hydro_enabled=True)
    eos_traits = EOSTraits(gamma=1.4)
    bcs = BCSpec(x=(BC_OUTFLOW, BC_OUTFLOW))

    def set_initial_conditions(self, grid):
        x, _y, _z = grid.cell_center_mesh()
        g = self.eos_traits.gamma
        rho = jnp.where(x < 0.5, 1.4, 1.0)
        return _prim_state(grid, rho, 0.0, 1.0, g)


@register_problem
class QuirkProblem(Problem):
    """Quirk (1994) odd-even decoupling: a strong shock with an odd-even
    perturbed column must stay planar (the Minoshima & Miyoshi 2021
    carbuncle-suppressed HLLC keeps it so); reference
    ``src/problems/HydroQuirk/test_quirk.cpp`` (PLM, t = 0.4)."""

    name = "HydroQuirk"
    physics = PhysicsTraits(hydro_enabled=True)
    eos_traits = EOSTraits(gamma=5.0 / 3.0)
    bcs = BCSpec(x=(BC_USER, BC_USER), y=(BC_PERIODIC, BC_PERIODIC))

    DL = (3.692, -0.625, 26.85)
    DR = (1.0, -5.0, 0.6)
    DD = (3.692 - 0.135, -0.625 + 0.219, 26.85 - 1.31)
    XSHOCK = 0.4

    def set_initial_conditions(self, grid):
        x, y, _z = grid.cell_center_mesh()
        g = self.eos_traits.gamma
        shape = grid.n_cell
        dx = grid.dx[0]
        left = x < self.XSHOCK
        rho = jnp.where(left, self.DL[0], self.DR[0])
        vx = jnp.where(left, self.DL[1], self.DR[1])
        P = jnp.where(left, self.DL[2], self.DR[2])
        # odd-even perturbed column at the last pre-shock cell
        i = jnp.arange(shape[0])[:, None, None]
        j = jnp.arange(shape[1])[None, :, None]
        ishock = jnp.int32(self.XSHOCK / dx) - 1
        pert = (i == ishock) & (j % 2 == 0)
        rho = jnp.where(pert, self.DD[0], jnp.broadcast_to(rho, shape))
        vx = jnp.where(pert, self.DD[1], jnp.broadcast_to(vx, shape))
        P = jnp.where(pert, self.DD[2], jnp.broadcast_to(P, shape))
        return _prim_state(grid, rho, vx, P, g)

    def fill_user_boundary(self, Ug, grid, ng, time, axis, side):
        if axis != 0:
            return Ug
        g = ng[0]
        gamma = self.eos_traits.gamma
        if side == 0:
            return _set_prim_slab(Ug, slice(0, g), *self.DL, gamma)
        n = Ug.shape[1]
        return _set_prim_slab(Ug, slice(n - g, n), *self.DR, gamma)


@register_problem
class RichtmeyerMeshkovProblem(Problem):
    """Richtmeyer-Meshkov instability (2D): a shock crossing a sinusoidally
    perturbed contact discontinuity (reference
    ``src/problems/HydroRichtmeyerMeshkov``)."""

    name = "HydroRichtmeyerMeshkov"
    physics = PhysicsTraits(hydro_enabled=True)
    eos_traits = EOSTraits(gamma=1.4)
    bcs = BCSpec(x=(BC_OUTFLOW, BC_OUTFLOW), y=(BC_PERIODIC, BC_PERIODIC))

    def set_initial_conditions(self, grid):
        x, y, _z = grid.cell_center_mesh()
        shape = grid.n_cell
        g = self.eos_traits.gamma
        # perturbed interface at x = 0.5 + 0.02 cos(2 pi y); shock at x = 0.3
        x_if = 0.5 + 0.02 * jnp.cos(2.0 * jnp.pi * y)
        heavy = jnp.broadcast_to(x > x_if, shape)
        shocked = jnp.broadcast_to(x < 0.3, shape)
        rho = jnp.where(heavy, 3.0, 1.0)
        rho = jnp.where(shocked, 2.667, rho)  # Mach-2 post-shock (gamma 1.4)
        vx = jnp.where(shocked, 1.479, 0.0)
        P = jnp.where(shocked, 4.5, 1.0)
        return _prim_state(grid, rho, vx, P, g)


@register_problem
class Blast2DProblem(Problem):
    """Cylindrical Sedov blast (2D), the reference's HydroBlast2D."""

    name = "HydroBlast2D"
    physics = PhysicsTraits(hydro_enabled=True)
    eos_traits = EOSTraits(gamma=1.4)
    bcs = BCSpec()

    def set_initial_conditions(self, grid):
        x, y, _z = grid.cell_center_mesh()
        shape = grid.n_cell
        g = self.eos_traits.gamma
        r2 = (x - 0.5) ** 2 + (y - 0.5) ** 2
        P = jnp.where(r2 < 0.01, 10.0, 0.1)
        return _prim_state(grid, 1.0, 0.0, P, g)
