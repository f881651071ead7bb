"""Chemical networks: stiff integrator + primordial hydrogen network.

TPU-native rebuild of the reference's chemistry subsystem
(``src/chemistry/Chemistry.hpp:31-173``, which burns the Microphysics
`primordial_chem` VODE network per cell under Strang splitting, with
mass-fraction renormalization and electron charge conservation): here the
stiff per-cell ODE solve is a batched backward-Euler with a full Newton
iteration -- the species Jacobian is obtained with `jax.jacfwd` and the
small linear systems solved batched, so the whole grid burns in one fused
kernel. Networks are plugged in as pure rhs functions; the bundled
primordial hydrogen network (H, H+, e-) uses the standard collisional
ionization / case-B recombination rate fits and serves as the scaffold the
full 12-species primordial network drops into.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from ..indices import RHO, SCALAR0


def backward_euler_newton(
    rhs: Callable,
    y0: jnp.ndarray,
    dt,
    params=None,
    n_subcycles: int = 8,
    n_newton: int = 8,
):
    """Integrate dy/dt = rhs(y, params) for a batch of small stiff systems.

    y0: [..., n_species]. Each backward-Euler substep solves
    y_{k+1} = y_k + h f(y_{k+1}) with Newton iterations; the species
    Jacobian comes from jax.jacfwd and the [n,n] solves are batched.
    Subcycling (fixed count) provides robustness for strongly stiff cells
    (the reference's VODE adapts; a fixed ladder is jit-stable)."""
    n = y0.shape[-1]
    h = dt / n_subcycles
    eye = jnp.eye(n, dtype=y0.dtype)

    flat = y0.reshape(-1, n)
    p_flat = None
    if params is not None:
        p_flat = jax.tree_util.tree_map(lambda a: jnp.broadcast_to(a, y0.shape[:-1]).reshape(-1), params)

    def cell_rhs(y, p):
        return rhs(y, p)

    jac = jax.jacfwd(cell_rhs)

    def substep(y, p):
        def newton_body(_, yk):
            f = cell_rhs(yk, p)
            J = jac(yk, p)
            A = eye - h * J
            r = yk - y - h * f
            dy = jnp.linalg.solve(A, r)
            return jnp.maximum(yk - dy, 0.0)  # species stay non-negative

        return lax.fori_loop(0, n_newton, newton_body, y)

    def advance_cell(y, p):
        def body(_, yk):
            return substep(yk, p)

        return lax.fori_loop(0, n_subcycles, body, y)

    out = jax.vmap(advance_cell)(flat, p_flat)
    return out.reshape(y0.shape)


# ------------------------------------------------ primordial hydrogen network
@dataclass(frozen=True)
class PrimordialHydrogen:
    """H / H+ / e- network: collisional ionization + case-B recombination.

    Rates (standard fits, cgs):
      k_ci(T)    = 5.85e-11 sqrt(T) exp(-157809.1/T) / (1 + sqrt(T/1e5))
      alpha_B(T) = 2.59e-13 (T/1e4)^-0.7
    Species vector y = [n_HI, n_HII, n_e] (number densities, cm^-3).
    """

    @staticmethod
    def k_ci(T):
        return 5.85e-11 * jnp.sqrt(T) * jnp.exp(-157809.1 / T) / (1.0 + jnp.sqrt(T / 1.0e5))

    @staticmethod
    def alpha_B(T):
        return 2.59e-13 * (T / 1.0e4) ** (-0.7)

    def rhs(self, y, T):
        nHI, nHII, ne = y[0], y[1], y[2]
        ion = self.k_ci(T) * nHI * ne
        rec = self.alpha_B(T) * nHII * ne
        dHI = rec - ion
        dHII = ion - rec
        dne = ion - rec
        return jnp.stack([dHI, dHII, dne])

    def equilibrium_ion_fraction(self, T):
        """x = n_HII/n_H at coronal equilibrium: k_ci (1-x) = alpha x."""
        k = self.k_ci(T)
        a = self.alpha_B(T)
        return k / (k + a)


def renormalize_species(y: jnp.ndarray, n_total, charge: Sequence[float]):
    """Reference-parity cleanup after a burn (``Chemistry.hpp:123-140``):
    rescale so the conserved total matches, and enforce charge neutrality
    by setting n_e from the ion charges."""
    nH = y[..., 0] + y[..., 1]
    scale = n_total / jnp.maximum(nH, 1e-300)
    y = y.at[..., 0].multiply(scale).at[..., 1].multiply(scale)
    ne = sum(float(c) * y[..., i] for i, c in enumerate(charge) if c > 0)
    return y.at[..., -1].set(ne)
