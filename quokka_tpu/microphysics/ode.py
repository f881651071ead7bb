"""Adaptive RK12 (Heun + embedded Euler) ODE integrator.

TPU-native rebuild of the reference's `rk_adaptive_integrate`
(``src/math/ODEIntegrate.hpp:127``): integrates y' = f(y, params) over a
fixed interval with adaptive step control from the embedded first-order
error estimate. Vectorized over an arbitrary batch of cells: one
`lax.while_loop` advances every cell with its own adaptive dt (per-cell
carry), so the compiled kernel is identical work to the reference's
per-thread loops.

Used by the cooling modules (du/dt = -Lambda) exactly as the reference's
`computeCooling` uses rk_adaptive_integrate.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax import lax


def rk_adaptive_integrate(
    rhs: Callable,
    y0: jnp.ndarray,
    t0,
    t1,
    params=None,
    rtol: float = 1.0e-4,
    atol_scale: float = 1.0e-10,
    max_steps: int = 10000,
):
    """Integrate y' = rhs(y, params) from t0 to t1 per-element.

    y0: arbitrary-shape array (one independent ODE per element).
    params: pytree of arrays broadcastable to y0 (e.g. density fields).
    Returns (y_final, success_mask).
    """
    dt_total = t1 - t0
    y0 = jnp.asarray(y0)
    atol = atol_scale * jnp.abs(y0) + 1e-300

    def f(y):
        return rhs(y, params)

    def cond(carry):
        n, t, y, dt, done, _fail = carry
        return jnp.logical_and(n < max_steps, jnp.logical_not(jnp.all(done)))

    def body(carry):
        n, t, y, dt, done, fail = carry
        dt_eff = jnp.minimum(dt, dt_total - t)

        k1 = f(y)
        y_euler = y + dt_eff * k1
        k2 = f(y_euler)
        y_heun = y + 0.5 * dt_eff * (k1 + k2)

        err = jnp.abs(y_heun - y_euler)
        tol = rtol * jnp.abs(y_heun) + atol
        accept = err <= tol

        new_t = jnp.where(done, t, jnp.where(accept, t + dt_eff, t))
        new_y = jnp.where(done, y, jnp.where(accept, y_heun, y))

        # step-size controller: the embedded estimate is order 1, so the
        # optimal step scales as sqrt(tol/err) (safety factor 0.9)
        ratio = tol / jnp.maximum(err, 1e-300)
        scale = jnp.clip(0.9 * jnp.sqrt(ratio), 0.2, 5.0)
        new_dt = jnp.where(done, dt, dt_eff * scale)
        new_dt = jnp.maximum(new_dt, 1e-14 * dt_total)

        new_done = done | (new_t >= dt_total * (1.0 - 1e-13))
        return (n + 1, new_t, new_y, new_dt, new_done, fail)

    t_init = jnp.zeros_like(y0)
    dt_init = jnp.full_like(y0, dt_total * 1e-2)
    done0 = jnp.zeros_like(y0, dtype=bool)
    n, t, y, dt, done, fail = lax.while_loop(
        cond, body, (jnp.int32(0), t_init, y0, dt_init, done0, False)
    )
    return y, done
