r"""Planck integral: photon-group energy fractions.

TPU-native rebuild of the reference's tabulated Planck integral
(``src/radiation/planck_integral.hpp:14-40``): the normalized integral
y(x) = (15/pi^4) \int_0^x t^3/(e^t - 1) dt is precomputed on a fine grid
with numpy at import and evaluated with `jnp.interp` (the reference uses a
1000-point tabulated interpolant the same way).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

_X_MAX = 100.0
_N_TAB = 4000


def _build_table():
    # integrand is smooth; resolve the small-x region logarithmically
    x = np.concatenate([
        np.array([0.0]),
        np.logspace(-3, np.log10(_X_MAX), _N_TAB - 1),
    ])
    t = x
    with np.errstate(over="ignore", invalid="ignore"):
        f = np.where(t > 0, t**3 / np.expm1(t), 0.0)
    # cumulative trapezoid
    y = np.concatenate([[0.0], np.cumsum(0.5 * (f[1:] + f[:-1]) * np.diff(t))])
    y *= 15.0 / np.pi**4
    return x, y


_X_TAB, _Y_TAB = _build_table()


def integrate_planck_from_0_to_x(x):
    """Normalized Planck integral y(x) in [0, 1].  Tables are cast to the
    input dtype: under jax_enable_x64 they would otherwise be f64 and
    silently promote an f32 state through every consumer (e.g. the
    multigroup Newton carry on the TPU f32 path)."""
    x = jnp.asarray(x)
    xt = jnp.asarray(_X_TAB, dtype=x.dtype)
    yt = jnp.asarray(_Y_TAB, dtype=x.dtype)
    return jnp.where(x >= _X_MAX, jnp.asarray(1.0, x.dtype),
                     jnp.interp(x, xt, yt))


def planck_energy_fractions(boundaries, T, boltzmann_constant=1.0, energy_unit=1.0):
    """Radiation energy fraction per photon group at temperature T
    (reference `ComputePlanckEnergyFractions`,
    ``radiation_system.hpp:744-771``): fractions of a T^4 between the group
    boundaries (in energy units), with the last group absorbing the
    remainder so the total is exactly 1.

    boundaries: tuple of length G+1; T: array. Returns [G, ...T.shape].
    """
    G = len(boundaries) - 1
    if G == 1:
        return jnp.ones((1, *jnp.shape(T)),
                        dtype=getattr(T, "dtype", jnp.float64))
    kT = boltzmann_constant * T
    fracs = []
    prev = jnp.zeros_like(T)
    for g in range(G - 1):
        x = boundaries[g + 1] * energy_unit / kT
        y = integrate_planck_from_0_to_x(x)
        fracs.append(y - prev)
        prev = y
    fracs.append(1.0 - prev)
    return jnp.stack(fracs)
