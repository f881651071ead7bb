"""Tabulated radiative cooling (Strang-split energy source).

TPU-native rebuild of the reference's cooling modules
(``src/cooling/TabulatedCooling.{hpp,cpp}`` and
``GrackleLikeCooling.{hpp,cpp}``): integrate du/dt = -Lambda(rho, T)/rho
per cell over the Strang half-step with the adaptive RK12 integrator, with
a CMB temperature floor. The cooling curve is a log-log table
Lambda(log10 T) [erg cm^3 / s] per (n_H)^2, supplied by the problem or
loaded from a text table -- the reference reads Cloudy/Grackle HDF5 tables;
the table *format* here is plain arrays so any source can feed it.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..eos import IdealGasEOS, M_U_CGS
from ..indices import EGAS, EINT, MX1, MX2, MX3, RHO
from .ode import rk_adaptive_integrate


@dataclass(frozen=True)
class CoolingTable:
    """Log-log cooling curve: log10 Lambda/n_H^2 [erg cm^3/s] vs log10 T [K]."""

    log_T: tuple  # table abscissa (static tuple for hashability)
    log_lambda: tuple

    def interp(self, T):
        logT = jnp.log10(jnp.maximum(T, 1.0))
        lt = jnp.asarray(self.log_T)
        ll = jnp.asarray(self.log_lambda)
        logL = jnp.interp(logT, lt, ll)
        return 10.0**logL


def strang_cooling_step(
    U: jnp.ndarray,
    dt,
    eos: IdealGasEOS,
    table: CoolingTable,
    mean_mol_weight: float = M_U_CGS,
    T_floor: float = 2.73,
    rtol: float = 1.0e-4,
):
    """Apply the Strang-split cooling update to the conserved state
    (reference `computeCooling`: per-cell RK12 integration of
    de/dt = -Lambda(T) n_H^2 / rho, with a temperature floor)."""
    rho = U[RHO]
    ke = 0.5 * (U[MX1] ** 2 + U[MX2] ** 2 + U[MX3] ** 2) / rho
    eint0 = U[EGAS] - ke

    n_H = rho / mean_mol_weight
    eint_floor = eos.eint_from_tgas(rho, T_floor)

    def rhs(eint, params):
        rho_, nH2 = params
        T = eos.tgas_from_eint(rho_, jnp.maximum(eint, eint_floor))
        lam = table.interp(T)
        dedt = -lam * nH2
        # shut off cooling at the floor
        return jnp.where(eint <= eint_floor, jnp.maximum(dedt, 0.0), dedt)

    eint1, ok = rk_adaptive_integrate(
        rhs, eint0, 0.0, dt, params=(rho, n_H * n_H), rtol=rtol
    )
    eint1 = jnp.maximum(eint1, eint_floor)
    out = U.at[EGAS].set(ke + eint1)
    out = out.at[EINT].add(eint1 - eint0)
    return out, jnp.all(ok)
