"""Grackle-format and Cloudy-format cooling-table readers + evaluation.

TPU-native rebuild of the reference's tabulated-cooling subsystem:

- ``src/cooling/GrackleDataReader.cpp``: Grackle-format HDF5 files --
  datasets ``/CoolingRates/{Primordial,Metals}/{Cooling,Heating}`` (plus
  ``MMW`` for Primordial), with the grid axes stored as HDF5 *attributes*
  (``Rank``, ``Dimension``, ``Parameter1`` = nH, ``Temperature``) on each
  dataset.
- ``src/cooling/CloudyDataReader.cpp``: cloudy_cooling_tools files --
  root datasets ``/Cooling``, ``/Heating``, ``/MMW`` with the axes as root
  datasets ``/Parameter1`` (nH) and ``/Temperature``.
- ``src/cooling/GrackleLikeCooling.hpp:94-139`` /
  ``TabulatedCooling.hpp:80-100``: the cooling function
  Edot = rhoH^2/mh^2 * (Heat - Cool) interpolated bilinearly in
  (log10 nH, log10 T), plus photoelectric heating (Wolfire et al. 2003)
  and CMB Compton cooling; mu(nH,T) table closes T(Egas) by root-finding.

Evaluation is fully vectorized jnp (bilinear gather interpolation); the
T(Egas) inversion is a fixed-count bisection over log T (jit-stable; the
reference uses TOMS748 per cell).  Tables load once on the host via h5py
and live as device-resident constants.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..indices import EGAS, EINT, MX1, MX2, MX3, RHO

# constants matching the reference (GrackleLikeCooling.hpp:36-46)
CLOUDY_H_MASS_FRACTION = 1.0 / (1.0 + 0.1 * 3.971)
X_H = CLOUDY_H_MASS_FRACTION
Z_METAL = 0.02
Y_HE = 1.0 - X_H - Z_METAL
MEAN_METALS_A = 16.0
SIGMA_T = 6.6524e-25
M_ELECTRON = 9.1093897e-28
M_PROTON = 1.672621777e-24
MH_GRACKLE = 1.67e-24  # Grackle's CoolUnit hydrogen mass
T_CMB = 2.725
A_RAD = 7.5646e-15
K_B = 1.380649e-16
C_LIGHT = 2.99792458e10
E_CMB = A_RAD * T_CMB**4


@dataclass(frozen=True)
class CoolingTables2D:
    """Device-resident 2D cooling tables in (log10 nH, log10 T)."""

    log_nH: jnp.ndarray        # [n]
    log_T: jnp.ndarray         # [m]
    log_cool: jnp.ndarray      # [n, m] log10(Lambda_cool / mh^2) net-of-units
    log_heat: jnp.ndarray      # [n, m]
    mmw: jnp.ndarray           # [n, m] mean molecular weight (dimensionless)
    T_min: float = 0.0         # table temperature range (plain floats so the
    T_max: float = 0.0         # evaluation never concretizes a traced array)

    def __hash__(self):
        return hash((self.log_nH.shape, self.log_T.shape, self.T_min, self.T_max))

    def __eq__(self, other):
        return self is other


_LOG_SMALL = -99.0


def _safe_log10(a):
    a = np.asarray(a, dtype=np.float64)
    out = np.full(a.shape, _LOG_SMALL)
    np.log10(a, out=out, where=a > 0)
    return out


def read_grackle_tables(path: str) -> CoolingTables2D:
    """Read a Grackle-format HDF5 file (reference `initialize_cloudy_data`,
    ``GrackleDataReader.cpp:34-258``; primordial + metal groups combined
    into net cool/heat the way `cloudy_cooling_function` sums them)."""
    import h5py

    with h5py.File(path, "r") as f:
        if "old_style" in f.attrs:
            raise ValueError("Old-style Grackle data tables are not supported")

        def load(group, name):
            ds = f[f"/CoolingRates/{group}/{name}"]
            rank = int(np.asarray(ds.attrs["Rank"]).item())
            if rank != 2:
                raise ValueError(
                    f"only rank-2 (nH, T) Grackle tables supported, got rank {rank}"
                )
            nH = np.asarray(ds.attrs["Parameter1"], dtype=np.float64)
            T = np.asarray(ds.attrs["Temperature"], dtype=np.float64)
            return nH, T, np.asarray(ds, dtype=np.float64).reshape(len(nH), len(T))

        nH, T, prim_cool = load("Primordial", "Cooling")
        _, _, prim_heat = load("Primordial", "Heating")
        try:
            _, _, metal_cool = load("Metals", "Cooling")
            _, _, metal_heat = load("Metals", "Heating")
        except KeyError:
            metal_cool = np.zeros_like(prim_cool)
            metal_heat = np.zeros_like(prim_cool)
        mmw_ds = f["/CoolingRates/Primordial/MMW"]
        mmw = np.asarray(mmw_ds, dtype=np.float64).reshape(prim_cool.shape)

    # net tables: the reference keeps the four tables separate and sums the
    # pow10s (GrackleLikeCooling.hpp:101-107); combining them here is
    # algebraically identical and halves the interpolation gathers
    cool = prim_cool + metal_cool
    heat = prim_heat + metal_heat
    return CoolingTables2D(
        log_nH=jnp.asarray(_safe_log10(nH)),
        log_T=jnp.asarray(_safe_log10(T)),
        log_cool=jnp.asarray(_safe_log10(cool / MH_GRACKLE**2)),
        log_heat=jnp.asarray(_safe_log10(heat / MH_GRACKLE**2)),
        mmw=jnp.asarray(mmw),
        T_min=float(T.min()),
        T_max=float(T.max()),
    )


def read_cloudy_tables(path: str) -> CoolingTables2D:
    """Read a cloudy_cooling_tools-format HDF5 file (reference
    `initialize_cloudy_data`, ``CloudyDataReader.cpp:40-210``)."""
    import h5py

    with h5py.File(path, "r") as f:
        ds = f["/Cooling"]
        rank_attr = ds.attrs.get("Rank")
        if rank_attr is not None and int(np.asarray(rank_attr).item()) != 2:
            raise ValueError("only rank-2 (nH, T) Cloudy tables supported")
        nH = np.asarray(f["/Parameter1"], dtype=np.float64)
        T = np.asarray(f["/Temperature"], dtype=np.float64)
        shape = (len(nH), len(T))
        cool = np.asarray(f["/Cooling"], dtype=np.float64).reshape(shape)
        heat = np.asarray(f["/Heating"], dtype=np.float64).reshape(shape)
        mmw = np.asarray(f["/MMW"], dtype=np.float64).reshape(shape)

    return CoolingTables2D(
        log_nH=jnp.asarray(_safe_log10(nH)),
        log_T=jnp.asarray(_safe_log10(T)),
        log_cool=jnp.asarray(_safe_log10(cool / MH_GRACKLE**2)),
        log_heat=jnp.asarray(_safe_log10(heat / MH_GRACKLE**2)),
        mmw=jnp.asarray(mmw),
        T_min=float(T.min()),
        T_max=float(T.max()),
    )


# ------------------------------------------------------------- interpolation
def _interp2d(x, y, xg, yg, F):
    """Bilinear interpolation of F[ix, iy] at (x, y), clamped to the table
    (reference ``src/math/Interpolate2D.hpp``)."""
    ix = jnp.clip(jnp.searchsorted(xg, x) - 1, 0, xg.shape[0] - 2)
    iy = jnp.clip(jnp.searchsorted(yg, y) - 1, 0, yg.shape[0] - 2)
    x0, x1 = xg[ix], xg[ix + 1]
    y0, y1 = yg[iy], yg[iy + 1]
    tx = jnp.clip((x - x0) / (x1 - x0), 0.0, 1.0)
    ty = jnp.clip((y - y0) / (y1 - y0), 0.0, 1.0)
    f00 = F[ix, iy]
    f10 = F[ix + 1, iy]
    f01 = F[ix, iy + 1]
    f11 = F[ix + 1, iy + 1]
    return ((1 - tx) * (1 - ty) * f00 + tx * (1 - ty) * f10
            + (1 - tx) * ty * f01 + tx * ty * f11)


# ---------------------------------------------------------- cooling function
def cooling_rate(rho, T, tables: CoolingTables2D):
    """Net volumetric heating rate Edot [erg cm^-3 s^-1] (reference
    `cloudy_cooling_function`, ``GrackleLikeCooling.hpp:94-139``)."""
    rhoH = rho * CLOUDY_H_MASS_FRACTION
    nH = rhoH / (M_PROTON + M_ELECTRON)
    log_nH = jnp.log10(nH)
    log_T = jnp.log10(T)

    log_cool = _interp2d(log_nH, log_T, tables.log_nH, tables.log_T, tables.log_cool)
    log_heat = _interp2d(log_nH, log_T, tables.log_nH, tables.log_T, tables.log_heat)
    net_lambda = 10.0**log_heat - 10.0**log_cool
    Edot = (rhoH * rhoH) * net_lambda

    mu = _interp2d(log_nH, log_T, tables.log_nH, tables.log_T, tables.mmw)

    # electron density incl. metal contribution (GrackleLikeCooling.hpp:116-120)
    n_e = ((rho / (M_PROTON + M_ELECTRON))
           * (1.0 - mu * (X_H + Y_HE / 4.0 + Z_METAL / MEAN_METALS_A))
           / (mu - M_ELECTRON / (M_PROTON + M_ELECTRON)))
    n_e = jnp.maximum(n_e, 1.0e-4 * nH)

    # photoelectric heating (Wolfire et al. 2003)
    Tsqrt = jnp.sqrt(T)
    phi = 0.5
    G_0 = 1.7
    x_pe = G_0 * Tsqrt / (n_e * phi)
    epsilon = (4.9e-2 / (1.0 + 4.0e-3 * x_pe**0.73)
               + 3.7e-2 * (T / 1.0e4) ** 0.7 / (1.0 + 2.0e-4 * x_pe))
    Edot = Edot + 1.3e-24 * nH * epsilon * G_0

    # CMB Compton cooling (Hirata 2018)
    Gamma_C = (8.0 * SIGMA_T * E_CMB) / (3.0 * M_ELECTRON * C_LIGHT)
    C_n = Gamma_C * K_B / (5.0 / 3.0 - 1.0)
    Edot = Edot - C_n * (T - T_CMB) * n_e

    return Edot


def mmw_at(rho, T, tables: CoolingTables2D):
    rhoH = rho * CLOUDY_H_MASS_FRACTION
    nH = rhoH / (M_PROTON + M_ELECTRON)
    return _interp2d(jnp.log10(nH), jnp.log10(T),
                     tables.log_nH, tables.log_T, tables.mmw)


def egas_from_tgas(rho, T, gamma, tables: CoolingTables2D):
    """Eint(rho, T) with the table's mu(nH, T) (reference
    `ComputeEgasFromTgas`, ``GrackleLikeCooling.hpp:141-153``)."""
    mu = mmw_at(rho, T, tables)
    return (rho / ((M_PROTON + M_ELECTRON) * mu)) * K_B * T / (gamma - 1.0)


def tgas_from_egas(rho, Egas, gamma, tables: CoolingTables2D, n_iter: int = 40):
    """T(rho, Eint): solve mu(T) * C == T by bisection in log T (reference
    `ComputeTgasFromEgas` uses TOMS748, ``GrackleLikeCooling.hpp:155-221``;
    a fixed-count bisection is the jit-stable equivalent -- 40 halvings of
    the full table range resolve T to ~1e-10 relative)."""
    rhoH = rho * CLOUDY_H_MASS_FRACTION
    nH = rhoH / (M_PROTON + M_ELECTRON)
    log_nH = jnp.log10(nH)
    C = (gamma - 1.0) * Egas / (K_B * (rho / (M_PROTON + M_ELECTRON)))

    lo = jnp.full_like(C, tables.log_T[0])
    hi = jnp.full_like(C, tables.log_T[-1])

    def f(logT):
        mu = _interp2d(log_nH, logT, tables.log_nH, tables.log_T, tables.mmw)
        return C * mu - 10.0**logT

    f_lo = f(lo)

    def body(_, carry):
        lo, hi, f_lo = carry
        mid = 0.5 * (lo + hi)
        f_mid = f(mid)
        same = jnp.sign(f_mid) == jnp.sign(f_lo)
        lo_new = jnp.where(same, mid, lo)
        f_lo_new = jnp.where(same, f_mid, f_lo)
        hi_new = jnp.where(same, hi, mid)
        return lo_new, hi_new, f_lo_new

    lo, hi, _ = jax.lax.fori_loop(0, n_iter, body, (lo, hi, f_lo))
    T = 10.0 ** (0.5 * (lo + hi))
    # out-of-table clamps (reference :162-170)
    Emin = egas_from_tgas(rho, tables.T_min, gamma, tables)
    Emax = egas_from_tgas(rho, tables.T_max, gamma, tables)
    T = jnp.where(Egas <= Emin, tables.T_min, T)
    T = jnp.where(Egas >= Emax, tables.T_max, T)
    return T


# ------------------------------------------------------------ Strang source
def strang_cooling_step_tabulated(
    U: jnp.ndarray,
    dt,
    gamma: float,
    tables: CoolingTables2D,
    T_floor: float = 2.73,
    rtol: float = 1.0e-4,
):
    """Strang-split tabulated-cooling update (reference `computeCooling`,
    ``GrackleLikeCooling.hpp:242-310`` / ``TabulatedCooling.hpp``): RK12
    integration of dEint/dt = Edot(rho, T(Eint)) with a T floor.
    Returns (U_new, ok)."""
    from .ode import rk_adaptive_integrate

    rho = U[RHO]
    ke = 0.5 * (U[MX1] ** 2 + U[MX2] ** 2 + U[MX3] ** 2) / rho
    eint0 = U[EGAS] - ke
    eint_floor = egas_from_tgas(rho, jnp.maximum(T_floor, tables.T_min),
                                gamma, tables)

    def rhs(eint, rho_):
        T = tgas_from_egas(rho_, jnp.maximum(eint, eint_floor), gamma, tables)
        dedt = cooling_rate(rho_, T, tables)
        return jnp.where(eint <= eint_floor, jnp.maximum(dedt, 0.0), dedt)

    eint1, ok = rk_adaptive_integrate(rhs, eint0, 0.0, dt, params=rho, rtol=rtol)
    eint1 = jnp.maximum(eint1, eint_floor)
    out = U.at[EGAS].set(ke + eint1)
    out = out.at[EINT].add(eint1 - eint0)
    return out, jnp.all(ok)


# ------------------------------------------------------- synthetic test data
def write_synthetic_grackle_file(path: str, *, n_nH: int = 8, n_T: int = 64,
                                 mu0: float = 0.6):
    """Write a small Grackle-format file with an analytically-known cooling
    curve (for tests; the real files are the Grackle data releases)."""
    import h5py

    nH = np.logspace(-6, 4, n_nH)
    T = np.logspace(1, 9, n_T)
    # Lambda/nH^2-style curve in erg cm^3/s (the units real Grackle files
    # store; the reader divides by mh^2 = Grackle's CoolUnit at z=0):
    # power-law bump peaked near 1e5 K
    lam = 1.0e-22 * (T / 1.0e5) ** 0.5 / (1.0 + (T / 1.0e6) ** 2)
    cool = np.broadcast_to(lam, (n_nH, n_T)).copy()
    heat = np.full_like(cool, 1.0e-26)
    mmw = np.full((n_nH, n_T), mu0)

    with h5py.File(path, "w") as f:
        for group, c, h in (("Primordial", cool, heat),
                            ("Metals", 0.1 * cool, 0.1 * heat)):
            for name, data in (("Cooling", c), ("Heating", h)):
                ds = f.create_dataset(f"/CoolingRates/{group}/{name}",
                                      data=data)
                ds.attrs["Rank"] = np.int64(2)
                ds.attrs["Dimension"] = np.asarray([n_nH, n_T], dtype=np.int64)
                ds.attrs["Parameter1"] = nH
                ds.attrs["Temperature"] = T
        f.create_dataset("/CoolingRates/Primordial/MMW", data=mmw)
    return nH, T, lam


def write_synthetic_cloudy_file(path: str, *, n_nH: int = 8, n_T: int = 64,
                                mu0: float = 0.6):
    """Write a small cloudy_cooling_tools-format file (root datasets)."""
    import h5py

    nH = np.logspace(-6, 4, n_nH)
    T = np.logspace(1, 9, n_T)
    lam = 1.0e-22 * (T / 1.0e5) ** 0.5 / (1.0 + (T / 1.0e6) ** 2)
    cool = np.broadcast_to(lam, (n_nH, n_T)).copy()
    heat = np.full_like(cool, 1.0e-26)
    mmw = np.full((n_nH, n_T), mu0)

    with h5py.File(path, "w") as f:
        ds = f.create_dataset("/Cooling", data=cool)
        ds.attrs["Rank"] = np.int64(2)
        f.create_dataset("/Heating", data=heat)
        f.create_dataset("/MMW", data=mmw)
        f.create_dataset("/Parameter1", data=nH)
        f.create_dataset("/Temperature", data=T)
    return nH, T, lam
