"""Hydro level advance: flux pipeline + RK2-SSP + first-order flux correction.

TPU-native rebuild of the reference's hydro hot path
(`QuokkaSimulation::advanceHydroAtLevel` / `computeHydroFluxes` /
`hydroFluxFunction`, reference ``src/QuokkaSimulation.hpp:1033-1325,
1404-1520``):

  cons->prim -> flattening coefficients (all axes) -> per axis:
  {PPM/PLM/DC reconstruction -> flatten -> HLLC (or LLF)} -> RK2-SSP with
  PdV internal-energy source, dual-energy sync, floors.

TPU-first differences from the reference:
  - The first-order flux correction (FOFC) is branch-free: instead of a
    host-synchronized `redoFlag.sum()` + conditional redo
    (``src/QuokkaSimulation.hpp:1144-1184``), invalid-state masks select
    first-order fluxes on the affected faces and the update is recomputed
    unconditionally. Same numerics, no host round-trip, jit-stable shapes.
  - Direction sweeps are axis-parameterized slices of one padded array
    rather than index-permuted views; everything fuses into a handful of
    XLA kernels.

The whole step is pure: `(U, dt) -> (U_new, stats)`, jit-compiled by the
caller (and shard_mapped for multi-chip).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Callable, Sequence, Tuple

import jax.numpy as jnp

from ..eos import IdealGasEOS
from ..indices import (
    EGAS,
    EINT,
    MX1,
    PEINT,
    PPRES,
    PRHO,
    PVX1,
    RHO,
    SCALAR0,
)
from ..stencil import interior, sh
from . import euler, reconstruct
from .riemann import FaceState, hllc, llf


@dataclass(frozen=True)
class HydroOptions:
    """Static (jit-hashable) solver configuration; mirrors the runtime knobs
    read by the reference (``src/QuokkaSimulation.hpp:340-396``)."""

    eos: IdealGasEOS
    active_axes: Tuple[int, ...]  # spatial axes with >1 cell
    dx: Tuple[float, float, float]
    nghost: int = 4
    reconstruction_order: int = 3  # 3=PPM, 2=PLM, 1=donor cell
    use_flattening: bool = True
    reconstruct_eint: bool = True
    riemann: str = "hllc"
    K_visc: float = 0.0  # artificial viscosity coefficient
    n_scalars: int = 0
    n_mscalars: int = 0
    density_floor: float = 0.0
    temperature_floor: float = 0.0
    use_dual_energy: bool = True
    rk_order: int = 2
    use_pallas: bool = False  # fused Pallas sweep kernels (TPU hot path)

    @property
    def ndim(self) -> int:
        return len(self.active_axes)


def _transverse_axes(axis: int, ndim: int) -> Tuple[int, int]:
    """(v_axis, w_axis) for the canonical Riemann frame, matching the
    reference's index permutation (``src/hydro/hydro_system.hpp:952-976``)."""
    if axis == 0:
        return 1, 2
    if axis == 1:
        return (0, 2) if ndim == 2 else (2, 0)
    return 0, 1


def _face_state(q: jnp.ndarray, axis: int, opts: HydroOptions) -> FaceState:
    """Build a canonical-frame FaceState from a reconstructed interface
    primitive array (reference `ComputeFluxes` gather,
    ``src/hydro/hydro_system.hpp:884-1006``)."""
    eos = opts.eos
    vax, wax = _transverse_axes(axis, max(opts.ndim, 1))
    rho = q[PRHO]
    u = q[PVX1 + axis]
    v = q[PVX1 + vax]
    w = q[PVX1 + wax]
    ke = 0.5 * rho * (u * u + v * v + w * w)

    if eos.is_isothermal:
        P = rho * eos.cs_isothermal**2
        cs = jnp.full_like(rho, eos.cs_isothermal)
        E = jnp.zeros_like(rho)
        Eint = jnp.zeros_like(rho)
    elif opts.reconstruct_eint:
        eint_spec = q[PPRES]
        P = eos.pressure(rho, eint_spec * rho)
        Eint = rho * q[PEINT]
        cs = eos.sound_speed(rho, P)
        E = eos.eint_from_pres(rho, P) + ke
    else:
        P = q[PPRES]
        Eint = q[PEINT]
        cs = eos.sound_speed(rho, P)
        E = eos.eint_from_pres(rho, P) + ke

    scalars = q[SCALAR0:] if q.shape[0] > SCALAR0 else None
    return FaceState(rho=rho, u=u, v=v, w=w, P=P, cs=cs, E=E, Eint=Eint, scalars=scalars)


def _compute_axis_flux(
    prim: jnp.ndarray,
    axis: int,
    opts: HydroOptions,
    order: int,
    chis: Sequence[jnp.ndarray] | None,
    riemann: str,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Flux + face normal velocity along one axis, in padded face coords.

    Returns (flux[nvar, ...], facevel[...]) with components in *state* order
    (momenta permuted back from the canonical frame).
    """
    ax = axis + 1
    eos = opts.eos
    qL, qR = reconstruct.reconstruct_faces(prim, axis, order)
    if chis is not None:
        qL, qR = reconstruct.flatten_faces(qL, qR, prim, chis, opts.active_axes, axis)

    sL = _face_state(qL, axis, opts)
    sR = _face_state(qR, axis, opts)

    vax, wax = _transverse_axes(axis, max(opts.ndim, 1))

    if riemann == "llf":
        F = llf(sL, sR)
        dvl = dvr = dwl = dwr = None
    else:
        # normal velocity jump across the face (cell-centered values; 3D
        # spatial fields shift along spatial axis = `axis`)
        un = prim[PVX1 + axis]
        du = un - sh(un, -1, axis)

        # transverse velocity jumps (min of one-sided diffs; reference
        # ``src/hydro/hydro_system.hpp:1020-1037``)
        def min_onesided(vel_comp: jnp.ndarray, taxis: int):
            """At cells f-1 ("l") and f ("r"): min one-sided diff along taxis."""
            d_plus = sh(vel_comp, 1, taxis) - vel_comp
            d_minus = vel_comp - sh(vel_comp, -1, taxis)
            dmin = jnp.minimum(d_plus, d_minus)
            return sh(dmin, -1, axis), dmin  # (cell f-1, cell f) at face f

        dw = None
        dvl = dvr = dwl = dwr = 0.0
        if vax in opts.active_axes:
            dvl, dvr = min_onesided(prim[PVX1 + vax], vax)
            dw = jnp.minimum(dvl, dvr)
        if wax in opts.active_axes:
            dwl, dwr = min_onesided(prim[PVX1 + wax], wax)
            dmin2 = jnp.minimum(dwl, dwr)
            dw = dmin2 if dw is None else jnp.minimum(dw, dmin2)
        if dw is None:
            dw = jnp.zeros_like(du)

        F = hllc(sL, sR, eos, du, dw)

        # artificial viscosity following CW84 eq. 4.2 (reference
        # ``src/hydro/hydro_system.hpp:1056-1063``)
        if opts.K_visc > 0.0:
            div_v = du
            if vax in opts.active_axes:
                div_v = div_v + 0.5 * (dvl + dvr)
            if wax in opts.active_axes:
                div_v = div_v + 0.5 * (dwl + dwr)
            viscosity = opts.K_visc * jnp.maximum(-div_v, 0.0)
            F = F + viscosity[None] * (sL.conserved() - sR.conserved())

    # permute canonical momentum components back to state order
    Fout = jnp.empty_like(F)
    Fout = Fout.at[RHO].set(F[0])
    Fout = Fout.at[MX1 + axis].set(F[1])
    Fout = Fout.at[MX1 + vax].set(F[2])
    Fout = Fout.at[MX1 + wax].set(F[3])
    Fout = Fout.at[EGAS].set(F[4])
    Fout = Fout.at[EINT].set(F[5])
    if opts.n_scalars > 0:
        Fout = Fout.at[SCALAR0:].set(F[6:])

    if eos.is_isothermal:
        Fout = Fout.at[EGAS].set(0.0).at[EINT].set(0.0)

    # consistent multi-species advection (Plewa & Muller 1999 eqs 8, 12):
    # mass-scalar fluxes are rescaled so they sum to the mass flux
    if opts.n_mscalars > 0:
        mrho = Fout[RHO]
        upwind_is_L = mrho >= 0.0
        sum_L = jnp.sum(sL.scalars[: opts.n_mscalars], axis=0)
        sum_R = jnp.sum(sR.scalars[: opts.n_mscalars], axis=0)
        for n in range(opts.n_mscalars):
            f_L = mrho * sL.scalars[n] / sum_L
            f_R = mrho * sR.scalars[n] / sum_R
            Fout = Fout.at[SCALAR0 + n].set(jnp.where(upwind_is_L, f_L, f_R))

    # face-centered normal velocity (for the PdV source and tracer advection;
    # reference ``src/hydro/hydro_system.hpp:1095-1097``)
    facevel = jnp.where(Fout[RHO] >= 0.0, Fout[RHO] / sR.rho, Fout[RHO] / sL.rho)
    return Fout, facevel


def compute_fluxes(Ug: jnp.ndarray, opts: HydroOptions, first_order: bool = False):
    """All-axis flux computation from a ghost-padded conserved state.

    Returns (fluxes, facevels): dicts keyed by axis, arrays in padded face
    coords. `first_order=True` gives the donor-cell + LLF backup fluxes used
    for FOFC (reference `computeFOHydroFluxes`,
    ``src/QuokkaSimulation.hpp:1520-1570``)."""
    # Pallas custom calls cannot carry f64 operands on TPU (the XLA
    # double-double rewriter does not see inside them): f32 only
    if opts.use_pallas and len(opts.active_axes) == 3 and Ug.dtype == jnp.float32:
        from .pallas_sweep import compute_fluxes_pallas

        return compute_fluxes_pallas(Ug, opts, first_order)

    prim = euler.cons_to_prim(Ug, opts.eos, opts.reconstruct_eint)

    if first_order:
        order, riemann, chis = 1, "llf", None
    else:
        order, riemann = opts.reconstruction_order, opts.riemann
        chis = None
        if opts.use_flattening and order == 3:
            chis = [
                reconstruct.flattening_chi(prim, d, opts.eos, opts.reconstruct_eint)
                for d in opts.active_axes
            ]

    fluxes, facevels = {}, {}
    for d in opts.active_axes:
        F, v = _compute_axis_flux(prim, d, opts, order, chis, riemann)
        fluxes[d] = F
        facevels[d] = v
    return fluxes, facevels


def rhs_from_fluxes(fluxes: dict, opts: HydroOptions) -> jnp.ndarray:
    """Flux divergence: rhs(i) = sum_d (F_d(i) - F_d(i+1)) / dx_d
    (reference `ComputeRhsFromFluxes`; padded cell coords)."""
    rhs = None
    for d, F in fluxes.items():
        ax = d + 1
        contrib = (F - sh(F, 1, ax)) / opts.dx[d]
        rhs = contrib if rhs is None else rhs + contrib
    return rhs


def add_internal_energy_pdv(
    rhs: jnp.ndarray,
    Ug: jnp.ndarray,
    facevels: dict,
    opts: HydroOptions,
    redo_mask: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """-P div(v) source for the auxiliary internal energy (reference
    `AddInternalEnergyPdV`, ``src/hydro/hydro_system.hpp:777-815``).

    div(v) uses face-centered velocities; on FOFC-redo cells it falls back to
    central differences of cell velocities, as the reference does."""
    P = euler.pressure(Ug, opts.eos)
    div_face = None
    for d, v in facevels.items():
        c = (sh(v, 1, d) - v) / opts.dx[d]  # v is a 3D spatial field
        div_face = c if div_face is None else div_face + c
    div_v = div_face

    if redo_mask is not None:
        div_cc = None
        for d in opts.active_axes:
            vel = Ug[MX1 + d] / Ug[RHO]
            c = 0.5 * (sh(vel, 1, d) - sh(vel, -1, d)) / opts.dx[d]
            div_cc = c if div_cc is None else div_cc + c
        div_v = jnp.where(redo_mask, div_cc, div_face)

    return rhs.at[EINT].add(-P * div_v)


def _pad_mask(mask: jnp.ndarray, ng: Sequence[int], periodic: Sequence[bool]) -> jnp.ndarray:
    """Pad a boolean interior mask into ghost cells: periodic wrap where
    periodic, False elsewhere (matches the reference's
    `redoFlag.FillBoundary(periodicity)`)."""
    from jax import lax

    out = mask
    for d in range(3):
        g = ng[d]
        if g == 0:
            continue
        ax = d
        n = out.shape[ax]
        if periodic[d]:
            lo = lax.slice_in_dim(out, n - g, n, axis=ax)
            hi = lax.slice_in_dim(out, 0, g, axis=ax)
        else:
            shape = list(out.shape)
            shape[ax] = g
            lo = jnp.zeros(shape, dtype=out.dtype)
            hi = lo
        out = jnp.concatenate([lo, out, hi], axis=ax)
    return out


def _blend_fofc(fluxes, facevels, fo_fluxes, fo_facevels, mask_p, opts):
    """Replace fluxes/face velocities with first-order ones on every face
    adjacent to a flagged cell (reference `replaceFluxes`,
    ``src/QuokkaSimulation.hpp:1325-1369``)."""
    new_f, new_v = {}, {}
    for d in fluxes:
        ax = d + 1
        face_flag = jnp.logical_or(sh(mask_p, -1, d), mask_p)  # mask is [X,Y,Z]
        new_f[d] = jnp.where(face_flag[None], fo_fluxes[d], fluxes[d])
        new_v[d] = jnp.where(face_flag, fo_facevels[d], facevels[d])
    return new_f, new_v


def rk2_stage(
    U0_int: jnp.ndarray,
    Ug_old: jnp.ndarray,
    fluxes: dict,
    facevels: dict,
    fo_fluxes_fn,
    dt,
    ng: Sequence[int],
    periodic: Sequence[bool],
    opts: HydroOptions,
    mask_fill_fn: Callable[[jnp.ndarray], jnp.ndarray] | None = None,
    redo_any_fn: Callable | None = None,
):
    """One flux-application stage with masked FOFC.

    U_new = U0 + dt * rhs(fluxes); where that produces an invalid state, the
    fluxes on the adjacent faces are replaced by the first-order (donor-cell
    + LLF) fluxes and the update is recomputed. This is branch-free: when the
    redo mask is empty the blended fluxes equal the originals and the second
    application reproduces the first, so no cross-device agreement on a
    scalar "any redo?" flag is needed (the reference instead host-syncs
    `redoFlag.sum()`, ``src/QuokkaSimulation.hpp:1147``).

    `mask_fill_fn` pads the interior redo mask into ghost cells (periodic
    wrap / zero on one device; halo exchange under shard_map).

    Returns (U_new interior, final fluxes, final facevels, n_fofc)."""
    if mask_fill_fn is None:
        mask_fill_fn = lambda m: _pad_mask(m, ng, periodic)
    if redo_any_fn is None:
        redo_any_fn = jnp.any

    def apply(fl, fv, redo_mask):
        rhs = rhs_from_fluxes(fl, opts)
        rhs = add_internal_energy_pdv(rhs, Ug_old, fv, opts, redo_mask)
        return U0_int + dt * interior(rhs, ng)

    U1 = apply(fluxes, facevels, None)
    redo = jnp.logical_not(euler.is_state_valid(U1, opts.eos))
    n_redo = jnp.sum(redo)

    # the redo path (mask pad + flux blend + second update) costs as much
    # as the first update; gate it behind a DEVICE-side cond so the common
    # all-valid step skips it entirely -- still no host round-trip (the
    # reference host-syncs redoFlag.sum() instead,
    # src/QuokkaSimulation.hpp:1147). `redo_any_fn` must return a globally
    # uniform scalar under shard_map (a psum'd any), because the redo
    # branch contains the halo-exchange collective for the mask.
    from jax import lax as _lax

    def _redo_branch(_):
        # the first-order backup sweep is computed HERE, inside the cond:
        # the common all-valid step never pays for it (the reference
        # computes computeFOHydroFluxes unconditionally every stage,
        # src/QuokkaSimulation.hpp:1096)
        fo_fluxes, fo_facevels = fo_fluxes_fn()
        mask_p = mask_fill_fn(redo)
        fl2, fv2 = _blend_fofc(fluxes, facevels, fo_fluxes, fo_facevels, mask_p, opts)
        U_new = apply(fl2, fv2, mask_p)
        return U_new, tuple(fl2[d] for d in sorted(fl2)), tuple(fv2[d] for d in sorted(fv2))

    def _clean_branch(_):
        return U1, tuple(fluxes[d] for d in sorted(fluxes)), tuple(facevels[d] for d in sorted(facevels))

    U_new, fl_t, fv_t = _lax.cond(redo_any_fn(redo), _redo_branch, _clean_branch, None)
    axes = sorted(fluxes)
    fl2 = {d: fl_t[i] for i, d in enumerate(axes)}
    fv2 = {d: fv_t[i] for i, d in enumerate(axes)}
    return U_new, fl2, fv2, n_redo


def advance_hydro_rk2(
    U: jnp.ndarray,
    dt,
    opts: HydroOptions,
    fill_fn: Callable[[jnp.ndarray], jnp.ndarray],
    ng: Sequence[int],
    periodic: Sequence[bool],
    mask_fill_fn: Callable[[jnp.ndarray], jnp.ndarray] | None = None,
    fill_fn2: Callable[[jnp.ndarray], jnp.ndarray] | None = None,
    return_fluxes: bool = False,
    redo_any_fn: Callable | None = None,
):
    """Full RK2-SSP hydro step (reference `advanceHydroAtLevel`,
    ``src/QuokkaSimulation.hpp:1033-1325``).

    `fill_fn(U) -> Ug` fills ghost zones (physical BCs and, under shard_map,
    the inter-device halos). `fill_fn2`, if given, fills the intermediate
    stage-2 state (AMR uses coarse data time-interpolated to t+dt there,
    mirroring the reference's FillPatcher). With `return_fluxes`, stats
    includes the RK-time-averaged face fluxes used for the update (what the
    reference feeds its flux registers). Returns (U_new, stats_dict)."""
    eos = opts.eos
    if fill_fn2 is None:
        fill_fn2 = fill_fn

    # ---- stage 1
    Ug0 = fill_fn(U)
    fo_fluxes_fn = lambda: compute_fluxes(Ug0, opts, first_order=True)
    fluxes1, facevels1 = compute_fluxes(Ug0, opts)
    U1, fl1, fv1, n_fofc1 = rk2_stage(
        U, Ug0, fluxes1, facevels1, fo_fluxes_fn, dt, ng, periodic, opts,
        mask_fill_fn, redo_any_fn,
    )
    U1 = euler.enforce_limits(
        U1, eos, opts.density_floor, opts.temperature_floor, opts.n_scalars
    )
    if opts.use_dual_energy and not eos.is_isothermal:
        U1 = euler.sync_dual_energy(U1)

    if opts.rk_order == 1:
        stats = {"n_fofc": n_fofc1}
        if return_fluxes:
            stats["fluxes"] = fl1
        return U1, stats

    # ---- stage 2: time-averaged flux  (Heun / RK2-SSP)
    Ug1 = fill_fn2(U1)
    fluxes2, facevels2 = compute_fluxes(Ug1, opts)
    flux_avg = {d: 0.5 * (fl1[d] + fluxes2[d]) for d in fl1}
    vel_avg = {d: 0.5 * (fv1[d] + facevels2[d]) for d in fv1}
    U2, fl2, _, n_fofc2 = rk2_stage(
        U, Ug0, flux_avg, vel_avg, fo_fluxes_fn, dt, ng, periodic, opts,
        mask_fill_fn, redo_any_fn,
    )
    U2 = euler.enforce_limits(
        U2, eos, opts.density_floor, opts.temperature_floor, opts.n_scalars
    )
    if opts.use_dual_energy and not eos.is_isothermal:
        U2 = euler.sync_dual_energy(U2)

    stats = {"n_fofc": n_fofc1 + n_fofc2}
    if return_fluxes:
        stats["fluxes"] = fl2
    return U2, stats
