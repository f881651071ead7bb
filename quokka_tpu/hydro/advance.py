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
    # kernel-fused flux divergences: the sweep kernels also emit
    # (F(i)-F(i+1))/dx so the common-path RK update is pointwise (no XLA
    # rolls of whole flux arrays through HBM); FOFC redos fall back to the
    # classic flux-based machinery inside the cond. Bit-identical output.
    fuse_update: bool = True

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
    rinv = 1.0 / rho
    u = q[PVX1 + axis]
    v = q[PVX1 + vax]
    w = q[PVX1 + wax]
    ke = 0.5 * rho * (u * u + v * v + w * w)

    # composition-dependent mixture EOS: per-FACE gamma from the
    # reconstructed species scalars (the reference's Riemann gather passes
    # massScalars into every EOS call, ``src/hydro/hydro_system.hpp:884-1006``)
    gam = euler.mixture_gamma(eos, q, SCALAR0)

    if eos.is_isothermal:
        P = rho * eos.cs_isothermal**2
        cs = jnp.full_like(rho, eos.cs_isothermal)
        E = jnp.zeros_like(rho)
        Eint = jnp.zeros_like(rho)
    elif gam is not None:
        if opts.reconstruct_eint:
            eint = q[PPRES] * rho
            Eint = rho * q[PEINT]
        else:
            eint = None
            Eint = q[PEINT]
        P = (gam - 1.0) * eint if eint is not None else q[PPRES]
        cs = jnp.sqrt(gam * P * rinv)
        E = P / (gam - 1.0) + ke
    elif opts.reconstruct_eint:
        eint_spec = q[PPRES]
        P = eos.pressure(rho, eint_spec * rho)
        Eint = rho * q[PEINT]
        cs = jnp.sqrt(eos.gamma * P * rinv)
        E = eos.eint_from_pres(rho, P) + ke
    else:
        P = q[PPRES]
        Eint = q[PEINT]
        cs = jnp.sqrt(eos.gamma * P * rinv)
        E = eos.eint_from_pres(rho, P) + ke

    scalars = q[SCALAR0:] if q.shape[0] > SCALAR0 else None
    return FaceState(rho=rho, u=u, v=v, w=w, P=P, cs=cs, E=E, Eint=Eint,
                     scalars=scalars, gamma=gam, rinv=rinv)


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


import os as _os

# VMEM ceilings for the Pallas sweep kernels (whole sweep axis lives
# in-block, so the kernel body's live set scales with the longest spatial
# extent). Measured on v5e (128M VMEM): classic flux kernels fit at a
# 264-long padded sweep (115.6M) and the ghost-free fused divergence
# kernels at 256 (126M); 384 needs 179M. Above the ceiling the XLA
# formulation takes over instead of hard-failing the compile.
_PALLAS_MAX_DIM = int(_os.environ.get("QUOKKA_PALLAS_MAX_DIM", "272"))


def _pallas_shape_ok(spatial) -> bool:
    """Lane-axis blocking rule: Mosaic blocks must tile z by a 128
    multiple or take the whole axis. A large z that is NOT a 128 multiple
    (e.g. the 264-padded AMR level of a 256^3 base) forces whole-z blocks
    whose kernel live sets overflow the 128M VMEM (measured 324M at 264);
    such shapes take the XLA formulation."""
    Z = spatial[-1]
    return Z <= 136 or Z % 128 == 0


def _pallas_fits(Ug: jnp.ndarray) -> bool:
    return (max(Ug.shape[1:]) <= _PALLAS_MAX_DIM
            and _pallas_shape_ok(Ug.shape[1:]))


def compute_fluxes(Ug: jnp.ndarray, opts: HydroOptions, first_order: bool = False,
                   bc_kinds: dict | None = None):
    """All-axis flux computation from a ghost-padded conserved state.

    Returns (fluxes, facevels): dicts keyed by axis, arrays in padded face
    coords. `first_order=True` gives the donor-cell + LLF backup fluxes used
    for FOFC (reference `computeFOHydroFluxes`,
    ``src/QuokkaSimulation.hpp:1520-1570``).

    `bc_kinds` = {axis: (lo,hi)|None} switches to the ghost-free path (see
    `pallas_sweep.compute_fluxes_pallas`): Ug is then UNPADDED and the
    return is (fluxes, facevels, flux_hi, vel_hi)."""
    # Pallas custom calls cannot carry f64 operands on TPU (the XLA
    # double-double rewriter does not see inside them): f32 only
    if (opts.use_pallas and len(opts.active_axes) == 3
            and Ug.dtype == jnp.float32 and _pallas_fits(Ug)):
        from .pallas_sweep import compute_fluxes_pallas

        return compute_fluxes_pallas(Ug, opts, first_order, bc_kinds)
    if bc_kinds is not None:
        raise ValueError(
            "ghost-free stepping (bc_kinds) requires the Pallas sweep path "
            f"(f32, 3D, hydro.use_pallas=1, max extent <= {_PALLAS_MAX_DIM})"
        )

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


def _last_idx_mask(ndim: int, ax: int, n: int):
    """Broadcastable iota along array axis `ax` (for wall-face fixes on
    ghost-free arrays)."""
    from jax import lax

    shape = [1] * ndim
    shape[ax] = n
    return lax.broadcasted_iota(jnp.int32, tuple(shape), ax)


def rhs_from_fluxes(fluxes: dict, opts: HydroOptions,
                    flux_hi: dict | None = None) -> jnp.ndarray:
    """Flux divergence: rhs(i) = sum_d (F_d(i) - F_d(i+1)) / dx_d
    (reference `ComputeRhsFromFluxes`; padded cell coords).

    On the ghost-free path `flux_hi[d]` holds the hi-wall flux plane that
    has no slot in the N-face array (slot 0 is the lo wall); the last
    cell's divergence is patched with it via a fused masked select."""
    from jax import lax

    rhs = None
    for d, F in fluxes.items():
        ax = d + 1
        contrib = (F - sh(F, 1, ax)) / opts.dx[d]
        if flux_hi is not None and d in flux_hi:
            n = F.shape[ax]
            idx = _last_idx_mask(F.ndim, ax, n)
            F_last = lax.slice_in_dim(F, n - 1, n, axis=ax)
            Fh = jnp.expand_dims(flux_hi[d], ax)
            contrib = jnp.where(idx == n - 1, (F_last - Fh) / opts.dx[d], contrib)
        rhs = contrib if rhs is None else rhs + contrib
    return rhs


def add_internal_energy_pdv(
    rhs: jnp.ndarray,
    Ug: jnp.ndarray,
    facevels: dict,
    opts: HydroOptions,
    redo_mask: jnp.ndarray | None = None,
    vel_hi: dict | None = None,
    bc_kinds: dict | None = None,
) -> jnp.ndarray:
    """-P div(v) source for the auxiliary internal energy (reference
    `AddInternalEnergyPdV`, ``src/hydro/hydro_system.hpp:777-815``).

    div(v) uses face-centered velocities; on FOFC-redo cells it falls back to
    central differences of cell velocities, as the reference does.

    Ghost-free path: `vel_hi[d]` patches the hi-wall face velocity into the
    last cell's divergence, and `bc_kinds` wall-corrects the cell-centered
    fallback stencils."""
    from jax import lax

    P = euler.pressure(Ug, opts.eos)
    div_face = None
    for d, v in facevels.items():
        c = (sh(v, 1, d) - v) / opts.dx[d]  # v is a 3D spatial field
        if vel_hi is not None and d in vel_hi:
            n = v.shape[d]
            idx = _last_idx_mask(v.ndim, d, n)
            v_last = lax.slice_in_dim(v, n - 1, n, axis=d)
            vh = jnp.expand_dims(vel_hi[d], d)
            c = jnp.where(idx == n - 1, (vh - v_last) / opts.dx[d], c)
        div_face = c if div_face is None else div_face + c
    div_v = div_face

    if redo_mask is not None:
        from ..stencil import sh_bc

        div_cc = None
        for d in opts.active_axes:
            vel = Ug[MX1 + d] / Ug[RHO]
            bc_axis = None if bc_kinds is None else bc_kinds.get(d)
            if bc_axis is None:
                vp, vm = sh(vel, 1, d), sh(vel, -1, d)
            else:
                lo_k, hi_k = bc_axis
                vp = sh_bc(vel, 1, d, lo_k, hi_k, odd=True)
                vm = sh_bc(vel, -1, d, lo_k, hi_k, odd=True)
            c = 0.5 * (vp - vm) / opts.dx[d]
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


def _blend_fofc(fluxes, facevels, fo_fluxes, fo_facevels, mask_p, opts,
                bc_kinds: dict | None = None,
                hi_planes: tuple | None = None):
    """Replace fluxes/face velocities with first-order ones on every face
    adjacent to a flagged cell (reference `replaceFluxes`,
    ``src/QuokkaSimulation.hpp:1325-1369``).

    Ghost-free path: on wall axes the lo-wall face (slot 0) has only one
    adjacent cell, so the roll wrap of the mask is suppressed there, and
    the hi-wall planes (`hi_planes` = (flux_hi, vel_hi, fo_flux_hi,
    fo_vel_hi)) are blended with the last cell's flag."""
    from jax import lax

    new_f, new_v = {}, {}
    new_fh, new_vh = {}, {}
    for d in fluxes:
        face_flag = jnp.logical_or(sh(mask_p, -1, d), mask_p)  # mask is [X,Y,Z]
        wall = bc_kinds is not None and bc_kinds.get(d) is not None
        if wall:
            n = mask_p.shape[d]
            idx = _last_idx_mask(mask_p.ndim, d, n)
            # slot 0 = lo wall face: flagged only by cell 0 (no wrap)
            face_flag = jnp.logical_or(
                jnp.logical_and(sh(mask_p, -1, d), idx > 0), mask_p
            )
        new_f[d] = jnp.where(face_flag[None], fo_fluxes[d], fluxes[d])
        new_v[d] = jnp.where(face_flag, fo_facevels[d], facevels[d])
        if wall and hi_planes is not None:
            flux_hi, vel_hi, fo_flux_hi, fo_vel_hi = hi_planes
            n = mask_p.shape[d]
            flag_hi = lax.index_in_dim(mask_p, n - 1, axis=d, keepdims=False)
            new_fh[d] = jnp.where(flag_hi[None], fo_flux_hi[d], flux_hi[d])
            new_vh[d] = jnp.where(flag_hi, fo_vel_hi[d], vel_hi[d])
    if hi_planes is not None:
        return new_f, new_v, new_fh, new_vh
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
    bc_kinds: dict | None = None,
    flux_hi: dict | None = None,
    vel_hi: dict | None = None,
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

    ghost_free = bc_kinds is not None
    wall_axes = sorted(flux_hi) if flux_hi else []

    def apply(fl, fv, redo_mask, fl_hi=None, fv_hi=None):
        rhs = rhs_from_fluxes(fl, opts, fl_hi)
        rhs = add_internal_energy_pdv(
            rhs, Ug_old, fv, opts, redo_mask, vel_hi=fv_hi, bc_kinds=bc_kinds
        )
        return U0_int + dt * interior(rhs, ng)

    U1 = apply(fluxes, facevels, None, flux_hi, vel_hi)
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

    def _pack(fl, fv, fl_hi, fv_hi):
        axes = sorted(fl)
        return (
            tuple(fl[d] for d in axes),
            tuple(fv[d] for d in axes),
            tuple(fl_hi[d] for d in wall_axes),
            tuple(fv_hi[d] for d in wall_axes),
        )

    def _redo_branch(_):
        # the first-order backup sweep is computed HERE, inside the cond:
        # the common all-valid step never pays for it (the reference
        # computes computeFOHydroFluxes unconditionally every stage,
        # src/QuokkaSimulation.hpp:1096)
        if ghost_free:
            fo_fluxes, fo_facevels, fo_flux_hi, fo_vel_hi = fo_fluxes_fn()
        else:
            fo_fluxes, fo_facevels = fo_fluxes_fn()
        mask_p = mask_fill_fn(redo)
        if ghost_free:
            fl2, fv2, flh2, fvh2 = _blend_fofc(
                fluxes, facevels, fo_fluxes, fo_facevels, mask_p, opts,
                bc_kinds, (flux_hi, vel_hi, fo_flux_hi, fo_vel_hi),
            )
            U_new = apply(fl2, fv2, mask_p, flh2, fvh2)
            return (U_new,) + _pack(fl2, fv2, flh2, fvh2)
        fl2, fv2 = _blend_fofc(fluxes, facevels, fo_fluxes, fo_facevels, mask_p, opts)
        U_new = apply(fl2, fv2, mask_p)
        return (U_new,) + _pack(fl2, fv2, {}, {})

    def _clean_branch(_):
        return (U1,) + _pack(fluxes, facevels, flux_hi or {}, vel_hi or {})

    U_new, fl_t, fv_t, flh_t, fvh_t = _lax.cond(
        redo_any_fn(redo), _redo_branch, _clean_branch, None
    )
    axes = sorted(fluxes)
    fl2 = {d: fl_t[i] for i, d in enumerate(axes)}
    fv2 = {d: fv_t[i] for i, d in enumerate(axes)}
    flh2 = {d: flh_t[i] for i, d in enumerate(wall_axes)}
    fvh2 = {d: fvh_t[i] for i, d in enumerate(wall_axes)}
    if ghost_free:
        return U_new, fl2, fv2, n_redo, flh2, fvh2
    return U_new, fl2, fv2, n_redo


def _sum_divs(divs: dict) -> jnp.ndarray:
    """Sum per-axis divergence contributions in sorted-axis order (the
    accumulation order the aliased in-kernel accumulators also use)."""
    rhs = None
    for d in sorted(divs):
        rhs = divs[d] if rhs is None else rhs + divs[d]
    return rhs


def _apply_from_divs(U0_int, Ug_old, div, dvel, dt, ng,
                     opts: HydroOptions, redo_mask=None,
                     bc_kinds: dict | None = None) -> jnp.ndarray:
    """Pointwise flux application from the kernel-fused divergence totals:
    bit-identical to `rhs_from_fluxes` + `add_internal_energy_pdv` + the
    RK predict, but with zero XLA rolls (everything fuses into one
    elementwise pass).

    `redo_mask` (padded bool): FOFC-redo cells use the central-difference
    cell-velocity divergence for the PdV source instead of the
    face-velocity one (`add_internal_energy_pdv`'s redo branch, reference
    ``src/hydro/hydro_system.hpp:777-815``)."""
    from ..stencil import sh_bc

    P = euler.pressure(Ug_old, opts.eos)
    dv = dvel
    if redo_mask is not None:
        div_cc = None
        for d in opts.active_axes:
            vel = Ug_old[MX1 + d] / Ug_old[RHO]
            bc_axis = None if bc_kinds is None else bc_kinds.get(d)
            if bc_axis is None:
                vp, vm = sh(vel, 1, d), sh(vel, -1, d)
            else:
                lo_k, hi_k = bc_axis
                vp = sh_bc(vel, 1, d, lo_k, hi_k, odd=True)
                vm = sh_bc(vel, -1, d, lo_k, hi_k, odd=True)
            c = 0.5 * (vp - vm) / opts.dx[d]
            div_cc = c if div_cc is None else div_cc + c
        dv = jnp.where(redo_mask, div_cc, dvel)
    rhs = div.at[EINT].add(-P * dv)
    return U0_int + dt * interior(rhs, ng)


def _advance_hydro_rk2_fused(
    U: jnp.ndarray,
    dt,
    opts: HydroOptions,
    fill_fn,
    ng,
    periodic,
    mask_fill_fn=None,
    fill_fn2=None,
    redo_any_fn=None,
    bc_kinds: dict | None = None,
    return_fluxes: bool = False,
):
    """RK2-SSP hydro step on the kernel-fused divergence fast path.

    Same numerics (bit-identical) as `advance_hydro_rk2`'s flux-based
    formulation: the sweep kernels emit per-axis divergence contributions
    (stage 2: of the in-VMEM time-averaged flux), so the common all-valid
    step applies them pointwise; any FOFC redo (or a stage-1 redo feeding
    stage 2's average) drops into a cond-gated fallback that reproduces
    the classic flux blending exactly (reference `replaceFluxes`,
    ``src/QuokkaSimulation.hpp:1325-1369``)."""
    from jax import lax as _lax

    from .pallas_sweep import compute_fluxes_pallas_div

    eos = opts.eos
    if mask_fill_fn is None:
        mask_fill_fn = lambda m: _pad_mask(m, ng, periodic)
    if redo_any_fn is None:
        redo_any_fn = jnp.any
    if fill_fn2 is None:
        fill_fn2 = fill_fn
    ghost_free = bc_kinds is not None

    Ug0 = fill_fn(U)
    fo_fluxes_fn = lambda: compute_fluxes(Ug0, opts, first_order=True,
                                          bc_kinds=bc_kinds)
    # optional: chain per-axis divergence contributions through aliased
    # in-kernel accumulators instead of per-axis HBM dicts. Measured on
    # v5e at 256^3 the two extra double-buffered accumulator windows push
    # the sweep kernels past the 128M VMEM budget (138.8M -> compile
    # failure), and the HBM bytes moved are the same either way, so this
    # defaults OFF; kept env-gated for smaller-domain experiments.
    accum = not return_fluxes and bool(
        int(_os.environ.get("QUOKKA_PALLAS_ACCUM_DIV", "0"))
    )
    r1 = compute_fluxes_pallas_div(Ug0, opts, bc_kinds, accumulate=accum)

    def apply_fluxes(fl, fv, redo_mask, fl_hi, fv_hi):
        rhs = rhs_from_fluxes(fl, opts, fl_hi if fl_hi else None)
        rhs = add_internal_energy_pdv(
            rhs, Ug0, fv, opts, redo_mask,
            vel_hi=fv_hi if fv_hi else None, bc_kinds=bc_kinds,
        )
        return U + dt * interior(rhs, ng)

    def blend_stage1(redo1):
        """Stage-1 FOFC blend (identity when the redo mask is empty)."""
        mask_p = mask_fill_fn(redo1)
        if ghost_free:
            fo_fl, fo_fv, fo_flh, fo_fvh = fo_fluxes_fn()
            fl, fv, flh, fvh = _blend_fofc(
                r1["fluxes"], r1["facevels"], fo_fl, fo_fv, mask_p, opts,
                bc_kinds, (r1["flux_hi"], r1["vel_hi"], fo_flh, fo_fvh),
            )
        else:
            fo_fl, fo_fv = fo_fluxes_fn()
            fl, fv = _blend_fofc(
                r1["fluxes"], r1["facevels"], fo_fl, fo_fv, mask_p, opts
            )
            flh, fvh = {}, {}
        return fl, fv, flh, fvh, mask_p

    def finalize(Ux):
        """Floors + dual-energy sync, applied INSIDE each cond branch so
        the common path fuses apply+limits+sync into one pointwise pass
        (outside the cond XLA must materialize the intermediate)."""
        Ux = euler.enforce_limits(
            Ux, eos, opts.density_floor, opts.temperature_floor,
            opts.n_scalars,
        )
        if opts.use_dual_energy and not eos.is_isothermal:
            Ux = euler.sync_dual_energy(Ux)
        return Ux

    # fused pointwise stage finish (apply + PdV + valid + floors + dual
    # sync in ONE Pallas pass): ghost-free unpadded common path only; the
    # mixture (chem) EOS keeps the XLA formulation (its per-cell gamma
    # gather does not lower in Mosaic)
    from .pallas_sweep import apply_update_pallas

    use_apply_kernel = (
        ghost_free
        and not accum
        and not return_fluxes
        and getattr(eos, "gamma_of_scalars", None) is None
        and all(g == 0 for g in ng)
        and U.shape[1] % 8 == 0 and U.shape[2] % 8 == 0
        and U.shape[3] % 128 == 0
        and bool(int(_os.environ.get("QUOKKA_PALLAS_APPLY", "1")))
    )

    # ---- stage 1
    if use_apply_kernel:
        U1_fin, ok1 = apply_update_pallas(
            U, Ug0, r1["divs"], r1["dvels"], dt, opts
        )
        n1 = jnp.sum(~ok1)
        fired1 = redo_any_fn(jnp.logical_not(ok1))

        def _redo1_branch_k(_):
            # rare branch: rebuild the cell mask the classic way (the
            # kernel only kept per-block flags), then blend + re-apply
            U1_try = _apply_from_divs(
                U, Ug0, _sum_divs(r1["divs"]), _sum_divs(r1["dvels"]),
                dt, ng, opts,
            )
            redo1 = jnp.logical_not(euler.is_state_valid(U1_try, eos))
            fl, fv, flh, fvh, mask_p = blend_stage1(redo1)
            return finalize(apply_fluxes(fl, fv, mask_p, flh, fvh))

        U1 = _lax.cond(fired1, _redo1_branch_k, lambda _: U1_fin, None)
        if opts.rk_order == 1:
            return U1, {"n_fofc": n1}
    else:
        if accum:
            U1_try = _apply_from_divs(U, Ug0, r1["div"], r1["dvel"], dt, ng,
                                      opts)
        else:
            U1_try = _apply_from_divs(
                U, Ug0, _sum_divs(r1["divs"]), _sum_divs(r1["dvels"]), dt,
                ng, opts
            )
        redo1 = jnp.logical_not(euler.is_state_valid(U1_try, eos))
        n1 = jnp.sum(redo1)
        fired1 = redo_any_fn(redo1)

        def _redo1_branch(_):
            fl, fv, flh, fvh, mask_p = blend_stage1(redo1)
            return finalize(apply_fluxes(fl, fv, mask_p, flh, fvh))

        U1 = _lax.cond(fired1, _redo1_branch, lambda _: finalize(U1_try),
                       None)

        if opts.rk_order == 1:
            return U1, {"n_fofc": n1}

    # ---- stage 2: divergence of the in-VMEM time-averaged flux
    # (with return_fluxes -- the AMR reflux path -- the same kernels also
    # emit the time-averaged face flux for the parent's flux register)
    Ug1 = fill_fn2(U1)
    r2 = compute_fluxes_pallas_div(Ug1, opts, bc_kinds, avg_with=r1,
                                   emit_avg_flux=return_fluxes,
                                   accumulate=accum)

    if use_apply_kernel:
        U2_fin, ok2 = apply_update_pallas(
            U, Ug0, r2["divs"], r2["dvels"], dt, opts
        )
        fired2 = redo_any_fn(jnp.logical_not(ok2))

        def _get_redo1():
            U1_try = _apply_from_divs(
                U, Ug0, _sum_divs(r1["divs"]), _sum_divs(r1["dvels"]),
                dt, ng, opts,
            )
            return jnp.logical_not(euler.is_state_valid(U1_try, eos))

        def _fallback2_k(_):
            fl1f, fv1f, flh1f, fvh1f, _m1 = blend_stage1(_get_redo1())
            fl2r, fv2r, flh2r, fvh2r = compute_fluxes(Ug1, opts,
                                                      bc_kinds=bc_kinds)
            flux_avg = {d: 0.5 * (fl1f[d] + fl2r[d]) for d in fl1f}
            vel_avg = {d: 0.5 * (fv1f[d] + fv2r[d]) for d in fv1f}
            flh_avg = {d: 0.5 * (flh1f[d] + flh2r[d]) for d in flh1f}
            fvh_avg = {d: 0.5 * (fvh1f[d] + fvh2r[d]) for d in fvh1f}
            U2a = apply_fluxes(flux_avg, vel_avg, None, flh_avg, fvh_avg)
            redo2b = jnp.logical_not(euler.is_state_valid(U2a, eos))
            n2b = jnp.sum(redo2b)

            def _redo2_branch(_):
                mask_p = mask_fill_fn(redo2b)
                fo_fl, fo_fv, fo_flh, fo_fvh = fo_fluxes_fn()
                fl, fv, flh, fvh = _blend_fofc(
                    flux_avg, vel_avg, fo_fl, fo_fv, mask_p, opts,
                    bc_kinds, (flh_avg, fvh_avg, fo_flh, fo_fvh),
                )
                return finalize(apply_fluxes(fl, fv, mask_p, flh, fvh))

            U2b = _lax.cond(redo_any_fn(redo2b), _redo2_branch,
                            lambda _: finalize(U2a), None)
            return U2b, n2b

        U2, n2 = _lax.cond(
            jnp.logical_or(fired1, fired2), _fallback2_k,
            lambda _: (U2_fin, jnp.sum(~ok2)), None,
        )
        return U2, {"n_fofc": n1 + n2}

    if accum:
        U2_try = _apply_from_divs(U, Ug0, r2["div"], r2["dvel"], dt, ng, opts)
    else:
        dvels2 = r2["dvels"]
        if return_fluxes:
            # emit_avg_flux kernels return the RAW stage-2 velocity
            # divergence (VMEM budget); average with stage 1's here --
            # divergence is linear
            dvels2 = {d: 0.5 * (r1["dvels"][d] + r2["dvels"][d])
                      for d in dvels2}
        U2_try = _apply_from_divs(
            U, Ug0, _sum_divs(r2["divs"]), _sum_divs(dvels2), dt, ng, opts
        )
    redo2 = jnp.logical_not(euler.is_state_valid(U2_try, eos))

    if return_fluxes:
        # reflux consumers need the FINAL (post-FOFC-blend) time-averaged
        # fluxes, so both cond branches return them alongside the state
        axes_k = sorted(r2["fluxes"])

        def _packf(fl):
            return tuple(fl[d] for d in axes_k)

        def _fallback2_f(_):
            fl1f, fv1f, _flh, _fvh, _m1 = blend_stage1(redo1)
            fl2r, fv2r = compute_fluxes(Ug1, opts)
            flux_avg = {d: 0.5 * (fl1f[d] + fl2r[d]) for d in fl1f}
            vel_avg = {d: 0.5 * (fv1f[d] + fv2r[d]) for d in fv1f}
            U2a = apply_fluxes(flux_avg, vel_avg, None, {}, {})
            redo2b = jnp.logical_not(euler.is_state_valid(U2a, eos))
            n2b = jnp.sum(redo2b)

            def _redo2_branch(_):
                mask_p = mask_fill_fn(redo2b)
                fo_fl, fo_fv = fo_fluxes_fn()
                fl, fv = _blend_fofc(
                    flux_avg, vel_avg, fo_fl, fo_fv, mask_p, opts
                )
                return (apply_fluxes(fl, fv, mask_p, {}, {}),) + _packf(fl)

            def _ok2(_):
                return (U2a,) + _packf(flux_avg)

            res = _lax.cond(redo_any_fn(redo2b), _redo2_branch, _ok2, None)
            return res + (n2b,)

        def _clean2_f(_):
            return (U2_try,) + _packf(r2["fluxes"]) + (jnp.sum(redo2),)

        res = _lax.cond(
            jnp.logical_or(fired1, redo_any_fn(redo2)),
            _fallback2_f, _clean2_f, None,
        )
        U2 = res[0]
        fl_out = {d: res[1 + i] for i, d in enumerate(axes_k)}
        n2 = res[-1]
        U2 = euler.enforce_limits(
            U2, eos, opts.density_floor, opts.temperature_floor,
            opts.n_scalars,
        )
        if opts.use_dual_energy and not eos.is_isothermal:
            U2 = euler.sync_dual_energy(U2)
        return U2, {"n_fofc": n1 + n2, "fluxes": fl_out}

    def _fallback2(_):
        # reproduce the classic path: stage-1 final (blended) fluxes, the
        # raw stage-2 sweep (recomputed here -- the avg kernels only emit
        # divergences), the XLA time average, flux application, and the
        # stage-2 FOFC blend. When stage 1 was clean the blend is the
        # identity bitwise.
        fl1f, fv1f, flh1f, fvh1f, _m1 = blend_stage1(redo1)
        if ghost_free:
            fl2r, fv2r, flh2r, fvh2r = compute_fluxes(Ug1, opts,
                                                      bc_kinds=bc_kinds)
        else:
            fl2r, fv2r = compute_fluxes(Ug1, opts)
            flh2r, fvh2r = {}, {}
        flux_avg = {d: 0.5 * (fl1f[d] + fl2r[d]) for d in fl1f}
        vel_avg = {d: 0.5 * (fv1f[d] + fv2r[d]) for d in fv1f}
        flh_avg = {d: 0.5 * (flh1f[d] + flh2r[d]) for d in flh1f}
        fvh_avg = {d: 0.5 * (fvh1f[d] + fvh2r[d]) for d in fvh1f}
        U2a = apply_fluxes(flux_avg, vel_avg, None, flh_avg, fvh_avg)
        redo2b = jnp.logical_not(euler.is_state_valid(U2a, eos))
        n2b = jnp.sum(redo2b)

        def _redo2_branch(_):
            mask_p = mask_fill_fn(redo2b)
            if ghost_free:
                fo_fl, fo_fv, fo_flh, fo_fvh = fo_fluxes_fn()
                fl, fv, flh, fvh = _blend_fofc(
                    flux_avg, vel_avg, fo_fl, fo_fv, mask_p, opts,
                    bc_kinds, (flh_avg, fvh_avg, fo_flh, fo_fvh),
                )
            else:
                fo_fl, fo_fv = fo_fluxes_fn()
                fl, fv = _blend_fofc(
                    flux_avg, vel_avg, fo_fl, fo_fv, mask_p, opts
                )
                flh, fvh = {}, {}
            return finalize(apply_fluxes(fl, fv, mask_p, flh, fvh))

        U2b = _lax.cond(redo_any_fn(redo2b), _redo2_branch,
                        lambda _: finalize(U2a), None)
        return U2b, n2b

    def _clean2(_):
        return finalize(U2_try), jnp.sum(redo2)

    U2, n2 = _lax.cond(
        jnp.logical_or(fired1, redo_any_fn(redo2)), _fallback2, _clean2, None
    )
    return U2, {"n_fofc": n1 + n2}


def _advance_hydro_rk2_lean(
    U: jnp.ndarray,
    dt,
    opts: HydroOptions,
    fill_fn,
    ng,
    periodic,
    mask_fill_fn=None,
    fill_fn2=None,
    redo_any_fn=None,
    bc_kinds: dict | None = None,
    corr_masks: dict | None = None,
):
    """RK2-SSP hydro step in the LEAN divergence formulation for large
    domains (512^3-class single-chip).

    The sweep kernels emit ONLY accumulated divergence totals -- no face
    array ever reaches HBM, in either RK stage or either FOFC branch:

    - stage 1: div1 = sum_d div(F1_d), applied pointwise;
    - stage 2: by linearity of the divergence, the classic time-averaged
      update equals U + dt/2 * (div1 + div2); the kernels ADD div2 onto
      div1 in place (aliased accumulators), so the peak working set is
      state + one divergence pair (the classic layout's per-axis face
      dicts are 3x(nv+1) fields -- 11 GB at 512^3 f32, unfittable);
    - FOFC redoes re-sweep with the flag mask as a kernel input: the
      first-order blend (reference `replaceFluxes`) happens in VMEM, so
      even the cond fallback branches never materialize faces. Stage-2's
      blended average splits exactly: with G1 = blend(F1, fo, m1|m2) and
      G2 = blend(F2(U1), fo(U0), m2), where(m2f, fo, 0.5*(F1b+F2)) ==
      0.5*(G1+G2) (flagged faces average fo with itself).

    Numerics: identical flux values and blend decisions as the classic
    fused path; only the divergence/average association differs (classic
    divides the averaged flux, lean averages the divergences), i.e.
    agreement to f32 roundoff, exact conservation either way (divergence
    sums telescope)."""
    from jax import lax as _lax

    from .pallas_sweep import compute_fluxes_pallas_div

    eos = opts.eos
    if mask_fill_fn is None:
        mask_fill_fn = lambda m: _pad_mask(m, ng, periodic)
    if redo_any_fn is None:
        redo_any_fn = jnp.any
    if fill_fn2 is None:
        fill_fn2 = fill_fn
    dtype = U.dtype

    def finalize(Ux):
        Ux = euler.enforce_limits(
            Ux, eos, opts.density_floor, opts.temperature_floor,
            opts.n_scalars,
        )
        if opts.use_dual_energy and not eos.is_isothermal:
            Ux = euler.sync_dual_energy(Ux)
        return Ux

    # ---- stage 1
    Ug0 = fill_fn(U)
    r1 = compute_fluxes_pallas_div(Ug0, opts, bc_kinds, accumulate=True,
                                   div_only=True, corr_masks=corr_masks)
    U1_try = _apply_from_divs(U, Ug0, r1["div"], r1["dvel"], dt, ng, opts)
    redo1 = jnp.logical_not(euler.is_state_valid(U1_try, eos))
    n1 = jnp.sum(redo1)
    fired1 = redo_any_fn(redo1)
    # only the BOOL mask survives across stages (the f32 kernel-input
    # masks are derived inside each branch: full-size f32 fields with
    # step-long lifetimes fragment HBM at 512^3)
    m1b = jnp.logical_and(fired1, mask_fill_fn(redo1))
    zcorr = (jnp.zeros_like(r1["corr"]) if corr_masks is not None
             else jnp.zeros((), dtype))

    def _redo1_branch(_):
        m1p = m1b.astype(dtype)
        rb = compute_fluxes_pallas_div(Ug0, opts, bc_kinds, accumulate=True,
                                       div_only=True, fo_mask=m1p,
                                       corr_masks=corr_masks)
        U1b = _apply_from_divs(U, Ug0, rb["div"], rb["dvel"], dt, ng, opts,
                               redo_mask=m1b, bc_kinds=bc_kinds)
        return (finalize(U1b), rb["div"], rb["dvel"],
                rb.get("corr", zcorr))

    U1, div1, dvel1, corr1 = _lax.cond(
        fired1, _redo1_branch,
        lambda _: (finalize(U1_try), r1["div"], r1["dvel"],
                   r1.get("corr", zcorr)), None,
    )

    if opts.rk_order == 1:
        stats1 = {"n_fofc": n1}
        if corr_masks is not None:
            stats1["reflux_corr"] = corr1
        return U1, stats1

    # ---- stage 2: averaged divergences, accumulated onto stage 1's
    Ug1 = fill_fn2(U1)
    r2 = compute_fluxes_pallas_div(Ug1, opts, bc_kinds, accumulate=True,
                                   div_only=True, acc_init=(div1, dvel1),
                                   corr_masks=corr_masks, corr_init=corr1)
    U2_try = _apply_from_divs(U, Ug0, r2["div"], r2["dvel"], 0.5 * dt, ng,
                              opts)
    redo2 = jnp.logical_not(euler.is_state_valid(U2_try, eos))
    n2 = jnp.sum(redo2)

    def _redo2_branch(_):
        m2b = mask_fill_fn(redo2)
        m2p = m2b.astype(dtype)
        mboth = jnp.logical_or(m1b, m2b).astype(dtype)
        # G1 = blend(F1(U0), fo(U0), m1|m2); the stage-2 side G2 =
        # blend(F2(U1), fo(U0), m2). 0.5*(G1+G2) equals the classic
        # blended average exactly (flagged faces average fo with itself).
        g1 = compute_fluxes_pallas_div(Ug0, opts, bc_kinds, accumulate=True,
                                       div_only=True, fo_mask=mboth,
                                       corr_masks=corr_masks)
        if max(U.shape[1:]) > 272:
            # large domains: a 3-state kernel (hi(U1) + fo(U0) + acc
            # windows, all double-buffered whole-sweep) exceeds VMEM, so
            # the stage-2 blend takes its first-order fluxes from the
            # POST-FOFC stage-1 state U1 itself (guaranteed valid by
            # stage 1's own correction + limits) instead of U0. This is
            # the one deliberate deviation from the reference's
            # reuse-the-U0-FO-fluxes convenience (`src/QuokkaSimulation
            # .hpp:1096,1247`): both adjacent cells still see the same
            # Godunov face flux, so conservation is exact, and the
            # donor state is the more current of the two.
            g2 = compute_fluxes_pallas_div(
                Ug1, opts, bc_kinds, accumulate=True, div_only=True,
                fo_mask=m2p, acc_init=(g1["div"], g1["dvel"]),
                corr_masks=corr_masks, corr_init=g1.get("corr"),
            )
        else:
            g2 = compute_fluxes_pallas_div(
                Ug1, opts, bc_kinds, accumulate=True, div_only=True,
                fo_mask=m2p, fo_from=Ug0,
                acc_init=(g1["div"], g1["dvel"]),
                corr_masks=corr_masks, corr_init=g1.get("corr"),
            )
        U2b = _apply_from_divs(U, Ug0, g2["div"], g2["dvel"], 0.5 * dt, ng,
                               opts, redo_mask=m2b, bc_kinds=bc_kinds)
        return finalize(U2b), g2.get("corr", zcorr)

    U2, corr2t = _lax.cond(
        redo_any_fn(redo2), _redo2_branch,
        lambda _: (finalize(U2_try), r2.get("corr", zcorr)), None,
    )
    stats = {"n_fofc": n1 + n2}
    if corr_masks is not None:
        # corr2t = corr1 + corr2 (acc-chained); the register wants the
        # TIME-AVERAGED flux seed 0.5*(corr1 + corr2)
        stats["reflux_corr"] = 0.5 * corr2t
    return U2, stats


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
    bc_kinds: dict | None = None,
    reflux_corr_masks: dict | None = None,
):
    """Full RK2-SSP hydro step (reference `advanceHydroAtLevel`,
    ``src/QuokkaSimulation.hpp:1033-1325``).

    `fill_fn(U) -> Ug` fills ghost zones (physical BCs and, under shard_map,
    the inter-device halos). `fill_fn2`, if given, fills the intermediate
    stage-2 state (AMR uses coarse data time-interpolated to t+dt there,
    mirroring the reference's FillPatcher). With `return_fluxes`, stats
    includes the RK-time-averaged face fluxes used for the update (what the
    reference feeds its flux registers). Returns (U_new, stats_dict).

    `bc_kinds` = {axis: (lo,hi)|None} selects GHOST-FREE stepping: `fill_fn`
    must be the identity, `ng` all zero, and wall BCs (reflect/outflow) are
    assembled inside the Pallas sweep kernels -- every array stays at its
    natural lane-aligned size (the padded layout costs ~1.6x in HBM
    bandwidth on TPU)."""
    eos = opts.eos
    if fill_fn2 is None:
        fill_fn2 = fill_fn
    ghost_free = bc_kinds is not None
    if ghost_free and return_fluxes:
        raise NotImplementedError("return_fluxes is not supported ghost-free")

    # kernel-fused divergence fast path (identical numerics, pointwise
    # common-path update). Flux registers (return_fluxes, the AMR path)
    # ride it too: the stage-2 kernels additionally emit the time-averaged
    # face flux for refluxing (padded RK2 arrays only) -- but only while
    # the kernels fit VMEM: the sweep body's live set at a 264-long padded
    # sweep axis already spills ~81M, and the extra averaged-flux window
    # pushes past the 128M budget (measured on v5e), so large levels fall
    # back to the classic Pallas flux kernels.
    import os as _os

    _fused_reflux_max = int(
        _os.environ.get("QUOKKA_FUSED_REFLUX_MAX_DIM", "176")
    )
    fits_vmem = (
        max(U.shape[1:]) + 2 * opts.nghost <= _fused_reflux_max
    )
    # overall Pallas VMEM ceiling: ghost-free arrays stay unpadded, padded
    # paths grow by 2*nghost before the sweep kernels see them
    ext = max(U.shape[1:]) + (
        0 if bc_kinds is not None else 2 * opts.nghost
    )
    pallas_ok = ext <= _PALLAS_MAX_DIM

    # LEAN divergence mode for large domains (512^3-class): kernels emit
    # only accumulated divergences (in-kernel sweep chunking keeps VMEM
    # bounded; no face arrays keeps HBM bounded). Auto above the classic
    # ceiling; QUOKKA_PALLAS_LEAN=1 forces it (tests), =0 disables.
    _lean_pref = _os.environ.get("QUOKKA_PALLAS_LEAN", "auto")
    _lean_max = int(_os.environ.get("QUOKKA_PALLAS_LEAN_MAX_DIM", "1088"))
    if (
        opts.use_pallas
        and opts.fuse_update
        and len(opts.active_axes) == 3
        and U.dtype == jnp.float32
        and not return_fluxes
        and opts.rk_order == 2
        and (reflux_corr_masks is not None
             or _lean_pref == "1"
             or (_lean_pref == "auto" and not pallas_ok and ext <= _lean_max))
    ):
        # reflux_corr_masks: the in-kernel flux-register seeding mode (the
        # AMR root at benchmark scale) -- requires the lean path (the only
        # formulation whose kernels see the final blended fluxes)
        return _advance_hydro_rk2_lean(
            U, dt, opts, fill_fn, ng, periodic, mask_fill_fn, fill_fn2,
            redo_any_fn, bc_kinds, corr_masks=reflux_corr_masks,
        )
    if reflux_corr_masks is not None:
        raise NotImplementedError(
            "reflux_corr_masks requires the Pallas lean path (f32, 3D, "
            "use_pallas, fuse_update, rk_order 2)"
        )
    if (
        opts.use_pallas
        and opts.fuse_update
        and pallas_ok
        and len(opts.active_axes) == 3
        and U.dtype == jnp.float32
        and (not return_fluxes
             or (bc_kinds is None and opts.rk_order == 2 and fits_vmem))
    ):
        return _advance_hydro_rk2_fused(
            U, dt, opts, fill_fn, ng, periodic, mask_fill_fn, fill_fn2,
            redo_any_fn, bc_kinds, return_fluxes=return_fluxes,
        )

    # ---- stage 1
    Ug0 = fill_fn(U)
    fo_fluxes_fn = lambda: compute_fluxes(Ug0, opts, first_order=True,
                                          bc_kinds=bc_kinds)
    if ghost_free:
        fluxes1, facevels1, flux_hi1, vel_hi1 = compute_fluxes(
            Ug0, opts, bc_kinds=bc_kinds
        )
        U1, fl1, fv1, n_fofc1, flh1, fvh1 = rk2_stage(
            U, Ug0, fluxes1, facevels1, fo_fluxes_fn, dt, ng, periodic, opts,
            mask_fill_fn, redo_any_fn, bc_kinds, flux_hi1, vel_hi1,
        )
    else:
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
    if ghost_free:
        fluxes2, facevels2, flux_hi2, vel_hi2 = compute_fluxes(
            Ug1, opts, bc_kinds=bc_kinds
        )
        flux_avg = {d: 0.5 * (fl1[d] + fluxes2[d]) for d in fl1}
        vel_avg = {d: 0.5 * (fv1[d] + facevels2[d]) for d in fv1}
        flux_hi_avg = {d: 0.5 * (flh1[d] + flux_hi2[d]) for d in flh1}
        vel_hi_avg = {d: 0.5 * (fvh1[d] + vel_hi2[d]) for d in fvh1}
        U2, fl2, _, n_fofc2, _, _ = rk2_stage(
            U, Ug0, flux_avg, vel_avg, fo_fluxes_fn, dt, ng, periodic, opts,
            mask_fill_fn, redo_any_fn, bc_kinds, flux_hi_avg, vel_hi_avg,
        )
    else:
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
