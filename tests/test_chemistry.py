"""Chemistry: stiff network integrator + primordial hydrogen equilibrium.

Mirrors the role of the reference's PrimordialChem test (SURVEY.md §2.4):
the burn must drive the network to its analytic coronal ionization
equilibrium with species totals and charge conserved."""

import jax.numpy as jnp
import numpy as np

from quokka_tpu.microphysics.chemistry import (
    PrimordialHydrogen,
    backward_euler_newton,
    renormalize_species,
)


def test_primordial_hydrogen_equilibrium():
    net = PrimordialHydrogen()
    T = 2.0e4  # K: partially ionized regime
    nH = 1.0  # cm^-3

    # start fully neutral (plus seed electrons to kick off ionization)
    shape = (16,)
    y0 = jnp.zeros((*shape, 3))
    y0 = y0.at[..., 0].set(nH * 0.99)
    y0 = y0.at[..., 1].set(nH * 0.01)
    y0 = y0.at[..., 2].set(nH * 0.01)

    # equilibrium timescale ~ 1/(n_e (k+a)); integrate several e-foldings
    x_eq = float(net.equilibrium_ion_fraction(jnp.asarray(T)))
    k = float(net.k_ci(jnp.asarray(T)))
    a = float(net.alpha_B(jnp.asarray(T)))
    t_eq = 1.0 / (nH * x_eq * (k + a))

    Tfield = jnp.full(shape, T)
    y = y0
    for _ in range(6):
        y = backward_euler_newton(
            lambda yy, TT: net.rhs(yy, TT), y, 3.0 * t_eq, params=Tfield,
            n_subcycles=32, n_newton=10,
        )

    x_num = float(y[0, 1] / (y[0, 0] + y[0, 1]))
    assert abs(x_num - x_eq) / x_eq < 1e-3, (x_num, x_eq)

    # hydrogen nuclei conserved
    nH_final = np.asarray(y[..., 0] + y[..., 1])
    np.testing.assert_allclose(nH_final, nH, rtol=1e-10)
    # charge neutrality
    np.testing.assert_allclose(np.asarray(y[..., 2]), np.asarray(y[..., 1]), rtol=1e-10)


def test_renormalize_species():
    y = jnp.array([[0.6, 0.5, 0.45]])  # slightly off-total
    out = renormalize_species(y, 1.0, charge=[0.0, 1.0, -1.0])
    np.testing.assert_allclose(float(out[0, 0] + out[0, 1]), 1.0, rtol=1e-12)
    np.testing.assert_allclose(float(out[0, 2]), float(out[0, 1]), rtol=1e-12)


def test_dense_solve_matches_linalg():
    """The unrolled row-equilibrated elimination (`_dense_solve`, which the
    TPU f64 emulation can compile, unlike linalg.solve's LU custom call)
    matches linalg.solve on backward-Euler chemistry matrices I - hJ across
    the stiffness range."""
    import jax
    from quokka_tpu.microphysics.chemistry import (
        PrimordialNetwork, _dense_solve)

    net = PrimordialNetwork()
    rng = np.random.default_rng(7)
    jac = jax.jacfwd(lambda y, T: net.rhs(y, T))
    for i in range(8):
        nH = 10.0 ** rng.uniform(-2, 6)
        x_ion = 10.0 ** rng.uniform(-6, 0)
        T = jnp.asarray(10.0 ** rng.uniform(1.5, 6))
        y = np.zeros(12)
        y[1] = nH * (1 - x_ion)
        y[2] = nH * x_ion
        y[6] = 2.6e-5 * y[1]
        y[7] = 2.6e-5 * y[2]
        y[9] = 0.0789 * nH
        y[0] = y[2] + y[7]
        y = jnp.asarray(y)
        for h in (1e2, 1e8, 1e14):  # from mild to extremely stiff
            J = jac(y, T)
            A = jnp.eye(12) - h * J
            r = jnp.asarray(rng.standard_normal(12)) * jnp.maximum(y, 1e-10)
            x_ref = jnp.linalg.solve(A, r)
            x_got = _dense_solve(A, r)
            resid_ref = float(jnp.max(jnp.abs(A @ x_ref - r)))
            resid_got = float(jnp.max(jnp.abs(A @ x_got - r)))
            scale = float(jnp.max(jnp.abs(r))) + 1e-300
            assert resid_got <= max(10 * resid_ref, 1e-10 * scale), (
                f"case {i} h={h}: residual {resid_got} vs ref {resid_ref}"
            )
