"""RadShadow (reference ``src/problems/RadShadow``): a collimated beam and
an opaque clump must cast a sharp shadow -- the defining qualitative test
of the M1 closure (flux-limited diffusion floods the shadow region).

Pass criteria: after >1 crossing time, the irradiated strip carries the
beam energy while the shadowed strip directly behind the clump stays close
to the initial background."""

import jax.numpy as jnp
import numpy as np

from quokka_tpu import ParmParse, Simulation
from quokka_tpu.indices import EGAS, EINT, RHO
from quokka_tpu.registry import (
    BC_OUTFLOW,
    BC_PERIODIC,
    BC_USER,
    BCSpec,
    EOSTraits,
    PhysicsTraits,
    Problem,
    RadTraits,
)

C = 1.0
CHAT = 1.0
ERAD0 = 1.0e-8
KAPPA_CLOUD = 200.0  # optical depth across the clump ~ 200*0.1 = 20
KAPPA_BG = 1.0e-8


class ShadowProblem(Problem):
    name = "RadShadow"
    physics = PhysicsTraits(hydro_enabled=False, radiation_enabled=True)
    # tiny mean molecular weight => enormous heat capacity: the clump is a
    # pure absorber (negligible re-emission over the run)
    eos_traits = EOSTraits(gamma=5.0 / 3.0, mean_molecular_weight=1.0e-8, boltzmann_constant=1.0)
    rad = RadTraits(c_light=C, c_hat=CHAT, radiation_constant=1.0,
                    Erad_floor=ERAD0, beta_order=0)
    bcs = BCSpec(x=(BC_USER, BC_OUTFLOW), y=(BC_OUTFLOW, BC_OUTFLOW))

    def compute_planck_opacity(self, rho, T):
        # rho encodes the clump: opacity proportional to density
        return jnp.where(rho > 1.5, KAPPA_CLOUD, KAPPA_BG)

    def set_initial_conditions(self, grid):
        x, y, _ = grid.cell_center_mesh()
        shape = grid.n_cell
        layout = self.physics.layout()
        # dense circular clump at (0.5, 0.5), radius 0.1
        r2 = (x - 0.5) ** 2 + (y - 0.5) ** 2
        rho = jnp.where(r2 < 0.01, 10.0, 1.0)
        rho = jnp.broadcast_to(rho, shape)
        U = jnp.zeros((layout.nvar, *shape))
        U = U.at[RHO].set(rho)
        U = U.at[EGAS].set(1.0e-5).at[EINT].set(1.0e-5)
        U = U.at[layout.rad_index(0, 0)].set(ERAD0)
        return U

    def fill_user_boundary(self, Ug, grid, ng, time, axis, side):
        assert axis == 0 and side == 0
        g = ng[0]
        layout = self.physics.layout()
        iE, iFx = layout.rad_index(0, 0), layout.rad_index(0, 1)
        nvar = Ug.shape[0]
        vals = jnp.zeros((nvar,), dtype=Ug.dtype)
        vals = vals.at[RHO].set(1.0).at[EGAS].set(1.0e-5).at[EINT].set(1.0e-5)
        vals = vals.at[iE].set(1.0).at[iFx].set(C * 1.0)
        block = jnp.broadcast_to(vals[:, None, None, None], (nvar, g, *Ug.shape[2:]))
        return Ug.at[:, :g].set(block)


def test_shadow_preserved():
    pp = ParmParse.from_string(
        """
        geometry.prob_lo = 0. 0. 0.
        geometry.prob_hi = 1. 1. 1.
        amr.n_cell = 128 128 1
        stop_time = 2.0
        max_timesteps = 4000
        verbose = 0
        """
    )
    prob = ShadowProblem()
    sim = Simulation(prob, pp)
    sim.cfl = 0.4
    sim.set_initial_conditions()
    sim.evolve()

    iE = sim.layout.rad_index(0, 0)
    E = np.asarray(sim.U[iE][:, :, 0])
    x = np.asarray(sim.grid.cell_centers(0))
    y = np.asarray(sim.grid.cell_centers(1))

    # sample at x = 0.85 (behind the clump): shadow strip |y-0.5|<0.05,
    # lit strip 0.2<|y-0.5|<0.3
    ix = np.argmin(np.abs(x - 0.85))
    shadow = E[ix, np.abs(y - 0.5) < 0.05]
    lit = E[ix, (np.abs(y - 0.5) > 0.2) & (np.abs(y - 0.5) < 0.3)]
    print(f"shadow mean={shadow.mean():.3e} lit mean={lit.mean():.3e}")
    assert lit.mean() > 0.5  # beam arrived beside the clump
    assert shadow.mean() < 0.1 * lit.mean()  # sharp shadow survives
    # upstream of the clump the beam is at full strength
    ix0 = np.argmin(np.abs(x - 0.2))
    assert E[ix0, np.abs(y - 0.5) < 0.05].mean() > 0.8
