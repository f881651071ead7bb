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


from quokka_tpu.problems.infrastructure import (
    RadShadowProblem as ShadowProblem,
)


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
