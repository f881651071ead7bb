import numpy as np, jax.numpy as jnp
from quokka_tpu import ParmParse
from quokka_tpu.amr.hierarchy import AMRSimulation
from quokka_tpu.problems.radhydro_shell import RadhydroShellProblem

class DbgSim(AMRSimulation):
    def _get_level_step(self, l):
        fn = super()._get_level_step(l)
        if getattr(fn, "_wrapped", False):
            return fn
        def wrapped(*args):
            U_new, fluxes, stats = fn(*args)
            for d, F in fluxes.items():
                bad = ~jnp.isfinite(F)
                n = int(jnp.sum(bad))
                if n:
                    ii = np.asarray(jnp.argwhere(bad))
                    print(f"    L{l} ax{d}: {n} NaN flux entries, "
                          f"n_fofc={int(stats.get('n_fofc', -1))}, "
                          f"state finite={bool(jnp.all(jnp.isfinite(U_new)))}")
                    print(f"      first idx: {ii[0]}, shape {F.shape}")
                    break
            return U_new, fluxes, stats
        wrapped._wrapped = True
        self._level_step_jits[l] = wrapped
        return wrapped

pp = ParmParse.from_string("""
geometry.prob_lo = 0.0 0.0 0.0
geometry.prob_hi = 4.0 4.0 4.0
amr.n_cell = 16 16 16
amr.max_level = 2
do_reflux = 1
do_subcycle = 1
cfl = 0.3
radiation.cfl = 0.3
density_floor = 1.0e-8
regrid_interval = 1000000
stop_time = 1.0e10
hydro.use_pallas = 0
verbose = 0
""")
sim = DbgSim(RadhydroShellProblem(), pp, precision="single")
sim.set_initial_conditions()
for s in (1, 2):
    dt = sim.compute_timestep()
    print(f"step {s}")
    sim._substep_valid_flags = []
    sim._timestep_with_subcycling(0, sim.t, dt)
    sim.t += dt; sim.istep += 1; sim.dt_prev = dt
