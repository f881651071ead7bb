import numpy as np, jax.numpy as jnp
from quokka_tpu import ParmParse
from quokka_tpu.amr.hierarchy import AMRSimulation
from quokka_tpu.problems.radhydro_shell import RadhydroShellProblem

class CapSim(AMRSimulation):
    def _get_level_step(self, l):
        fn = super()._get_level_step(l)
        if getattr(fn, "_wrapped", False) or l != 2:
            return fn
        def wrapped(*args):
            U_new, fluxes, stats = fn(*args)
            bad = any(bool(jnp.any(~jnp.isfinite(F))) for F in fluxes.values())
            if bad and not getattr(wrapped, "_saved", False):
                wrapped._saved = True
                np.savez("/tmp/l2_inputs.npz",
                         U=np.asarray(args[0]), mask=np.asarray(args[1]),
                         Uc_old=np.asarray(args[2]), Uc_new=np.asarray(args[3]),
                         th1=np.asarray(args[4]), th2=np.asarray(args[5]),
                         dt=np.asarray(args[6]))
                print("SAVED failing L2 inputs")
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
sim = CapSim(RadhydroShellProblem(), pp, precision="single")
sim.set_initial_conditions()
for s in (1, 2):
    dt = sim.compute_timestep()
    sim._substep_valid_flags = []
    sim._timestep_with_subcycling(0, sim.t, dt)
    sim.t += dt; sim.istep += 1; sim.dt_prev = dt
    import os
    if os.path.exists("/tmp/l2_inputs.npz"):
        break
print("done")
