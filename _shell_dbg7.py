import numpy as np, jax.numpy as jnp
from quokka_tpu import ParmParse
from quokka_tpu.amr.hierarchy import AMRSimulation
from quokka_tpu.problems.radhydro_shell import RadhydroShellProblem

class DbgSim(AMRSimulation):
    def _reflux(self, l, F_crse, F_fine_sum, dt_c):
        pre = bool(jnp.all(jnp.isfinite(self.level_U[l])))
        for d, F in F_crse.items():
            if not bool(jnp.all(jnp.isfinite(F))):
                print(f"  REFLUX l={l}: coarse flux axis {d} NOT finite")
        for d, F in F_fine_sum.items():
            bad = ~jnp.isfinite(F)
            if bool(jnp.any(bad)):
                comps = np.unique(np.asarray(jnp.argwhere(bad))[:, 0])
                print(f"  REFLUX l={l}: fine flux sum axis {d} NaN comps {comps}"
                      f" count {int(jnp.sum(bad))}")
        super()._reflux(l, F_crse, F_fine_sum, dt_c)
        post = bool(jnp.all(jnp.isfinite(self.level_U[l])))
        if pre and not post:
            print(f"  REFLUX l={l} injected NaN")
    def _average_down(self, l):
        pre = bool(jnp.all(jnp.isfinite(self.level_U[l])))
        fine = bool(jnp.all(jnp.isfinite(self.level_U[l + 1])))
        super()._average_down(l)
        post = bool(jnp.all(jnp.isfinite(self.level_U[l])))
        if pre and not post:
            print(f"  AVG_DOWN l={l} injected NaN (fine finite={fine})")
    def _timestep_with_subcycling(self, l, t_level, dt_l):
        super()._timestep_with_subcycling(l, t_level, dt_l)
        if not bool(jnp.all(jnp.isfinite(self.level_U[l]))):
            print(f"  after substep l={l} t={t_level:.5e}: NOT finite")

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
max_timesteps = 4
stop_time = 1.0e10
hydro.use_pallas = 0
verbose = 0
""")
sim = DbgSim(RadhydroShellProblem(), pp, precision="single")
sim.set_initial_conditions()
for s in (1, 2, 3):
    dt = sim.compute_timestep()
    print(f"step {s}")
    sim._substep_valid_flags = []
    sim._timestep_with_subcycling(0, sim.t, dt)
    sim.t += dt; sim.istep += 1; sim.dt_prev = dt
