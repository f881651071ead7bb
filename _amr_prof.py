from quokka_tpu import ParmParse
from quokka_tpu.amr.hierarchy import AMRSimulation
from quokka_tpu.problems.radhydro_shell import RadhydroShellProblem

pp = ParmParse.from_string("""
geometry.prob_lo = 0.0 0.0 0.0
geometry.prob_hi = 4.0 4.0 4.0
amr.n_cell = 64 64 64
amr.max_level = 1
do_reflux = 1
do_subcycle = 1
cfl = 0.3
radiation.cfl = 0.3
density_floor = 1.0e-8
max_timesteps = 24
stop_time = 1.0e10
profile.enabled = 1
verbose = 0
""")
sim = AMRSimulation(RadhydroShellProblem(), pp, precision="single")
sim.set_initial_conditions()
sim.evolve()
