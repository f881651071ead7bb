import numpy as np, jax.numpy as jnp
from quokka_tpu import ParmParse
from quokka_tpu.amr.hierarchy import AMRSimulation
from quokka_tpu.problems.radhydro_shell import RadhydroShellProblem

class DbgSim(AMRSimulation):
    def _get_level_step(self, l):
        fn = super()._get_level_step(l)
        if getattr(fn, "_wrapped", False) or l != 2:
            return fn
        def wrapped(*args):
            U_new, fluxes, stats = fn(*args)
            if getattr(wrapped, "_done", False):
                return U_new, fluxes, stats
            F = fluxes[0]
            bad = np.asarray(~jnp.isfinite(F))
            if bad.any():
                wrapped._done = True
                mask = np.asarray(args[1])
                g = 4
                ii = np.argwhere(bad[0])  # component 0 (RHO flux)
                print(f"L2 NaN RHO-flux faces: {len(ii)}")
                ins = outs = edge = 0
                for (x, y, zz) in ii[:2000]:
                    cx, cy, cz = x - g, y - g, zz - g  # cell right of face
                    vals = []
                    for dx_ in (-1, 0):
                        xx = cx + dx_
                        if 0 <= xx < mask.shape[0] and 0 <= cy < mask.shape[1] and 0 <= cz < mask.shape[2]:
                            vals.append(bool(mask[xx, cy, cz]))
                        else:
                            vals.append(None)
                    if all(v is True for v in vals if v is not None):
                        ins += 1
                    elif all(v is False for v in vals if v is not None):
                        outs += 1
                    else:
                        edge += 1
                print(f"faces with both cells IN mask: {ins}, both OUT: {outs}, edge/ghost: {edge}")
                x, y, zz = ii[0]
                U = np.asarray(args[0])
                print("first face padded idx:", (x, y, zz),
                      "cells rho:", U[0, x-g-1, y-g, zz-g] if x-g-1>=0 else "?",
                      U[0, x-g, y-g, zz-g] if x-g < U.shape[1] else "?")
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
    sim._substep_valid_flags = []
    sim._timestep_with_subcycling(0, sim.t, dt)
    sim.t += dt; sim.istep += 1; sim.dt_prev = dt
print("done")
