#!/usr/bin/env bash
# CI driver (the analog of the reference's GitHub Actions matrix,
# .github/workflows/cmake.yml + checkpoint-restart.yml; SURVEY.md §4):
#
#   ./ci.sh fast      - quick correctness tier (minutes): core solver +
#                       restart + sharding + chemistry/cooling wiring
#   ./ci.sh full      - the whole suite (tests/ on the virtual CPU mesh)
#   ./ci.sh golden    - golden-file regression tier
#   ./ci.sh debug     - sanitizer analog: eager (jit-disabled) leg of the
#                       fast tier, catching tracer leaks / shape bugs that
#                       compiled runs can mask (the reference runs its
#                       suite under ASan/UBSan + FPE trapping)
#   ./ci.sh tpu       - on-chip tier (needs a TPU): drives the library
#                       end-to-end on real hardware -- ghost-free Sedov,
#                       f64 shocktube at the reference tolerance, and the
#                       ghost-free parity tests against the padded path
#   ./ci.sh all       - fast + debug + golden + full
set -euo pipefail
cd "$(dirname "$0")"

tier="${1:-fast}"

FAST_TESTS=(
  tests/test_hydro_shocktube.py
  tests/test_advection.py
  tests/test_restart_equivalence.py
  tests/test_fused_evolve.py
  tests/test_sharded.py
  tests/test_amr.py
  tests/test_radiation_streaming.py
  tests/test_radiation_coupling.py
  tests/test_primordial_chem_integration.py
  tests/test_cooling_tables.py
)

run_fast()   { python -m pytest "${FAST_TESTS[@]}" -q -x; }

# full tier: file-level parallel shards. Each pytest process builds its
# own virtual 8-device CPU mesh (per-process XLA clients are independent),
# so shards are safe to run concurrently; JOBS bounds host oversubscription
# and CI_BUDGET_MIN bounds the wall clock (a shard that exceeds it fails
# the tier rather than silently never finishing -- the round-2 suite had
# quietly grown past an hour serial).
run_full() {
  local ncpu
  ncpu=$(nproc)
  local jobs="${CI_JOBS:-$(( ncpu > 4 ? 4 : ncpu ))}"
  local budget_min="${CI_BUDGET_MIN:-30}"
  mkdir -p /tmp/quokka_ci
  # longest-processing-time-first assignment: known-heavy files (measured
  # on this host) get weights so several of them can't stack into one
  # round-robin shard and trip the budget; everything else weighs 1
  python - "$jobs" > /tmp/quokka_ci/shards.txt <<'PYEOF'
import glob, sys
jobs = int(sys.argv[1])
weights = {  # ~minutes on the virtual CPU mesh (heavy files only)
    "tests/test_lean_update.py": 10,
    "tests/test_packed_engine.py": 16,
    "tests/test_sharded.py": 6,
    "tests/test_tilepool_radhydro.py": 5,
    "tests/test_tilepool_hydro.py": 4,
    "tests/test_amr_sharded.py": 4,
    "tests/test_mhd.py": 3,
    "tests/test_amr.py": 3,
    "tests/test_radiation_marshak.py": 3,
}
files = sorted(glob.glob("tests/test_*.py"))
files.sort(key=lambda f: -weights.get(f, 1))
shards = [[] for _ in range(jobs)]
load = [0.0] * jobs
for f in files:
    j = load.index(min(load))
    shards[j].append(f)
    load[j] += weights.get(f, 1)
for s in shards:
    print(" ".join(s))
PYEOF
  local pids=() logs=() j=0
  while IFS= read -r group; do
    [ -z "$group" ] && continue
    local log="/tmp/quokka_ci/shard$j.log"
    logs+=("$log")
    # shellcheck disable=SC2086
    timeout "$((budget_min*60))" python -m pytest $group -q > "$log" 2>&1 &
    pids+=($!)
    j=$((j+1))
  done < /tmp/quokka_ci/shards.txt
  local rc=0
  for ((k=0; k<j; k++)); do
    if wait "${pids[k]}"; then
      tail -2 "${logs[k]}" | sed "s/^/[shard $k] /"
    else
      rc=1
      echo "[shard $k] FAILED -- full log tail:"
      tail -40 "${logs[k]}" | sed "s/^/[shard $k] /"
    fi
  done
  return $rc
}
run_golden() { python -m pytest tests/test_golden_regression.py -q; }
run_debug()  {
  # eager leg: disable jit for a representative subset (slow per-op
  # dispatch, so the subset is small); JAX_DISABLE_JIT surfaces python-
  # level bugs (tracer leaks, concretization, indexing) that jit hides
  JAX_DISABLE_JIT=1 python -m pytest \
    tests/test_hydro_shocktube.py::test_shocktube_plm_coarse \
    tests/test_ode_integration.py \
    -q -x
}

run_tpu() {
  # on-chip validation: the test platform override lets the conftest keep
  # the default (TPU) backend instead of forcing the CPU mesh
  QUOKKA_TPU_TEST_PLATFORM=tpu python -m pytest \
    "tests/test_ghostfree.py::test_ghostfree_matches_padded[True-reflect_all]" \
    -q -x
  python - <<'PYEOF'
import numpy as np
from quokka_tpu import ParmParse, Simulation
from quokka_tpu.problems.shocktube import ShocktubeProblem

pp = ParmParse.from_file("decks/shocktube.in")
sim = Simulation(ShocktubeProblem(), pp, precision="double")
sim.set_initial_conditions()
sim.evolve()
assert sim.error_norm < 0.002, sim.error_norm  # reference tolerance
print(f"TPU f64 shocktube L1 = {sim.error_norm:.5f} < 0.002")
PYEOF
  # PopIII (gravity + turbulence + 12-species chemistry) on-chip: the
  # code-units formulation is the one whose magnitudes fit the TPU f64
  # emulation's f32 exponent range (raw CGS overflows it)
  python - <<'PYEOF'
import numpy as np
from quokka_tpu import ParmParse, Simulation
from quokka_tpu.problems.popiii import PopIIICodeUnitsProblem

prob = PopIIICodeUnitsProblem()
u_rho, u_len, u_t = prob.units
r = lambda x: repr(float(x))
cfg = f"""
geometry.prob_lo = {r(-3.703e18/u_len)} {r(-3.703e18/u_len)} {r(-3.703e18/u_len)}
geometry.prob_hi = {r(3.703e18/u_len)} {r(3.703e18/u_len)} {r(3.703e18/u_len)}
amr.n_cell = 16 16 16
cfl = 0.15
max_timesteps = 3
stop_time = {r(1e16/u_t)}
do_subcycle = 0
density_floor = {r(1e-25/u_rho)}
chemistry.enabled = 1
chemistry.min_density_allowed = 5e-21
verbose = 0
"""
sim = Simulation(prob, ParmParse.from_string(cfg), precision="double")
sim.set_initial_conditions()
sim.evolve()
U = np.asarray(sim.U)
assert np.all(np.isfinite(U)), "PopIII on-chip produced non-finite state"
assert np.all(U[0] > 0)
print("TPU PopIII (code units, f64) smoke: 3 steps finite")
PYEOF
}

case "$tier" in
  fast)   run_fast ;;
  full)   run_full ;;
  golden) run_golden ;;
  debug)  run_debug ;;
  all)    run_fast; run_debug; run_golden; run_full ;;
  tpu)    run_tpu ;;
  *) echo "usage: ./ci.sh [fast|full|golden|debug|all]" >&2; exit 2 ;;
esac
echo "ci.sh: tier '$tier' PASSED"
