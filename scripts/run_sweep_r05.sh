#!/bin/bash
# Round-5 FPS sweep: workload-faithful (n/10 interior walls), single-world
# rows at every point, and 3x repeats at 1e3 (tunnel-variance bound).
# Appends everything to results/sweep_r05.log.
cd "$(dirname "$0")/.."
T1M="python scripts/test/test_1m.py --vectorized"

run() {
  echo "=== $* ($(date +%H:%M:%S)) ==="
  timeout 1800 $T1M "$@" </dev/null
  echo
}

echo "===== sweep r05 start $(date) ====="

# 1e3 single world, 3 repeats (ask 7: mean +/- spread; >=0.5s of scan/call)
run --agent_number 1000 --n_envs 1 --n_step 2500
run --agent_number 1000 --n_envs 1 --n_step 2500
run --agent_number 1000 --n_envs 1 --n_step 2500

# 1e4: layout ladder + single world + no-walls reference point (ask 1)
run --agent_number 10000 --n_envs 16 --n_step 400
run --agent_number 10000 --n_envs 8 --n_step 400
run --agent_number 10000 --n_envs 32 --n_step 400
run --agent_number 10000 --n_envs 16 --n_step 400 --no_walls
run --agent_number 10000 --n_envs 1 --n_step 100
run --agent_number 10000 --n_envs 1 --n_step 100

# 1e5: best layout (walled) + single world
run --agent_number 100000 --n_envs 64 --n_step 80
run --agent_number 100000 --n_envs 64 --n_step 80 --no_walls
run --agent_number 100000 --n_envs 1 --n_step 30

# 1e6: best layout (walled)
run --agent_number 1000000 --n_envs 512 --n_step 20

echo "===== per-phase ladder at 1e4 (ask 1i) ====="
timeout 1800 python scripts/profile_sweep.py --agent_number 10000 --n_envs 16 --steps 64 </dev/null

echo "===== sweep r05 done $(date) ====="
