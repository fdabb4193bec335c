#!/bin/bash
# Round-5 follow-up: 1e4 layout/unroll hunt (0.94x vs intended, want >=1x)
# and the banded window-kernel ladder (ask 5).
cd "$(dirname "$0")/.."
T1M="python scripts/test/test_1m.py --vectorized"

run() {
  echo "=== $* ($(date +%H:%M:%S)) ==="
  timeout 1800 $T1M "$@" </dev/null
  echo
}

echo "===== 1e4 layout/unroll hunt ====="
run --agent_number 10000 --n_envs 16 --n_step 800
run --agent_number 10000 --n_envs 16 --n_step 800 --unroll 2
run --agent_number 10000 --n_envs 24 --n_step 800
run --agent_number 10000 --n_envs 20 --n_step 800
run --agent_number 10000 --n_envs 12 --n_step 600
run --agent_number 10000 --n_envs 24 --n_step 800 --unroll 2

echo "===== banded ladder 16x62500 (map 1118) ====="
timeout 2400 python scripts/profile_banded.py --n_envs 16 --per_env 62500 </dev/null

echo "===== banded ladder 1x1000000 (map 4472) ====="
timeout 2400 python scripts/profile_banded.py --n_envs 1 --per_env 1000000 --steps 4 </dev/null

echo "===== banded ladder 1x100000 (map 1414) ====="
timeout 2400 python scripts/profile_banded.py --n_envs 1 --per_env 100000 --steps 16 </dev/null

echo "===== done $(date) ====="
