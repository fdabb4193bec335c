#!/bin/bash
# Round-5 final measurement batch: protocol-faithful 1e6 single world
# (forest + walls), 14x714 repeats, pursuit-at-1000 remeasure, headline.
cd "$(dirname "$0")/.."

echo "=== 14x714 repeats ==="
for i in 1 2; do
  timeout 1200 python scripts/test/test_1m.py --vectorized --agent_number 10000 --n_envs 14 --n_step 1000 </dev/null 2>&1 | tail -2
done

echo "=== 1e6 single world, forest protocol (walls) ==="
timeout 2700 python scripts/test/test_1m.py --vectorized --agent_number 1000000 --n_envs 1 --n_step 4 </dev/null 2>&1 | tail -3

echo "=== pursuit map-1000 remeasure (banded geometry) ==="
timeout 2700 python scripts/bench_pursuit.py --map_size 1000 </dev/null 2>&1 | grep -v WARNING | tail -4

echo "=== headline bench ==="
timeout 900 python bench.py </dev/null 2>&1 | tail -1
echo "=== check_results ==="
timeout 1200 python scripts/test/check_results.py </dev/null 2>&1 | tail -1
echo "=== done $(date) ==="
