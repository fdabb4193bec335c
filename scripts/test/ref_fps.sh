#!/bin/bash
# Head-to-head: run the REFERENCE's own FPS protocol
# (/root/reference/scripts/test/test_fps.py:26-45) on this machine's CPUs.
#
# Protocol: forest config, random actors, n agents in {1e3,1e4,1e5,1e6},
# n_step = 30e6/n (+20 warmup), map side = sqrt(20n),
# OMP_NUM_THREADS=8 (<1M) / 16 (1M).  FPS printed = env steps/s;
# agent-steps/s = FPS * n (initial population; same convention as our
# scripts/test/test_1m.py sweep).
#
# Usage: bash scripts/test/ref_fps.sh [outfile]
# Requires the reference built at /tmp/refbuild (CLAUDE.md workflow).
set -u
OUT=${1:-/tmp/ref_fps.log}
cd /tmp/refbuild
: > "$OUT"
echo "nproc=$(nproc)" >> "$OUT"
for n in 1000 10000 100000 1000000; do
  n_step=$((30000000 / n))
  if [ "$n" -lt 1000000 ]; then omp=8; else omp=16; fi
  echo "=== n=$n n_step=$n_step OMP_NUM_THREADS=$omp ===" >> "$OUT"
  start=$(date +%s)
  OMP_NUM_THREADS=$omp PYTHONPATH=/tmp/refbuild/python \
    timeout 7200 python scripts/test/test_1m.py \
    --n_step "$n_step" --agent_number "$n" --num_gpu 0 2>&1 \
    | grep -E "^FPS|game over" >> "$OUT"
  echo "wall=$(( $(date +%s) - start ))s" >> "$OUT"
done
echo DONE >> "$OUT"
