"""Run the reference's own FPS protocol on this machine and record it.

Reproduces /root/reference/scripts/test/test_fps.py:26-45 verbatim
(n in {1e3, 1e4, 1e5, 1e6}; measured steps = 30M/n after 20 warmups;
OMP_NUM_THREADS=8 below 1M, 16 at 1M; random actors, CPU engine) against
the reference build at /tmp/refbuild (see CLAUDE.md "Reference parity
workflow").  Writes one JSON line per sweep point to
results/reference_fps.jsonl: {"n": ..., "fps": ..., "agent_steps_per_s":
..., "omp": ..., "nproc": ..., "wall_s": ...}.

agent_steps_per_s = fps * n, the same normalization RESULTS.md uses for
the TPU sweep (nominal population; the reference protocol itself divides
by nominal n too).

Usage: python scripts/bench_reference.py [--points 1000,10000,...]
       [--cap-steps N] (cap measured steps per point; default = protocol)
"""

import argparse
import json
import os
import re
import subprocess
import sys
import time

REFBUILD = "/tmp/refbuild"
OUT = os.path.join(os.path.dirname(__file__), "..", "results",
                   "reference_fps.jsonl")


def run_point(n, cap_steps, timeout_s):
    n_step = max(int(30_000_000 / n), 1)
    if cap_steps:
        n_step = min(n_step, cap_steps)
    omp = 8 if n < 1_000_000 else 16  # test_fps.py:34-37
    env = dict(os.environ)
    env["PYTHONPATH"] = os.path.join(REFBUILD, "python")
    env["OMP_NUM_THREADS"] = str(omp)
    env.pop("JAX_PLATFORMS", None)
    cmd = [sys.executable, "scripts/test/test_1m.py",
           "--n_step", str(n_step), "--agent_number", str(n)]
    t0 = time.time()
    proc = subprocess.run(cmd, cwd=REFBUILD, env=env, capture_output=True,
                          text=True, timeout=timeout_s)
    wall = time.time() - t0
    m = re.search(r"^FPS (\S+)", proc.stdout, re.M)
    if proc.returncode != 0 or not m:
        sys.stderr.write(proc.stdout[-2000:] + proc.stderr[-2000:])
        raise RuntimeError(f"reference run failed at n={n}")
    fps = float(m.group(1))
    return {"n": n, "fps": fps, "agent_steps_per_s": fps * n,
            "n_step": n_step, "omp": omp, "nproc": os.cpu_count(),
            "wall_s": round(wall, 1)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--points", default="1000,10000,100000,1000000")
    ap.add_argument("--cap-steps", type=int, default=0,
                    help="cap measured steps per point (0 = full protocol)")
    ap.add_argument("--timeout", type=int, default=5400)
    args = ap.parse_args()
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    for n in [int(x) for x in args.points.split(",")]:
        rec = run_point(n, args.cap_steps, args.timeout)
        print(json.dumps(rec), flush=True)
        with open(OUT, "a") as f:
            f.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
    main()
