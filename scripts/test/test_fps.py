"""FPS sweep over agent counts (parity with reference
scripts/test/test_fps.py: n ∈ {1e3, 1e4, 1e5, 1e6} with a fixed 30M
agent-step budget)."""

import argparse
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))


def run_one(n_agents, budget, vectorized):
    n_step = max(budget // n_agents, 4)
    cmd = [sys.executable, os.path.join(HERE, "test_1m.py"),
           "--agent_number", str(n_agents), "--n_step", str(n_step)]
    if vectorized:
        cmd.append("--vectorized")
    print(">>>", " ".join(cmd))
    subprocess.run(cmd, check=True)


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--budget", type=int, default=30000000,
                        help="agent-step budget per configuration")
    parser.add_argument("--vectorized", action="store_true")
    parser.add_argument("--sizes", type=int, nargs="*",
                        default=[1000, 10000, 100000, 1000000])
    args = parser.parse_args()

    for n in args.sizes:
        run_one(n, args.budget, args.vectorized)
