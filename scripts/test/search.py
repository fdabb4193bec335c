"""Baseline sweep: run an example over the algorithm grid {dqn, drqn, a2c}
and record wall time + log files (parity with reference
scripts/test/search.py)."""

import argparse
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
EXAMPLES = os.path.normpath(os.path.join(HERE, "..", "..", "examples"))

if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--script", default="train_tiger.py")
    parser.add_argument("--n_round", type=int, default=50)
    parser.add_argument("--map_size", type=int, default=64)
    parser.add_argument("--algs", nargs="*", default=["dqn", "drqn", "a2c"])
    args = parser.parse_args()

    with open("search.log", "a") as rec:
        for alg in args.algs:
            name = "%s-%s" % (os.path.splitext(args.script)[0], alg)
            cmd = [sys.executable, os.path.join(EXAMPLES, args.script),
                   "--train", "--n_round", str(args.n_round),
                   "--map_size", str(args.map_size),
                   "--alg", alg, "--name", name]
            print(">>>", " ".join(cmd))
            start = time.time()
            ret = subprocess.run(cmd)
            wall = time.time() - start
            rec.write("log_file: %s.log\t legend: %s\t wall: %.1f\t code: %d\n"
                      % (name, alg, wall, ret.returncode))
            rec.flush()
