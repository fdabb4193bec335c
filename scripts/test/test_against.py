"""Baseline sweep of train_against over the algorithm grid
(parity with reference scripts/test/test_against.py)."""

import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
EXAMPLES = os.path.normpath(os.path.join(HERE, "..", "..", "examples"))

if __name__ == "__main__":
    n_round = sys.argv[1] if len(sys.argv) > 1 else "50"
    with open("test_against.log", "a") as rec:
        for alg in ["dqn", "drqn", "a2c"]:
            name = "against-%s" % alg
            cmd = [sys.executable, os.path.join(EXAMPLES, "train_against.py"),
                   "--train", "--n_round", n_round, "--alg", alg,
                   "--name", name]
            print(">>>", " ".join(cmd))
            start = time.time()
            ret = subprocess.run(cmd)
            rec.write("log_file: %s.log\t legend: %s\t wall: %.1f\t code: %d\n"
                      % (name, alg, time.time() - start, ret.returncode))
            rec.flush()
