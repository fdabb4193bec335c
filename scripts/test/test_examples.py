"""Integration smoke test: run every training example for one round and
assert exit code 0 (parity with reference scripts/test/test_examples.py)."""

import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
EXAMPLES = os.path.normpath(os.path.join(HERE, "..", "..", "examples"))

candidates = [
    ("train_battle.py", ["--train", "--n_round", "1", "--map_size", "32"]),
    ("train_single.py", ["--train", "--n_round", "1", "--map_size", "32"]),
    ("train_against.py", ["--train", "--n_round", "1", "--map_size", "32"]),
    ("train_multi.py", ["--train", "--n_round", "1", "--map_size", "32"]),
    ("train_pursuit.py", ["--train", "--n_round", "1", "--map_size", "64"]),
    ("train_tiger.py", ["--train", "--n_round", "1", "--map_size", "64"]),
    ("train_gather.py", ["--train", "--n_round", "1", "--map_size", "50"]),
    ("train_trans.py", ["--train", "--n_round", "1", "--map_size", "32"]),
    ("train_arrange.py", ["--train", "--n_round", "1", "--map_size", "48",
                          "--message", "HI"]),
]

if __name__ == "__main__":
    env = dict(os.environ)
    env.setdefault("JAX_PLATFORMS", "cpu")
    failed = []
    for script, extra in candidates:
        path = os.path.join(EXAMPLES, script)
        cmd = [sys.executable, path] + extra
        print(">>>", " ".join(cmd))
        ret = subprocess.run(cmd, env=env)
        if ret.returncode != 0:
            failed.append(script)
    if failed:
        print("FAILED:", failed)
        sys.exit(1)
    print("all examples passed")
