"""Integration smoke test: run every training example for one round on the
JAX backend, then rerun the set on the torch backend via ``--backend torch``
(parity with the reference harness, which sed-swaps tf_model -> mx_model
and reruns every example: reference scripts/test/test_examples.py:16-31)."""

import argparse
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
    ap = argparse.ArgumentParser()
    ap.add_argument("--backends", default="jax,torch",
                    help="comma-separated backend list to sweep")
    args = ap.parse_args()

    env = dict(os.environ)
    env.setdefault("JAX_PLATFORMS", "cpu")
    failed = []
    for backend in args.backends.split(","):
        for script, extra in candidates:
            path = os.path.join(EXAMPLES, script)
            cmd = [sys.executable, path] + extra + ["--backend", backend]
            print(">>>", " ".join(cmd))
            ret = subprocess.run(cmd, env=env)
            if ret.returncode != 0:
                failed.append(f"{script} [{backend}]")
    if failed:
        print("FAILED:", failed)
        sys.exit(1)
    print("all examples passed on all backends")
