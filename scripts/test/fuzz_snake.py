"""Randomized DiscreteSnake differential fuzz: reference C++ engine vs the
sequential snake engine, over random scenario parameters — beyond the one
fixed snake golden.

The snake engine consumes the PER-PROCESS glibc random() stream from its
startup state (DiscreteSnake.cc:84,111 uses random()/srand), so every
trace must be produced in a FRESH process (same constraint as
tests/golden/generate_golden.py).  This driver spawns one child per
(engine, seed), collects the npz traces, and compares them field by field.

Usage:
    python scripts/test/fuzz_snake.py [--seeds 10] [--start 0]
        [--reference /tmp/refbuild]
Child mode (internal):
    python scripts/test/fuzz_snake.py --child {ref,tpu} --spec '<json>' \
        --out trace.npz
"""

import argparse
import json
import os
import random
import subprocess
import sys
import tempfile

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
GOLDEN = os.path.join(REPO, "tests", "golden")


def random_spec(seed):
    rng = random.Random(seed)
    m = rng.choice([16, 24, 32])
    v = rng.choice([7, 11, 15])
    return dict(
        map_width=m, map_height=m, view_width=v, view_height=v,
        total_resource=rng.choice([20, 40, 80]),
        n_food=rng.randrange(5, 30),
        n_agents=rng.randrange(2, 9),
        steps=rng.randrange(8, 30),
        action_seed=1000 + seed,
    )


def child(engine, spec, out, reference):
    sys.path.insert(0, GOLDEN)
    sys.path.insert(0, REPO)
    from scenarios import flatten_snake_trace, run_snake_spec

    if engine == "ref":
        os.environ["OMP_NUM_THREADS"] = "1"
        sys.path.insert(0, os.path.join(reference, "python"))
        import magent as mod
    else:
        import jax
        jax.config.update("jax_platforms", "cpu")
        import magent_tpu as mod
    mode = "sequential" if engine == "tpu" else None
    trace = run_snake_spec(mod, spec, engine_mode=mode)
    np.savez_compressed(out, **flatten_snake_trace(trace))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--reference", default="/tmp/refbuild")
    parser.add_argument("--seeds", type=int, default=10)
    parser.add_argument("--start", type=int, default=0)
    parser.add_argument("--child", choices=["ref", "tpu"])
    parser.add_argument("--spec")
    parser.add_argument("--out")
    args = parser.parse_args()

    if args.child:
        child(args.child, json.loads(args.spec), args.out, args.reference)
        return

    failures = 0
    for seed in range(args.start, args.start + args.seeds):
        spec = random_spec(seed)
        traces = {}
        with tempfile.TemporaryDirectory() as td:
            for engine in ("ref", "tpu"):
                out = os.path.join(td, engine + ".npz")
                proc = subprocess.run(
                    [sys.executable, os.path.abspath(__file__),
                     "--child", engine, "--spec", json.dumps(spec),
                     "--out", out, "--reference", args.reference],
                    capture_output=True, text=True, timeout=600,
                    env=dict(os.environ, OMP_NUM_THREADS="1",
                             JAX_PLATFORMS="cpu"),
                )
                if proc.returncode != 0:
                    print("seed %d %s CRASHED:\n%s" % (
                        seed, engine, proc.stderr[-1500:]), flush=True)
                    break
                traces[engine] = dict(np.load(out))
        if len(traces) != 2:
            failures += 1
            continue
        ref, ours = traces["ref"], traces["tpu"]
        try:
            assert set(ref) == set(ours), set(ref) ^ set(ours)
            for key, rv in ref.items():
                where = "seed %d %s" % (seed, key)
                if key.startswith(("rew", "view0", "feat0")):
                    np.testing.assert_allclose(ours[key], rv, atol=1e-5,
                                               err_msg=where)
                else:
                    np.testing.assert_array_equal(ours[key], rv,
                                                  err_msg=where)
            print("seed %d ok (%d steps, %s)"
                  % (seed, int(ref["steps"]),
                     {k: spec[k] for k in ("map_width", "n_agents", "n_food")}),
                  flush=True)
        except AssertionError as e:
            failures += 1
            print("seed %d FAILED: %s" % (seed, str(e)[:500]), flush=True)
    print("done: %d/%d seeds passed" % (args.seeds - failures, args.seeds))
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
