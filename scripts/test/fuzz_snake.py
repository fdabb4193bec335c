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


def child(engine, spec, out, reference, render_dir=None):
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
    trace = run_snake_spec(mod, spec, engine_mode=mode,
                           render_dir=render_dir)
    np.savez_compressed(out, **flatten_snake_trace(trace))


def compare_replays(ref_dir, tpu_dir):
    """Structural replay comparison.  The reference's food block iterates a
    std::set<Food*> keyed by HEAP ADDRESSES (RenderGenerator.cc:175), so
    its order is not reproducible even across its own runs: food lines
    compare as multisets of (x, y); snake segments compare as the exact
    sequence; static.map compares as a wall set."""
    def walls(path):
        lines = open(path).read().split()
        return sorted(zip(lines[1::2], lines[2::2]))

    wa = os.path.join(ref_dir, "static.map")
    wb = os.path.join(tpu_dir, "static.map")
    if not (os.path.exists(wa) and os.path.exists(wb)):
        return "static.map missing (%s %s)" % (
            os.path.exists(wa), os.path.exists(wb))
    if walls(wa) != walls(wb):
        return "static.map wall sets differ"

    va = os.path.join(ref_dir, "video_1.txt")
    vb = os.path.join(tpu_dir, "video_1.txt")
    if not (os.path.exists(va) and os.path.exists(vb)):
        return "video_1.txt missing (ref %s, tpu %s)" % (
            os.path.exists(va), os.path.exists(vb))

    def frames(path):
        out = []
        for line in open(path):
            parts = line.split()
            if parts[0] == "F":
                out.append({"header": tuple(parts[1:]), "food": [],
                            "snake": []})
            else:
                _id, hp, d, x, y, group = parts
                rec = (hp, d, x, y, group)
                (out[-1]["food"] if group == "1"
                 else out[-1]["snake"]).append(rec)
        return out

    fa, fb = frames(va), frames(vb)
    if len(fa) != len(fb):
        return "frame counts differ: %d vs %d" % (len(fa), len(fb))
    for k, (a, b) in enumerate(zip(fa, fb)):
        if a["header"] != b["header"]:
            return "frame %d headers differ: %s vs %s" % (
                k, a["header"], b["header"])
        if sorted(a["food"]) != sorted(b["food"]):
            return "frame %d food sets differ" % k
        if a["snake"] != b["snake"]:
            return "frame %d snake segments differ" % k
    return None


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--reference", default="/tmp/refbuild")
    parser.add_argument("--seeds", type=int, default=10)
    parser.add_argument("--start", type=int, default=0)
    parser.add_argument("--render", action="store_true",
                        help="also dump + structurally compare replays")
    parser.add_argument("--child", choices=["ref", "tpu"])
    parser.add_argument("--spec")
    parser.add_argument("--out")
    parser.add_argument("--render-dir")
    args = parser.parse_args()

    if args.child:
        child(args.child, json.loads(args.spec), args.out, args.reference,
              render_dir=args.render_dir)
        return

    failures = 0
    for seed in range(args.start, args.start + args.seeds):
        spec = random_spec(seed)
        traces = {}
        render_fail = None
        with tempfile.TemporaryDirectory() as td:
            for engine in ("ref", "tpu"):
                out = os.path.join(td, engine + ".npz")
                cmd = [sys.executable, os.path.abspath(__file__),
                       "--child", engine, "--spec", json.dumps(spec),
                       "--out", out, "--reference", args.reference]
                if args.render:
                    rdir = os.path.join(td, engine + "_render")
                    os.makedirs(rdir, exist_ok=True)
                    cmd += ["--render-dir", rdir]
                proc = subprocess.run(
                    cmd,
                    capture_output=True, text=True, timeout=600,
                    env=dict(os.environ, OMP_NUM_THREADS="1",
                             JAX_PLATFORMS="cpu"),
                )
                if proc.returncode != 0:
                    print("seed %d %s CRASHED:\n%s" % (
                        seed, engine, proc.stderr[-1500:]), flush=True)
                    break
                traces[engine] = dict(np.load(out))
            if args.render and len(traces) == 2:
                render_fail = compare_replays(
                    os.path.join(td, "ref_render"),
                    os.path.join(td, "tpu_render"))
        if len(traces) != 2:
            failures += 1
            continue
        if render_fail:
            failures += 1
            print("seed %d FAILED: %s" % (seed, render_fail), flush=True)
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
