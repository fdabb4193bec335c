"""Golden-trajectory generator: drives the REFERENCE C++ engine over the
shared scenarios and dumps per-step traces to .npz.

Usage:
    python tests/golden/generate_golden.py --reference /tmp/refbuild

where --reference points at a checkout of geek-ai/MAgent with
build/libmagent.so already built (cmake + ninja magent).  The resulting
golden_<scenario>.npz files are committed; the parity tests replay them
without needing the reference build.
"""

import argparse
import os
import sys

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, HERE)

from scenarios import (SCENARIOS, SNAKE_SCENARIOS, flatten_snake_trace,  # noqa: E402
                       flatten_trace, run_scenario, run_snake_scenario)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--reference", default="/tmp/refbuild")
    parser.add_argument("--scenarios", nargs="*", default=sorted(SCENARIOS))
    args = parser.parse_args()

    sys.path.insert(0, os.path.join(args.reference, "python"))
    # the reference engine must run single-threaded for bit-exact
    # event ordering (its attack loop is an OpenMP merge reduction)
    os.environ["OMP_NUM_THREADS"] = "1"
    import magent  # the reference package

    for name in args.scenarios:
        print("generating", name, "...")
        if name in SNAKE_SCENARIOS:
            # NOTE: snake scenarios consume the per-process glibc random()
            # stream from its startup state — generate them in a FRESH
            # process with ONLY snake scenarios listed (see scenarios.py)
            trace = run_snake_scenario(magent, name)
            flat = flatten_snake_trace(trace)
            out = os.path.join(HERE, "golden_%s.npz" % name)
            np.savez_compressed(out, **flat)
            print("  %d steps -> %s (%.1f KB)" %
                  (trace["steps"], out, os.path.getsize(out) / 1024))
            continue
        trace = run_scenario(magent, name)
        flat = flatten_trace(trace, 2)
        out = os.path.join(HERE, "golden_%s.npz" % name)
        np.savez_compressed(out, **flat)
        print("  %d steps -> %s (%.1f KB)" %
              (trace["steps"], out, os.path.getsize(out) / 1024))


if __name__ == "__main__":
    main()
