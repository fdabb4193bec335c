"""Regression gate for the recorded RESULTS.md numbers.

Runs the headline bench on the chip and asserts it is within --tolerance
of the recorded value (default: no more than 25% below).  Wire into any
round: ``python scripts/test/check_results.py``.
"""

import argparse
import json
import os
import re
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(os.path.dirname(HERE))

RECORDED = {
    # metric name -> recorded value (keep in sync with RESULTS.md)
    "battle_2x1000_agent_steps_per_s": 11.17e6,
}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--tolerance", type=float, default=0.25,
                   help="maximum allowed fractional regression")
    args = p.parse_args()

    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True, text=True, timeout=900)
    lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
    if out.returncode != 0 or not lines:
        sys.stderr.write(out.stderr[-2000:] + "\n")
        print(json.dumps({"status": "BENCH_FAILED",
                          "returncode": out.returncode}))
        sys.exit(2)
    rec = json.loads(lines[-1])
    name = rec["metric"]
    value = rec["value"]
    want = RECORDED[name]
    floor = want * (1 - args.tolerance)
    status = "OK" if value >= floor else "REGRESSION"
    print(json.dumps({"metric": name, "value": value, "recorded": want,
                      "floor": round(floor, 1), "status": status}))
    if value < floor:
        sys.exit(1)


if __name__ == "__main__":
    main()
