"""Golden-trajectory parity vs the reference C++ engine.

Golden .npz traces were dumped from the reference (geek-ai/MAgent,
build/libmagent.so) by tests/golden/generate_golden.py over the shared
scenarios in tests/golden/scenarios.py.  Here the same scenarios run on
magent_tpu in ``sequential`` (reference-order) engine mode and every step's
populations, ids, positions, liveness, rewards — and the step-0 observations
— must match.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "golden"))

import magent_tpu  # noqa: E402
from scenarios import SCENARIOS, flatten_trace, run_scenario  # noqa: E402

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")


def _load(name):
    path = os.path.join(GOLDEN_DIR, "golden_%s.npz" % name)
    if not os.path.exists(path):
        pytest.skip("golden trace missing: " + path)
    return dict(np.load(path))


@pytest.mark.parametrize("name", sorted(SCENARIOS))
def test_sequential_engine_matches_reference(name):
    golden = _load(name)
    trace = flatten_trace(run_scenario(magent_tpu, name,
                                       engine_mode="sequential"), 2)

    assert int(trace["steps"]) == int(golden["steps"]), (
        "episode length: ours %d vs reference %d"
        % (int(trace["steps"]), int(golden["steps"]))
    )
    np.testing.assert_array_equal(trace["done"], golden["done"])

    for g in range(2):
        np.testing.assert_array_equal(
            trace["num_%d" % g], golden["num_%d" % g],
            err_msg="population of group %d diverged" % g,
        )
        for key in ("ids", "pos", "alive"):
            np.testing.assert_array_equal(
                trace["%s_%d_data" % (key, g)],
                golden["%s_%d_data" % (key, g)],
                err_msg="%s of group %d diverged" % (key, g),
            )
        np.testing.assert_allclose(
            trace["rew_%d_data" % g], golden["rew_%d_data" % g],
            atol=1e-5, err_msg="rewards of group %d diverged" % g,
        )
        if "views_%d_data" % g in golden:
            np.testing.assert_allclose(
                trace["views_%d_data" % g], golden["views_%d_data" % g],
                atol=1e-5, err_msg="per-step views of group %d diverged" % g)
        if "view0_%d" % g in golden:
            np.testing.assert_allclose(
                trace["view0_%d" % g], golden["view0_%d" % g],
                atol=1e-5, err_msg="step-0 view of group %d diverged" % g,
            )
            np.testing.assert_allclose(
                trace["feat0_%d" % g], golden["feat0_%d" % g],
                atol=1e-5, err_msg="step-0 features of group %d diverged" % g,
            )


REFBUILD = "/tmp/refbuild"


@pytest.mark.skipif(
    not os.path.exists(os.path.join(REFBUILD, "build", "libmagent.so")),
    reason="reference C++ build missing (see CLAUDE.md: cp -r /root/reference"
           " /tmp/refbuild && cmake+ninja)")
@pytest.mark.slow
def test_randomized_differential_fuzz_sample():
    """A small sample of the randomized reference-vs-sequential fuzz
    (scripts/test/fuzz_reference.py) — random configs beyond the fixed
    golden scenarios.  Runs in a subprocess: the fuzzer loads the reference
    ctypes package alongside magent_tpu and pins OMP_NUM_THREADS=1."""
    import subprocess

    script = os.path.join(os.path.dirname(__file__), "..", "scripts", "test",
                          "fuzz_reference.py")
    env = dict(os.environ, OMP_NUM_THREADS="1", JAX_PLATFORMS="cpu")
    proc = subprocess.run(
        [sys.executable, script, "--seeds", "3", "--start", "49",
         "--steps", "8", "--views"],
        env=env, capture_output=True, text=True, timeout=600)
    assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-2000:]
