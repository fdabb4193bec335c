"""DiscreteSnake golden parity: the sequential snake engine
(core/seq_snake.py, driven by the glibc random() replica) must reproduce the
reference C++ engine's trajectories bit-exactly.

Golden traces come from tests/golden/generate_golden.py run against the
reference build — in a FRESH process with ONLY snake scenarios, because the
reference snake draws from the per-process glibc random() stream from its
startup state (its Python wrapper cannot seed it; see scenarios.py).
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "golden"))

import magent_tpu  # noqa: E402
from scenarios import (SNAKE_SCENARIOS, flatten_snake_trace,  # noqa: E402
                       run_snake_scenario)

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")


@pytest.mark.parametrize("name", sorted(SNAKE_SCENARIOS))
def test_sequential_snake_matches_reference(name):
    path = os.path.join(GOLDEN_DIR, "golden_%s.npz" % name)
    if not os.path.exists(path):
        pytest.skip("golden trace missing: " + path)
    golden = dict(np.load(path))
    trace = flatten_snake_trace(
        run_snake_scenario(magent_tpu, name, engine_mode="sequential"))

    assert int(trace["steps"]) == int(golden["steps"])
    np.testing.assert_array_equal(trace["num"], golden["num"])
    np.testing.assert_array_equal(trace["food_num"], golden["food_num"])
    for key in ("ids_data", "head_data", "length_data", "alive_data"):
        np.testing.assert_array_equal(
            np.asarray(trace[key], np.int64), np.asarray(golden[key], np.int64),
            err_msg=key)
    np.testing.assert_allclose(trace["rew_data"], golden["rew_data"],
                               atol=1e-5)
    np.testing.assert_allclose(trace["view0"], golden["view0"], atol=1e-5)
    np.testing.assert_allclose(trace["feat0"], golden["feat0"], atol=1e-5)


@pytest.mark.slow
def test_randomized_snake_fuzz_sample():
    """Two seeds of the randomized snake differential fuzz
    (scripts/test/fuzz_snake.py) — fresh subprocesses per engine pin the
    per-process glibc random() stream."""
    import subprocess

    refbuild = "/tmp/refbuild"
    if not os.path.exists(os.path.join(refbuild, "build", "libmagent.so")):
        pytest.skip("reference C++ build missing (see CLAUDE.md)")
    script = os.path.join(os.path.dirname(__file__), "..", "scripts", "test",
                          "fuzz_snake.py")
    proc = subprocess.run(
        [sys.executable, script, "--seeds", "2"],
        capture_output=True, text=True, timeout=600,
        env=dict(os.environ, OMP_NUM_THREADS="1", JAX_PLATFORMS="cpu"))
    assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-2000:]
