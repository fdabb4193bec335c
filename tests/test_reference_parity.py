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
