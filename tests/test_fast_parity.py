"""Fast-engine validation against the reference golden traces.

The fast engine resolves contention with deterministic batched arbitration
instead of the reference's sequential buffer order (see
magent_tpu/core/engine.py docstring), so on contended scenarios its
trajectories legitimately diverge.  This suite bounds that divergence:

- **bit-exact scenarios** (``fast_exact=True`` in tests/golden/scenarios.py)
  are constructed with no move contention, no chain moves, single-attacker
  targets and zero-damage victims — every divergence source removed — and
  must match the reference traces exactly;
- **contended scenarios** must still agree on the episode-level invariants:
  same episode length behavior, same (or no) extinct group, population
  curves within a bounded envelope, and per-group total reward in the same
  regime.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "golden"))

import magent_tpu  # noqa: E402
from scenarios import SCENARIOS, flatten_trace, run_scenario  # noqa: E402

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")

EXACT = sorted(n for n, s in SCENARIOS.items() if s.get("fast_exact"))
CONTENDED = sorted(n for n, s in SCENARIOS.items() if not s.get("fast_exact"))


def _load(name):
    path = os.path.join(GOLDEN_DIR, "golden_%s.npz" % name)
    if not os.path.exists(path):
        pytest.skip("golden trace missing: " + path)
    return dict(np.load(path))


@pytest.mark.parametrize("name", EXACT)
def test_fast_engine_bit_exact_when_contention_free(name):
    golden = _load(name)
    trace = flatten_trace(run_scenario(magent_tpu, name), 2)

    assert int(trace["steps"]) == int(golden["steps"])
    np.testing.assert_array_equal(trace["done"], golden["done"])
    for g in range(2):
        np.testing.assert_array_equal(
            trace["num_%d" % g], golden["num_%d" % g],
            err_msg="population of group %d diverged" % g)
        for key in ("ids", "pos", "alive"):
            np.testing.assert_array_equal(
                trace["%s_%d_data" % (key, g)],
                golden["%s_%d_data" % (key, g)],
                err_msg="%s of group %d diverged" % (key, g))
        np.testing.assert_allclose(
            trace["rew_%d_data" % g], golden["rew_%d_data" % g],
            atol=1e-5, err_msg="rewards of group %d diverged" % g)
        if "views_%d_data" % g in golden:
            np.testing.assert_allclose(
                trace["views_%d_data" % g], golden["views_%d_data" % g],
                atol=1e-5, err_msg="per-step views of group %d diverged" % g)
        if "view0_%d" % g in golden and not SCENARIOS[name].get("skip_views"):
            np.testing.assert_allclose(
                trace["view0_%d" % g], golden["view0_%d" % g], atol=1e-5,
                err_msg="step-0 views of group %d diverged" % g)


def _winner(num0, num1):
    """-1: both alive at end; g: group g extinct first."""
    for step in range(len(num0)):
        if num0[step] == 0:
            return 0
        if num1[step] == 0:
            return 1
    return -1


@pytest.mark.parametrize("name", CONTENDED)
def test_fast_engine_invariants_on_contended_scenarios(name):
    golden = _load(name)
    trace = flatten_trace(run_scenario(magent_tpu, name), 2)

    g_steps, f_steps = int(golden["steps"]), int(trace["steps"])
    budget = SCENARIOS[name]["steps"]

    # same extinction outcome (or neither extinct)
    g_win = _winner(golden["num_0"], golden["num_1"])
    f_win = _winner(trace["num_0"], trace["num_1"])
    assert f_win == g_win, (
        "extinct group differs: fast %s vs reference %s" % (f_win, g_win))

    # episode length: equal when neither trajectory ends early; otherwise
    # within a third of the budget of each other
    if g_steps == budget:
        assert f_steps >= int(0.6 * budget), (f_steps, budget)
    else:
        assert abs(f_steps - g_steps) <= max(5, budget // 3)

    # population envelope: compare over the common prefix
    common = min(g_steps, f_steps)
    for g in range(2):
        gn = np.asarray(golden["num_%d" % g][:common], np.float64)
        fn = np.asarray(trace["num_%d" % g][:common], np.float64)
        n0 = max(gn[0], 1.0)
        dev = np.max(np.abs(gn - fn)) / n0
        assert dev <= 0.35, (
            "population curve of group %d deviates %.0f%% (> 35%%)"
            % (g, 100 * dev))

    # per-step mean reward in the same regime (catches sign flips / runaway
    # reward bugs without demanding trajectory equality)
    for g in range(2):
        g_tot = sum(np.sum(r) for r in np.split(
            golden["rew_%d_data" % g], [0])) / max(g_steps, 1)
        f_tot = sum(np.sum(r) for r in np.split(
            trace["rew_%d_data" % g], [0])) / max(f_steps, 1)
        scale = max(abs(g_tot), abs(f_tot), 1.0)
        assert abs(g_tot - f_tot) / scale <= 0.6, (
            "per-step reward of group %d: fast %.3f vs reference %.3f"
            % (g, f_tot, g_tot))
