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


def test_fast_matches_sequential_on_sparse_random_worlds():
    """Randomized extension of the contention-free golden scenarios: agents
    spaced too far apart to interact must make the fast engine bit-exact
    with the sequential reference-order engine under random actions."""
    import random

    import magent_tpu as magent

    gw = magent_tpu.gridworld

    def build(mode, seed):
        rng = random.Random(seed)
        cfg = gw.Config()
        cfg.set({"map_width": 64, "map_height": 64, "embedding_size": 4})
        t = cfg.register_agent_type(
            "t", {'width': 1, 'length': 1, 'hp': 8, 'speed': 1,
                  'view_range': gw.CircleRange(3),
                  'attack_range': gw.CircleRange(1), 'damage': 1,
                  'step_recover': -0.1, 'step_reward': -0.01,
                  'attack_penalty': -0.05})
        g0 = cfg.add_group(t)
        g1 = cfg.add_group(t)
        a, b = gw.AgentSymbol(g0, 'any'), gw.AgentSymbol(g1, 'any')
        cfg.add_reward_rule(gw.Event(a, 'attack', b), receiver=a, value=0.2)
        env = magent.GridWorld(cfg, engine_mode=mode)
        h0, h1 = env.get_handles()
        env.reset()
        # coarse lattice, spacing 10 >> 2 * speed * steps + attack radius
        spots = [(4 + 10 * i, 4 + 10 * j) for i in range(6) for j in range(6)]
        rng.shuffle(spots)
        env.add_agents(h0, method="custom", pos=spots[:6])
        env.add_agents(h1, method="custom", pos=spots[6:12])
        return env, (h0, h1)

    for seed in range(5):
        envs = {m: build(m, seed) for m in ("fast", "sequential")}
        arng = np.random.RandomState(100 + seed)
        for step in range(4):
            n_act = None
            states = {}
            for mode, (env, handles) in envs.items():
                if n_act is None:
                    n_act = env.get_action_space(handles[0])[0]
                    acts = [arng.randint(0, n_act, 6).astype(np.int32)
                            for _ in handles]
                for h, a_ in zip(handles, acts):
                    env.set_action(h, a_)
                env.step()
                st = env.state
                states[mode] = {
                    f: np.asarray(getattr(st, f))
                    for f in ("x", "y", "hp", "dead", "last_op", "op_obj",
                              "next_reward")
                }
                env.clear_dead()
            for f, va in states["fast"].items():
                if f == "hp" or f == "next_reward":
                    np.testing.assert_allclose(
                        va, states["sequential"][f], atol=1e-5,
                        err_msg="seed %d step %d field %s" % (seed, step, f))
                else:
                    np.testing.assert_array_equal(
                        va, states["sequential"][f],
                        err_msg="seed %d step %d field %s" % (seed, step, f))


def test_fast_engine_invariants_dense_fuzz():
    """Dense contended worlds have no exact oracle, but hard invariants must
    hold every step: coordinates in bounds, finite hp/rewards, monotone
    deaths, and (grid path) occupancy consistent with positions."""
    import magent_tpu as magent

    for seed in range(3):
        env = magent.GridWorld("battle", map_size=24)
        h0, h1 = env.get_handles()
        env.set_seed(seed)
        env.reset()
        env.add_agents(h0, method="random", n=60)
        env.add_agents(h1, method="random", n=60)
        arng = np.random.RandomState(seed)
        prev_dead = np.zeros(env.spec.n_agents_cap, bool)
        H, W = env.spec.height, env.spec.width
        for step in range(15):
            for h in (h0, h1):
                n = env.get_num(h)
                env.set_action(h, arng.randint(
                    0, env.get_action_space(h)[0], n).astype(np.int32))
            env.step()
            st = env.state
            x, y = np.asarray(st.x), np.asarray(st.y)
            active = np.asarray(st.active)
            dead = np.asarray(st.dead)
            hp = np.asarray(st.hp)
            assert np.isfinite(hp).all()
            assert np.isfinite(np.asarray(st.next_reward)).all()
            live = active & ~dead
            assert (x[live] >= 1).all() and (x[live] < W - 1).all()
            assert (y[live] >= 1).all() and (y[live] < H - 1).all()
            # no two live agents share a cell (1x1 bodies)
            cells = y[live] * W + x[live]
            assert len(np.unique(cells)) == len(cells), f"overlap step {step}"
            # deaths are monotone within an episode
            assert (dead | ~prev_dead).all(), f"resurrection at step {step}"
            # grid path: cell_slot agrees with positions
            grid = np.asarray(st.cell_slot)
            slots = np.nonzero(live)[0]
            assert (grid[y[slots], x[slots]] == slots).all()
            prev_dead = dead.copy()
            env.clear_dead()
            # clear_dead compacts: rebuild the dead baseline
            prev_dead = np.asarray(env.state.dead).copy()
