"""Determinism: the same seed reproduces the same trajectory exactly
(BASELINE.md correctness requirement)."""

import numpy as np

import magent_tpu as magent


def _run(seed, engine_mode):
    cfg_mod = __import__("magent_tpu.builtin.config.battle",
                         fromlist=["get_config"])
    cfg = cfg_mod.get_config(24)
    cfg.set({"seed": seed})
    env = magent.GridWorld(cfg, engine_mode=engine_mode)
    h0, h1 = env.get_handles()
    env.reset()
    env.add_agents(h0, method="random", n=12)
    env.add_agents(h1, method="random", n=12)
    rng = np.random.RandomState(99)
    trace = []
    for _ in range(15):
        for h in (h0, h1):
            env.set_action(h, rng.randint(
                0, env.get_action_space(h)[0], env.get_num(h)).astype(np.int32))
        env.step()
        trace.append((env.get_pos(h0).copy(), env.get_reward(h0).copy(),
                      env.get_pos(h1).copy(), env.get_alive(h1).copy()))
        env.clear_dead()
    return trace


def _assert_equal(t1, t2):
    for a, b in zip(t1, t2):
        for x, y in zip(a, b):
            np.testing.assert_array_equal(x, y)


def test_fast_engine_deterministic():
    _assert_equal(_run(7, "fast"), _run(7, "fast"))


def test_sequential_engine_deterministic():
    _assert_equal(_run(7, "sequential"), _run(7, "sequential"))


def test_seed_changes_layout():
    t1 = _run(7, "fast")
    t2 = _run(8, "fast")
    same = all(
        np.array_equal(a[0], b[0]) for a, b in zip(t1, t2)
    )
    assert not same
