"""Capacity growth: adding agents beyond a group's capacity rebuilds the
spec with larger caps and migrates state (env.py:_grow)."""

import numpy as np

import magent_tpu as magent
from magent_tpu import gridworld as gw


def test_grow_preserves_state():
    env = magent.GridWorld("battle", map_size=48, caps=8)
    h0, h1 = env.get_handles()
    env.reset()
    env.add_agents(h0, method="custom", pos=[[4, 4], [6, 6], [8, 8]])
    env.add_agents(h1, method="custom", pos=[[20, 20], [22, 22]])
    pos0_before = env.get_pos(h0).copy()
    ids1_before = env.get_agent_id(h1).copy()

    # overflow group 1 far beyond its cap of 8
    new_pos = [[30 + 2 * i, 10 + 2 * j] for i in range(4) for j in range(4)]
    env.add_agents(h1, method="custom", pos=new_pos)

    assert env.get_num(h1) == 2 + len(new_pos)
    assert env.spec.groups[1].cap >= env.get_num(h1)
    # pre-existing agents and ids survived the migration
    np.testing.assert_array_equal(env.get_pos(h0), pos0_before)
    np.testing.assert_array_equal(env.get_agent_id(h1)[:2], ids1_before)

    # the env still steps and observes correctly after growth
    rng = np.random.RandomState(0)
    for _ in range(5):
        for h in (h0, h1):
            n = env.get_num(h)
            view, feat = env.get_observation(h)
            assert view.shape[0] == n
            env.set_action(h, rng.randint(
                0, env.get_action_space(h)[0], n).astype(np.int32))
        env.step()
        env.clear_dead()
    assert env.get_num(h0) + env.get_num(h1) > 0


def test_new_group_post_construction():
    """new_group adds an empty group of a registered type after construction
    (reference: gridworld.py:144-147): channel layout grows for every group,
    existing agents survive, and the env keeps stepping."""
    env = magent.GridWorld("battle", map_size=32, caps=8)
    h0, h1 = env.get_handles()
    env.reset()
    env.add_agents(h0, method="custom", pos=[[4, 4], [6, 6]])
    env.add_agents(h1, method="custom", pos=[[20, 20]])
    pos0 = env.get_pos(h0).copy()
    C_before = env.get_view_space(h0)[-1]

    h2 = env.new_group("small")
    assert env.get_num(h2) == 0
    # each group adds channel_scale channels to every view
    C_after = env.get_view_space(h0)[-1]
    assert C_after == C_before + env.spec.channel_scale
    np.testing.assert_array_equal(env.get_pos(h0), pos0)

    env.add_agents(h2, method="custom", pos=[[10, 24], [12, 24]])
    assert env.get_num(h2) == 2

    rng = np.random.RandomState(0)
    for _ in range(3):
        for h in (h0, h1, h2):
            n = env.get_num(h)
            view, feat = env.get_observation(h)
            assert view.shape[0] == n and view.shape[-1] == C_after
            env.set_action(h, rng.randint(
                0, env.get_action_space(h)[0], n).astype(np.int32))
        env.step()
        env.clear_dead()
    assert env.get_num(h0) + env.get_num(h1) + env.get_num(h2) > 0


def test_set_goal_goal_mode():
    """set_goal stores per-agent random goals and consumes two engine-RNG
    draws per agent in x,y order; goal_mode widens the feature space by two
    always-zero slots (reference: GridWorld.cc:667-679, :926-933)."""
    cfg = gw.Config()
    cfg.set({"map_width": 20, "map_height": 20, "embedding_size": 4,
             "goal_mode": True, "seed": 7})
    t = cfg.register_agent_type(
        "walker", {"width": 1, "length": 1, "speed": 1,
                   "view_range": gw.CircleRange(2)})
    cfg.add_group(t)
    env = magent.GridWorld(cfg, caps=8)
    h0 = env.get_handles()[0]
    env.reset()
    env.add_agents(h0, method="custom", pos=[[4, 4], [6, 6], [8, 8]])

    # feature space = embedding + n_action + 1 + 2 (goal)
    n_action = env.get_action_space(h0)[0]
    assert env.get_feature_space(h0) == (4 + n_action + 1 + 2,)
    _, feat = env.get_observation(h0)
    assert feat.shape[1] == 4 + n_action + 1 + 2
    np.testing.assert_array_equal(feat[:, -2:], 0.0)  # goal slots unwritten

    # the draws must match a fresh minstd_rand0 replica, two per agent
    from magent_tpu.core import lcg as lcg_mod
    ref = lcg_mod.HostLCG(7)
    expect = np.asarray(
        [[ref() % 20, ref() % 20] for _ in range(3)], np.int32)
    env.set_goal(h0, "random")
    np.testing.assert_array_equal(env._goals[0], expect)
    # engine RNG state advanced and synced into device state
    assert int(env.state.lcg) == int(ref.state)
