"""End-to-end engine semantics on tiny deterministic worlds."""

import numpy as np
import pytest

import magent_tpu as magent
from magent_tpu import gridworld as gw

_BATTLE_ENV = None


def battle_env():
    """Shared battle env (jit cache reused across tests; reset between)."""
    global _BATTLE_ENV
    if _BATTLE_ENV is None:
        _BATTLE_ENV = magent.GridWorld(make_tiny_battle(), caps=16)
    _BATTLE_ENV.reset()
    return _BATTLE_ENV


def make_tiny_battle(map_size=16):
    cfg = gw.Config()
    cfg.set({"map_width": map_size, "map_height": map_size})
    cfg.set({"minimap_mode": True, "embedding_size": 10})
    small = cfg.register_agent_type(
        "small",
        {'width': 1, 'length': 1, 'hp': 10, 'speed': 2,
         'view_range': gw.CircleRange(6), 'attack_range': gw.CircleRange(1.5),
         'damage': 2, 'step_recover': 0.1,
         'step_reward': -0.005, 'kill_reward': 5, 'dead_penalty': -0.1,
         'attack_penalty': -0.1})
    g0 = cfg.add_group(small)
    g1 = cfg.add_group(small)
    a = gw.AgentSymbol(g0, index='any')
    b = gw.AgentSymbol(g1, index='any')
    cfg.add_reward_rule(gw.Event(a, 'attack', b), receiver=a, value=0.2)
    cfg.add_reward_rule(gw.Event(b, 'attack', a), receiver=b, value=0.2)
    return cfg


def test_spaces():
    env = battle_env()
    h0, h1 = env.get_handles()
    assert env.get_view_space(h0) == (13, 13, 7)
    assert env.get_action_space(h0) == (21,)
    # feature = 10 emb + 21 act + 1 reward + 2 coords
    assert env.get_feature_space(h0) == (34,)


def test_add_and_observe():
    env = battle_env()
    h0, h1 = env.get_handles()
    env.add_agents(h0, method="custom", pos=[[3, 3], [5, 3]])
    env.add_agents(h1, method="custom", pos=[[3, 5]])
    assert env.get_num(h0) == 2
    assert env.get_num(h1) == 1
    ids0 = env.get_agent_id(h0)
    assert list(ids0) == [0, 1]
    assert list(env.get_agent_id(h1)) == [2]

    views, feats = env.get_observation(h0)
    assert views.shape == (2, 13, 13, 7)
    assert feats.shape == (2, 34)
    # agent 0 at (3,3): own channel (1) has itself at center
    assert views[0, 6, 6, 1] == 1.0
    assert views[0, 6, 6, 2] == 1.0  # full hp
    # friend at (5,3): two cells right -> view col 8
    assert views[0, 6, 8, 1] == 1.0
    # enemy at (3,5): two rows down -> channel 4 (opposite group)
    assert views[0, 8, 6, 4] == 1.0
    # walls at border: col 3 of map -> x=0..? wall at x=0 is view col 3
    assert views[0, 6, 3, 0] == 1.0

    # symmetric layout: for group 1, its own channel is 1
    views1, _ = env.get_observation(h1)
    assert views1[0, 6, 6, 1] == 1.0
    # and the enemies (group 0) appear on channel 4
    assert views1[0, 4, 6, 4] == 1.0


def test_move_and_collision():
    env = battle_env()
    h0, h1 = env.get_handles()
    env.add_agents(h0, method="custom", pos=[[3, 3], [4, 3]])
    env.add_agents(h1, method="custom", pos=[[10, 10]])

    # agent 0 moves right by 1: blocked by agent 1 -> collide, stays
    # agent 1 moves right by 1: free
    acts = np.zeros(2, dtype=np.int32)
    # action for (dx=1, dy=0) is index 7 in the 13-move diamond
    acts[0] = 7
    acts[1] = 7
    env.set_action(h0, acts)
    env.set_action(h1, np.array([6], dtype=np.int32))  # no-op
    env.step()
    pos = env.get_pos(h0)
    # fast-path semantics: no chain moves in one phase; agent 0 collides
    assert list(pos[1]) == [5, 3]
    assert list(pos[0]) == [3, 3]
    env.clear_dead()


def test_attack_and_kill():
    env = battle_env()
    h0, h1 = env.get_handles()
    env.add_agents(h0, method="custom", pos=[[3, 3]])
    env.add_agents(h1, method="custom", pos=[[4, 3]])

    v2a_base, v2a = env.get_view2attack(h0)
    # attack the cell one to the right: view cell (6, 7)
    a_right = v2a[6, 7]
    assert a_right >= 0

    hp_left = 10.0
    rounds = 0
    while True:
        env.set_action(h0, np.array([v2a_base + a_right], dtype=np.int32))
        env.set_action(h1, np.array([6], dtype=np.int32))  # stay
        done = env.step()
        r0 = env.get_reward(h0)
        r1 = env.get_reward(h1)
        alive1 = env.get_alive(h1)
        rounds += 1
        if not alive1[0]:
            # kill: step_reward + attack_penalty + kill_reward; the killing
            # blow sets last_op=KILL so the 'attack' shaping rule does NOT
            # fire (reference: RewardEngine.cc:230-237 checks last_op==op)
            assert r0[0] == pytest.approx(-0.005 - 0.1 + 5)
            assert r1[0] == pytest.approx(-0.1)  # dead_penalty replaces
            assert done  # group 1 extinct
            break
        # non-lethal hit: step_reward + attack_penalty + rule
        assert r0[0] == pytest.approx(-0.005 - 0.1 + 0.2)
        env.clear_dead()
        assert rounds < 50

    # damage 2, recover 0.1/step, hp 10 -> dies on the 6th hit
    assert rounds == 6


def test_starve_death():
    cfg = gw.Config()
    cfg.set({"map_width": 8, "map_height": 8})
    t = cfg.register_agent_type(
        "t", {'width': 1, 'length': 1, 'hp': 1, 'speed': 1,
              'view_range': gw.CircleRange(2), 'attack_range': gw.CircleRange(0),
              'step_recover': -0.4, 'dead_penalty': -2.0})
    cfg.add_group(t)
    env = magent.GridWorld(cfg, caps=4)
    (h0,) = env.get_handles()
    env.reset()
    env.add_agents(h0, method="custom", pos=[[3, 3]])

    stay = np.array([env.get_action_space(h0)[0] // 2], dtype=np.int32)
    alive_steps = 0
    for _ in range(10):
        env.set_action(h0, np.zeros(1, np.int32))
        done = env.step()
        if not env.get_alive(h0)[0]:
            assert env.get_reward(h0)[0] == pytest.approx(-2.0)
            assert done
            break
        alive_steps += 1
        env.clear_dead()
    # hp 1 - 0.4k < 0 at k=3
    assert alive_steps == 2


def test_clear_dead_compaction():
    env = battle_env()
    h0, h1 = env.get_handles()
    env.add_agents(h0, method="custom", pos=[[3, 3], [6, 6], [9, 9]])
    env.add_agents(h1, method="custom", pos=[[4, 3]])

    v2a_base, v2a = env.get_view2attack(h1)
    a_left = v2a[6, 5]
    # group1 agent kills group0 agent at (3,3) over repeated attacks
    for _ in range(10):
        env.set_action(h0, np.full(3, 6, dtype=np.int32))
        env.set_action(h1, np.array([v2a_base + a_left], dtype=np.int32))
        env.step()
        if not env.get_alive(h0)[0]:
            break
        env.clear_dead()
    assert not env.get_alive(h0)[0]
    ids_before = env.get_agent_id(h0)
    env.clear_dead()
    ids_after = env.get_agent_id(h0)
    assert env.get_num(h0) == 2
    assert list(ids_after) == list(ids_before[1:])  # stable order
    # grid no longer references the dead agent
    grid = np.asarray(env.state.cell_slot)
    assert grid[3, 3] == -1
