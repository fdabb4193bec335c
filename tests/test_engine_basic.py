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


def test_food_crumb_clamp_matches_sequential():
    """Map.cc:299-303 destroys food the moment an eat leaves it below 0.1;
    a later same-step eater must get nothing.  8 - 3.97 - 3.97 = 0.06 is a
    destroyed crumb: the third eater's hp must not gain it (engine.py food
    phase), bit-matching the sequential reference-order engine."""
    gw = magent.gridworld

    def make_env(mode):
        cfg = gw.Config()
        cfg.set({"map_width": 16, "map_height": 16, "food_mode": True,
                 "embedding_size": 4})
        hunter = cfg.register_agent_type(
            "hunter",
            {'width': 1, 'length': 1, 'hp': 40, 'speed': 1,
             'view_range': gw.CircleRange(4), 'attack_range': gw.CircleRange(1),
             'damage': 5, 'step_recover': -0.5, 'eat_ability': 3.97,
             'food_supply': 0, 'kill_supply': 0, 'attack_in_group': True})
        prey = cfg.register_agent_type(
            "prey",
            {'width': 1, 'length': 1, 'hp': 4, 'speed': 1,
             'view_range': gw.CircleRange(2), 'attack_range': gw.CircleRange(0),
             'food_supply': 8, 'step_recover': 0})
        g0 = cfg.add_group(hunter)
        g1 = cfg.add_group(prey)
        env = magent.GridWorld(cfg, engine_mode=mode)
        h0, h1 = env.get_handles()
        env.add_agents(h0, method="custom", pos=[[4, 5], [5, 4], [6, 5]])
        env.add_agents(h1, method="custom", pos=[[5, 5]])
        return env, h0, h1

    results = {}
    for mode in ("fast", "sequential"):
        env, h0, h1 = make_env(mode)
        v2a_base, v2a = env.get_view2attack(h0)
        cy = cx = v2a.shape[0] // 2
        at = {d: v2a_base + v2a[cy + d[1], cx + d[0]]
              for d in [(1, 0), (0, 1), (-1, 0)]}
        assert all(a >= v2a_base for a in at.values())
        sdx = np.asarray(env.spec.s_move_dx)
        sdy = np.asarray(env.spec.s_move_dy)
        stay_h = int(np.flatnonzero((sdx[0] == 0) & (sdy[0] == 0))[0])
        p_off = env.spec.groups[1].offset
        stay_prey = int(np.flatnonzero(
            (sdx[p_off] == 0) & (sdy[p_off] == 0))[0])

        # step 1: hunter 0 kills the prey (damage 5 > hp 4) -> corpse food 8
        env.set_action(h0, np.array([at[(1, 0)], stay_h, stay_h], np.int32))
        env.set_action(h1, np.array([stay_prey], np.int32))
        env.step()
        env.clear_dead()
        # step 2: all three hunters attack the food cell in slot order
        env.set_action(h0, np.array(
            [at[(1, 0)], at[(0, 1)], at[(-1, 0)]], np.int32))
        env.step()
        results[mode] = (np.asarray(env.state.hp[:3], np.float32).copy(),
                         int((np.asarray(env.state.cell_food) >= 0).sum()))

    hp_fast, food_fast = results["fast"]
    hp_seq, food_seq = results["sequential"]
    # the engines process same-cell eaters in different (randomized) orders,
    # so compare order-invariant outcomes: two eaters clamp at hp_max, the
    # third gets a destroyed crumb (0, NOT 0.06) in both engines
    np.testing.assert_allclose(np.sort(hp_fast), np.sort(hp_seq), atol=1e-5)
    assert food_fast == food_seq == 0  # the 0.06 crumb cell is destroyed


def test_negative_kill_supply_matches_sequential():
    """add_hp clamps unconditionally (GridWorld.h:185): a negative
    kill_supply must REDUCE the killer's hp in the fast engine too."""
    gw = magent.gridworld

    def make_env(mode):
        cfg = gw.Config()
        cfg.set({"map_width": 12, "map_height": 12, "embedding_size": 4})
        hunter = cfg.register_agent_type(
            "hunter",
            {'width': 1, 'length': 1, 'hp': 40, 'speed': 1,
             'view_range': gw.CircleRange(3), 'attack_range': gw.CircleRange(1),
             'damage': 5, 'step_recover': 0})
        prey = cfg.register_agent_type(
            "prey",
            {'width': 1, 'length': 1, 'hp': 4, 'speed': 1,
             'view_range': gw.CircleRange(2), 'attack_range': gw.CircleRange(0),
             'kill_supply': -3})  # kill_supply is the VICTIM's attribute
        g0 = cfg.add_group(hunter)
        g1 = cfg.add_group(prey)
        env = magent.GridWorld(cfg, engine_mode=mode)
        h0, h1 = env.get_handles()
        env.add_agents(h0, method="custom", pos=[[4, 5]])
        env.add_agents(h1, method="custom", pos=[[5, 5]])
        return env, h0, h1

    hps = {}
    for mode in ("fast", "sequential"):
        env, h0, h1 = make_env(mode)
        v2a_base, v2a = env.get_view2attack(h0)
        c = v2a.shape[0] // 2
        env.set_action(h0, np.array([v2a_base + v2a[c, c + 1]], np.int32))
        sdx = np.asarray(env.spec.s_move_dx)
        sdy = np.asarray(env.spec.s_move_dy)
        p_off = env.spec.groups[1].offset
        env.set_action(h1, np.array([int(np.flatnonzero(
            (sdx[p_off] == 0) & (sdy[p_off] == 0))[0])], np.int32))
        env.step()
        assert not env.get_alive(h1)[0]
        hps[mode] = float(env.state.hp[0])

    assert hps["fast"] == pytest.approx(hps["sequential"])
    assert hps["fast"] == pytest.approx(37.0)  # 40 - 3


def test_both_attack_counts_only_found_objects():
    """both_attack counts targets attacked by >1 agent; attacks on EMPTY
    cells never count (the reference increments attack_obj_counter only
    after the blank-cell check, GridWorld.cc:487-495)."""
    env = battle_env()
    h0, h1 = env.get_handles()
    env.add_agents(h0, method="custom", pos=[[3, 3], [5, 3]])
    env.add_agents(h1, method="custom", pos=[[4, 3]])

    v2a_base, v2a = env.get_view2attack(h0)
    a_right = v2a[6, 7]
    a_left = v2a[6, 5]
    assert a_right >= 0 and a_left >= 0

    # both group-0 agents attack the (4,3) victim from either side
    env.set_action(h0, np.array([v2a_base + a_right, v2a_base + a_left],
                                np.int32))
    env.set_action(h1, np.array([6], np.int32))  # stay
    env.step()
    assert env.get_both_attack() == 1
    env.clear_dead()

    # now both attack AWAY from the victim (blank cells): no object found
    env.set_action(h0, np.array([v2a_base + a_left, v2a_base + a_right],
                                np.int32))
    env.set_action(h1, np.array([6], np.int32))
    env.step()
    assert env.get_both_attack() == 0
    env.clear_dead()


def test_mean_info_drops_fresh_sentinel():
    """Never-acted agents carry last_action == n_action (GridWorld.h:140);
    the histogram must not misattribute them to a real action bucket (the
    reference's counter write is out-of-bounds UB for them)."""
    env = battle_env()
    h0, _h1 = env.get_handles()
    env.add_agents(h0, method="custom", pos=[[3, 3], [5, 5]])
    info = env.get_mean_info(h0)
    n_action = env.get_action_space(h0)[0]
    assert info.shape == (2 + n_action,)
    np.testing.assert_array_equal(info[2:], 0.0)  # no action taken yet
    assert info[0] == pytest.approx(4.0) and info[1] == pytest.approx(4.0)


def test_custom_placement_invalid_dir_raises():
    """The reference LOG(FATAL)s on pos_dir >= DIR_NUM even with turn_mode
    off (GridWorld.cc:249-251)."""
    env = battle_env()
    h0, _h1 = env.get_handles()
    with pytest.raises(ValueError):
        env.add_agents(h0, method="custom", pos=[[3, 3, 7]])


def test_zero_value_corpse_blocks_and_is_attackable():
    """In food_mode a kill turns the victim's cell into a Food occupier EVEN
    when food_supply is 0 (Map.cc:277-284 allocates the Food object
    unconditionally): the cell blocks movement and shows on the food
    channel until an attack 'eats' it (min(eat,0)=0 leaves it <0.1 and
    deletes it, Map.cc:292-303).  Both engines must agree."""
    gw = magent.gridworld

    def make_env(mode):
        cfg = gw.Config()
        cfg.set({"map_width": 16, "map_height": 16, "food_mode": True,
                 "embedding_size": 4})
        hunter = cfg.register_agent_type(
            "hunter",
            {'width': 1, 'length': 1, 'hp': 40, 'speed': 1,
             'view_range': gw.CircleRange(4), 'attack_range': gw.CircleRange(1),
             'damage': 5, 'step_recover': 0, 'eat_ability': 4,
             'food_supply': 0, 'kill_supply': 0, 'attack_in_group': True})
        prey = cfg.register_agent_type(
            "prey",
            {'width': 1, 'length': 1, 'hp': 4, 'speed': 1,
             'view_range': gw.CircleRange(2), 'attack_range': gw.CircleRange(0),
             'food_supply': 0, 'step_recover': 0})
        g0 = cfg.add_group(hunter)
        g1 = cfg.add_group(prey)
        env = magent.GridWorld(cfg, engine_mode=mode)
        h0, h1 = env.get_handles()
        env.add_agents(h0, method="custom", pos=[[4, 5]])
        env.add_agents(h1, method="custom", pos=[[5, 5]])
        return env, h0, h1

    for mode in ("fast", "sequential"):
        env, h0, h1 = make_env(mode)
        v2a_base, v2a = env.get_view2attack(h0)
        cy = cx = v2a.shape[0] // 2
        att_e = v2a_base + v2a[cy, cx + 1]  # attack (dx=+1)
        sdx = np.asarray(env.spec.s_move_dx)
        sdy = np.asarray(env.spec.s_move_dy)
        move_e = int(np.flatnonzero((sdx[0] == 1) & (sdy[0] == 0))[0])
        stay = int(np.flatnonzero((sdx[0] == 0) & (sdy[0] == 0))[0])
        p_off = env.spec.groups[1].offset
        stay_p = int(np.flatnonzero(
            (sdx[p_off] == 0) & (sdy[p_off] == 0))[0])

        # kill the prey -> zero-value corpse food at (5,5)
        env.set_action(h0, np.array([att_e], np.int32))
        env.set_action(h1, np.array([stay_p], np.int32))
        env.step()
        env.clear_dead()
        food = np.asarray(env.state.cell_food)
        assert food[5, 5] == 0.0, (mode, food[5, 5])  # present, value 0

        # the corpse blocks the move onto (5,5)
        env.set_action(h0, np.array([move_e], np.int32))
        env.step()
        assert np.asarray(env.state.x)[0] == 4, mode

        # the corpse shows on the food channel of observations
        view, _ = env.get_observation(h0)
        assert view[0].max() > 0  # some food visible (channel 1 = food)
        assert view[0, :, :, 1].sum() > 0, mode

        # attacking the corpse eats/destroys it (min(eat, 0) = 0 -> <0.1)
        env.set_action(h0, np.array([att_e], np.int32))
        env.step()
        food = np.asarray(env.state.cell_food)
        assert food[5, 5] == -1.0, (mode, food[5, 5])

        # now the move succeeds
        env.set_action(h0, np.array([move_e], np.int32))
        env.step()
        assert np.asarray(env.state.x)[0] == 5, mode
