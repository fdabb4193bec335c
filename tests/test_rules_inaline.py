"""IN_A_LINE reward-rule coverage (the DSL op the reference defines at
grid_def.h:22, evaluated in RewardEngine.cc:262-296)."""

import numpy as np

import magent_tpu as magent


def _env(rule_builder):
    gw = magent.gridworld
    cfg = gw.Config()
    cfg.set({"map_width": 16, "map_height": 16})
    t = cfg.register_agent_type(
        "t", {'width': 1, 'length': 1, 'hp': 1, 'speed': 1,
              'view_range': gw.CircleRange(2), 'attack_range': gw.CircleRange(0)})
    g = cfg.add_group(t)
    rule_builder(cfg, gw, g)
    return magent.GridWorld(cfg)


def test_in_a_line_triggers_group_reward():
    def build(cfg, gw, g):
        sym = gw.AgentSymbol(g, index='all')
        cfg.add_reward_rule(gw.Event(sym, 'in_a_line'), receiver=sym, value=1)

    env = _env(build)
    h, = env.get_handles()
    t = env.spec.groups[0].type
    stay = next(i for i in range(t.move_range.count)
                if t.move_range.num2delta(i) == (0, 0))
    env.reset()
    env.add_agents(h, method="custom", pos=[[4, 4], [4, 5], [4, 6]])
    env.set_action(h, np.full(3, stay, np.int32))
    env.step()
    # contiguous column -> group reward paid to every member
    assert (env.get_reward(h) >= 1.0 - 1e-6).all()

    env.reset()
    env.add_agents(h, method="custom", pos=[[4, 4], [4, 6], [8, 8]])
    env.set_action(h, np.full(3, stay, np.int32))
    env.step()
    assert (env.get_reward(h) < 1.0).all()  # not a line -> no reward
