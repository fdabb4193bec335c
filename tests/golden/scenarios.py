"""Scenario definitions shared by the golden-trajectory generator (which
drives the reference C++ engine) and the parity tests (which drive
magent_tpu).  Config builders take the ``gw`` config-DSL module so the same
code builds either package's config (the DSL surface is identical).

Each scenario fixes: the config, deterministic custom placements, a seeded
action stream, and the step budget.  The engine seed is 0 (both engines
reseed identically) and all randomness inside the engine flows from the
shared minstd LCG.
"""

import numpy as np


def battle_cfg(gw, map_size):
    cfg = gw.Config()
    cfg.set({"map_width": map_size, "map_height": map_size})
    cfg.set({"minimap_mode": True})
    cfg.set({"embedding_size": 10})
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


def forest_cfg(gw, map_size):
    cfg = gw.Config()
    cfg.set({"map_width": map_size, "map_height": map_size})
    cfg.set({"embedding_size": 10})
    deer = cfg.register_agent_type(
        "deer",
        {'width': 1, 'length': 1, 'hp': 5, 'speed': 1,
         'view_range': gw.CircleRange(1), 'attack_range': gw.CircleRange(0),
         'damage': 0, 'step_recover': 0.2, 'kill_supply': 8})
    tiger = cfg.register_agent_type(
        "tiger",
        {'width': 1, 'length': 1, 'hp': 10, 'speed': 1,
         'view_range': gw.CircleRange(4), 'attack_range': gw.CircleRange(1),
         'damage': 3, 'step_recover': -0.5,
         'step_reward': 1, 'attack_penalty': -0.1})
    cfg.add_group(deer)
    cfg.add_group(tiger)
    return cfg


def double_attack_cfg(gw, map_size):
    cfg = gw.Config()
    cfg.set({"map_width": map_size, "map_height": map_size})
    cfg.set({"embedding_size": 10})
    deer = cfg.register_agent_type(
        "deer",
        {'width': 1, 'length': 1, 'hp': 5, 'speed': 1,
         'view_range': gw.CircleRange(1), 'attack_range': gw.CircleRange(0),
         'step_recover': 0.2})
    tiger = cfg.register_agent_type(
        "tiger",
        {'width': 1, 'length': 1, 'hp': 10, 'speed': 1,
         'view_range': gw.CircleRange(4), 'attack_range': gw.CircleRange(1),
         'damage': 1, 'step_recover': -0.2, 'attack_in_group': True,
         'step_reward': -0.01, 'attack_penalty': -0.1})
    g_deer = cfg.add_group(deer)
    g_tiger = cfg.add_group(tiger)
    a = gw.AgentSymbol(g_tiger, index='any')
    b = gw.AgentSymbol(g_tiger, index='any')
    c = gw.AgentSymbol(g_deer, index='any')
    e1 = gw.Event(a, 'attack', c)
    e2 = gw.Event(b, 'attack', c)
    cfg.add_reward_rule(e1 & e2, receiver=[a, b], value=[1, 1])
    return cfg


def gather_cfg(gw, map_size):
    cfg = gw.Config()
    cfg.set({"map_width": map_size, "map_height": map_size})
    cfg.set({"minimap_mode": True})
    agent = cfg.register_agent_type(
        "agent",
        {'width': 1, 'length': 1, 'hp': 3, 'speed': 3,
         'view_range': gw.CircleRange(7), 'attack_range': gw.CircleRange(1),
         'damage': 6, 'step_recover': 0,
         'step_reward': -0.01, 'dead_penalty': -1, 'attack_penalty': -0.1,
         'attack_in_group': 1})
    food = cfg.register_agent_type(
        "food",
        {'width': 1, 'length': 1, 'hp': 25, 'speed': 0,
         'view_range': gw.CircleRange(1), 'attack_range': gw.CircleRange(0),
         'kill_reward': 5})
    g_f = cfg.add_group(food)
    g_s = cfg.add_group(agent)
    a = gw.AgentSymbol(g_s, index='any')
    b = gw.AgentSymbol(g_f, index='any')
    cfg.add_reward_rule(gw.Event(a, 'attack', b), receiver=a, value=0.5)
    return cfg


def turn_cfg(gw, map_size):
    """turn_mode with 1x2 bodies: exercises rotation, direction-dependent
    footprints and the rotated observation path"""
    cfg = gw.Config()
    cfg.set({"map_width": map_size, "map_height": map_size})
    cfg.set({"turn_mode": True})
    cfg.set({"embedding_size": 8})
    longa = cfg.register_agent_type(
        "longa",
        {'width': 1, 'length': 2, 'hp': 10, 'speed': 1,
         'view_range': gw.CircleRange(4), 'attack_range': gw.CircleRange(1),
         'damage': 2, 'step_recover': 0.1,
         'step_reward': -0.01, 'attack_penalty': -0.1})
    g0 = cfg.add_group(longa)
    g1 = cfg.add_group(longa)
    a = gw.AgentSymbol(g0, index='any')
    b = gw.AgentSymbol(g1, index='any')
    cfg.add_reward_rule(gw.Event(a, 'attack', b), receiver=a, value=0.3)
    return cfg


def food_cfg(gw, map_size):
    """food_mode: kills leave corpse food, attacks on food eat it"""
    cfg = gw.Config()
    cfg.set({"map_width": map_size, "map_height": map_size})
    cfg.set({"food_mode": True})
    cfg.set({"embedding_size": 8})
    hunter = cfg.register_agent_type(
        "hunter",
        {'width': 1, 'length': 1, 'hp': 10, 'speed': 1,
         'view_range': gw.CircleRange(4), 'attack_range': gw.CircleRange(1),
         'damage': 4, 'step_recover': -0.3, 'eat_ability': 3,
         'food_supply': 6, 'kill_supply': 2,
         'step_reward': -0.01, 'kill_reward': 2, 'attack_penalty': -0.1,
         'attack_in_group': True})
    prey = cfg.register_agent_type(
        "prey",
        {'width': 1, 'length': 1, 'hp': 4, 'speed': 1,
         'view_range': gw.CircleRange(2), 'attack_range': gw.CircleRange(0),
         'food_supply': 8, 'step_recover': 0.1})
    g0 = cfg.add_group(hunter)
    g1 = cfg.add_group(prey)
    a = gw.AgentSymbol(g0, index='any')
    b = gw.AgentSymbol(g1, index='any')
    cfg.add_reward_rule(gw.Event(a, 'kill', b), receiver=a, value=1)
    return cfg


def food_crumb_cfg(gw, map_size):
    """food_mode with crumb-prone fractional eats (8 - 3.97 - 3.97 = 0.06
    exercises the destroy-below-0.1 rule, Map.cc:299-303) and a NEGATIVE
    kill_supply (add_hp clamps unconditionally, GridWorld.h:185)."""
    cfg = gw.Config()
    cfg.set({"map_width": map_size, "map_height": map_size})
    cfg.set({"food_mode": True})
    cfg.set({"embedding_size": 8})
    hunter = cfg.register_agent_type(
        "hunter",
        {'width': 1, 'length': 1, 'hp': 40, 'speed': 1,
         'view_range': gw.CircleRange(4), 'attack_range': gw.CircleRange(1),
         'damage': 5, 'step_recover': -0.4, 'eat_ability': 3.97,
         'food_supply': 7.9, 'kill_supply': 1.5,
         'step_reward': -0.01, 'kill_reward': 2, 'attack_penalty': -0.1,
         'attack_in_group': True})
    prey = cfg.register_agent_type(
        "prey",
        {'width': 1, 'length': 1, 'hp': 4, 'speed': 1,
         'view_range': gw.CircleRange(2), 'attack_range': gw.CircleRange(0),
         'food_supply': 8, 'kill_supply': -3, 'step_recover': 0.1})
    g0 = cfg.add_group(hunter)
    g1 = cfg.add_group(prey)
    a = gw.AgentSymbol(g0, index='any')
    b = gw.AgentSymbol(g1, index='any')
    cfg.add_reward_rule(gw.Event(a, 'kill', b), receiver=a, value=1)
    return cfg


def absorb_cfg(gw, map_size):
    """can_absorb goal markers + colliding agents (the arrange demo flow)"""
    cfg = gw.Config()
    cfg.set({"map_width": map_size, "map_height": map_size})
    cfg.set({"minimap_mode": True})
    cfg.set({"embedding_size": 8})
    goal = cfg.register_agent_type(
        "goal", {'width': 1, 'length': 1, 'can_absorb': True})
    agent = cfg.register_agent_type(
        "agent",
        {'width': 1, 'length': 1, 'hp': 10, 'speed': 2,
         'view_range': gw.CircleRange(6), 'attack_range': gw.CircleRange(0),
         'damage': 2, 'step_recover': -10.0 / 400, 'step_reward': 0})
    g_goal = cfg.add_group(goal)
    g_agent = cfg.add_group(agent)
    g = gw.AgentSymbol(g_goal, 'any')
    a = gw.AgentSymbol(g_agent, 'any')
    cfg.add_reward_rule(gw.Event(a, 'collide', g), receiver=a, value=10)
    return cfg


def pursuit_cfg(gw, map_size):
    cfg = gw.Config()
    cfg.set({"map_width": map_size, "map_height": map_size})
    cfg.set({"embedding_size": 10})
    predator = cfg.register_agent_type(
        "predator",
        {'width': 2, 'length': 2, 'hp': 1, 'speed': 1,
         'view_range': gw.CircleRange(5), 'attack_range': gw.CircleRange(2),
         'attack_penalty': -0.2})
    prey = cfg.register_agent_type(
        "prey",
        {'width': 1, 'length': 1, 'hp': 1, 'speed': 1.5,
         'view_range': gw.CircleRange(4), 'attack_range': gw.CircleRange(0)})
    g0 = cfg.add_group(predator)
    g1 = cfg.add_group(prey)
    a = gw.AgentSymbol(g0, index='any')
    b = gw.AgentSymbol(g1, index='any')
    cfg.add_reward_rule(gw.Event(a, 'attack', b), receiver=[a, b], value=[1, -1])
    return cfg


def _two_squares(map_size, gap=3, frac=0.01, stride=2):
    """two facing squares of 1x1 agents (the battle formation)"""
    import math

    init_num = map_size * map_size * frac
    side = int(math.sqrt(init_num)) * 2
    left, right = [], []
    for x in range(map_size // 2 - gap - side, map_size // 2 - gap - side + side, stride):
        for y in range((map_size - side) // 2, (map_size - side) // 2 + side, stride):
            left.append([x, y, 0])
    for x in range(map_size // 2 + gap, map_size // 2 + gap + side, stride):
        for y in range((map_size - side) // 2, (map_size - side) // 2 + side, stride):
            right.append([x, y, 0])
    return left, right


def _grid(x0, y0, nx, ny, stride=2):
    return [[x0 + i * stride, y0 + j * stride, 0]
            for i in range(nx) for j in range(ny)]


def duel_cfg(gw, map_size):
    """Static duel pairs: hunters one-shot nothing, marks deal zero damage.

    Designed so the FAST engine must be bit-exact with the reference:
    speed 0 removes all move contention and chain moves; one hunter per
    mark means single-attacker targets (no order-dependent kill credit);
    marks deal 0 damage with 0 attack penalty, so the reference's
    dead-attacker skip (GridWorld.cc:479-480) has no observable effect.
    """
    cfg = gw.Config()
    cfg.set({"map_width": map_size, "map_height": map_size})
    cfg.set({"embedding_size": 4})
    hunter = cfg.register_agent_type(
        "hunter",
        {'width': 1, 'length': 1, 'hp': 10, 'speed': 0,
         'view_range': gw.CircleRange(3), 'attack_range': gw.CircleRange(2),
         'damage': 2, 'step_recover': 0,
         'step_reward': -0.01, 'kill_reward': 4, 'attack_penalty': -0.1})
    mark = cfg.register_agent_type(
        "mark",
        {'width': 1, 'length': 1, 'hp': 6, 'speed': 0,
         'view_range': gw.CircleRange(3), 'attack_range': gw.CircleRange(2),
         'damage': 0, 'step_recover': 0, 'dead_penalty': -0.5})
    g0 = cfg.add_group(hunter)
    g1 = cfg.add_group(mark)
    a = gw.AgentSymbol(g0, index='any')
    b = gw.AgentSymbol(g1, index='any')
    cfg.add_reward_rule(gw.Event(a, 'attack', b), receiver=a, value=0.3)
    cfg.add_reward_rule(gw.Event(a, 'kill', b), receiver=b, value=-1)
    return cfg


SCENARIOS = {
    # LCG-driven random placement + random walls (Map::get_random_blank
    # stream replication) on the battle config with a non-zero seed
    "battle_random": dict(
        cfg=battle_cfg, map_size=32, steps=30, action_seed=23,
        random_placements=[("walls", 20), (0, 30), (1, 30)],
    ),
    # close-quarters battle: attacks land from step one
    "battle_melee": dict(
        cfg=battle_cfg, map_size=24, steps=40, action_seed=7,
        placements=[_grid(6, 6, 4, 4, 2), _grid(7, 7, 4, 4, 2)],
    ),
    # the headline battle-64x64 config under fixed seed
    "battle64": dict(
        cfg=battle_cfg, map_size=64, steps=30, action_seed=11,
        placements=list(_two_squares(64, frac=0.04)),
        skip_views=True,
    ),
    # hp recovery, negative step_recover starvation, kill_supply
    "forest": dict(
        cfg=forest_cfg, map_size=24, steps=50, action_seed=3,
        placements=[_grid(4, 4, 5, 5, 3), _grid(5, 5, 3, 3, 4)],
    ),
    # conjunctive two-subject reward rule (double_attack)
    "double_attack": dict(
        cfg=double_attack_cfg, map_size=20, steps=50, action_seed=5,
        placements=[_grid(6, 6, 3, 3, 3), _grid(5, 5, 4, 4, 2)],
    ),
    # static high-hp food, eat-by-attack
    "gather": dict(
        cfg=gather_cfg, map_size=24, steps=40, action_seed=9,
        placements=[_grid(10, 10, 3, 3, 2), _grid(5, 5, 5, 5, 3)],
    ),
    # turn_mode rotation with 1x2 bodies (dirs given in placements)
    "turn_bodies": dict(
        cfg=turn_cfg, map_size=24, steps=40, action_seed=17,
        placements=[
            [[4 + 4 * i, 5 + 4 * j, (i + j) % 4] for i in range(3) for j in range(3)],
            [[6 + 4 * i, 7 + 4 * j, (i + 2 * j) % 4] for i in range(3) for j in range(3)],
        ],
    ),
    # food_mode: corpse drops + eating food via attack
    "food": dict(
        cfg=food_cfg, map_size=20, steps=50, action_seed=29,
        placements=[_grid(5, 5, 3, 3, 2), _grid(6, 6, 4, 4, 2)],
    ),
    # fractional eat crumbs + negative kill_supply (dense pack around prey
    # so several hunters eat the same corpse in one step)
    "food_crumb": dict(
        cfg=food_crumb_cfg, map_size=18, steps=50, action_seed=43,
        placements=[_grid(4, 4, 4, 4, 2), _grid(5, 5, 3, 3, 2)],
    ),
    # fill placement method (rect tiling, GridWorld.cc:259-284)
    "fill_place": dict(
        cfg=battle_cfg, map_size=24, steps=20, action_seed=31,
        fill_placements=[(0, (4, 4), (8, 10)), (1, (14, 8), (6, 8))],
    ),
    # can_absorb goals + collide rewards (arrange demo mechanics)
    "absorb": dict(
        cfg=absorb_cfg, map_size=20, steps=40, action_seed=19,
        placements=[_grid(8, 8, 3, 3, 2), _grid(4, 4, 4, 4, 3)],
    ),
    # 2x2 predator bodies
    "pursuit": dict(
        cfg=pursuit_cfg, map_size=24, steps=40, action_seed=13,
        placements=[_grid(4, 4, 3, 3, 4), _grid(6, 6, 5, 5, 2)],
    ),
    # ---- contention-free scenarios: the FAST engine must be bit-exact ----
    # agents spaced so far apart they can never interact within the step
    # budget: pure movement/starve/step phases
    "sparse_wander": dict(
        cfg=battle_cfg, map_size=140, steps=10, action_seed=37,
        placements=[
            [[15, 15, 0], [65, 15, 0], [115, 15, 0], [15, 65, 0]],
            [[65, 65, 0], [115, 65, 0], [15, 115, 0], [65, 115, 0]],
        ],
        skip_views=True,
        fast_exact=True,
    ),
    # immobile duel pairs: single-attacker targets, zero-damage victims
    # (see duel_cfg docstring for why this is order-independent)
    "static_duel": dict(
        cfg=duel_cfg, map_size=40, steps=40, action_seed=41,
        placements=[
            [[8, 8, 0], [24, 8, 0], [8, 24, 0], [24, 24, 0]],
            [[10, 8, 0], [26, 8, 0], [10, 24, 0], [26, 24, 0]],
        ],
        fast_exact=True,
        all_views=True,
    ),
}


def run_scenario(magent_module, scenario, engine_mode=None):
    """Drive one scenario on either package; returns the recorded trace."""
    spec = SCENARIOS[scenario]
    gw = magent_module.gridworld
    cfg = spec["cfg"](gw, spec["map_size"])
    kwargs = {}
    if engine_mode is not None:
        kwargs["engine_mode"] = engine_mode
    env = magent_module.GridWorld(cfg, **kwargs)
    handles = env.get_handles()
    env.reset()
    if "random_placements" in spec:
        for what, n in spec["random_placements"]:
            if what == "walls":
                env.add_walls(method="random", n=n)
            else:
                env.add_agents(handles[what], method="random", n=n)
    elif "fill_placements" in spec:
        for g, pos, size in spec["fill_placements"]:
            env.add_agents(handles[g], method="fill", pos=pos, size=size)
    else:
        for h, pos in zip(handles, spec["placements"]):
            env.add_agents(h, method="custom", pos=pos)

    trace = {"done": [], "steps": 0}
    for g in range(len(handles)):
        trace["num_%d" % g] = []
        trace["ids_%d" % g] = []
        trace["pos_%d" % g] = []
        trace["rew_%d" % g] = []
        trace["alive_%d" % g] = []
        trace["view0_%d" % g] = None
        trace["feat0_%d" % g] = None

    rng = np.random.RandomState(spec["action_seed"])
    done = False
    for step in range(spec["steps"]):
        if done:
            break
        for i, h in enumerate(handles):
            view, feat = env.get_observation(h)
            if spec.get("all_views"):
                trace.setdefault("views_%d" % i, []).append(
                    np.array(view, np.float32, copy=True))
            if step == 0 and not spec.get("skip_views"):
                # deep-copy: the reference reuses (and in-place resizes) its
                # observation buffers across calls
                trace["view0_%d" % i] = np.array(view, np.float32, copy=True)
                trace["feat0_%d" % i] = np.array(feat, np.float32, copy=True)
            n = env.get_num(h)
            acts = rng.randint(0, env.get_action_space(h)[0], n).astype(np.int32)
            env.set_action(h, acts)
        done = bool(env.step())
        for i, h in enumerate(handles):
            trace["num_%d" % i].append(env.get_num(h))
            trace["ids_%d" % i].append(np.asarray(env.get_agent_id(h), np.int32))
            trace["pos_%d" % i].append(np.asarray(env.get_pos(h), np.int32))
            trace["rew_%d" % i].append(np.asarray(env.get_reward(h), np.float32))
            trace["alive_%d" % i].append(np.asarray(env.get_alive(h), bool))
        trace["done"].append(done)
        env.clear_dead()
        trace["steps"] = step + 1
    return trace


def flatten_trace(trace, n_groups):
    """trace -> flat dict of arrays for npz storage (ragged lists are
    concatenated with a length index)."""
    out = {"done": np.asarray(trace["done"], bool),
           "steps": np.asarray(trace["steps"])}
    for g in range(n_groups):
        for key in ("ids", "pos", "rew", "alive"):
            parts = trace["%s_%d" % (key, g)]
            lens = np.asarray([len(p) for p in parts], np.int32)
            out["%s_%d_lens" % (key, g)] = lens
            if parts:
                out["%s_%d_data" % (key, g)] = np.concatenate(parts, axis=0)
            else:
                out["%s_%d_data" % (key, g)] = np.zeros(0)
        out["num_%d" % g] = np.asarray(trace["num_%d" % g], np.int32)
        if trace["view0_%d" % g] is not None:
            out["view0_%d" % g] = trace["view0_%d" % g]
            out["feat0_%d" % g] = trace["feat0_%d" % g]
        if "views_%d" % g in trace:  # all_views scenarios: per-step windows
            parts = trace["views_%d" % g]
            out["views_%d_lens" % g] = np.asarray(
                [len(p) for p in parts], np.int32)
            out["views_%d_data" % g] = np.concatenate(
                [p.reshape(p.shape[0], -1) for p in parts], axis=0
            ) if parts else np.zeros((0, 1), np.float32)
    return out


# ---------------------------------------------------------------- snake
# DiscreteSnake parity: the reference wrapper cannot set `seed`
# (python/magent/discrete_snake.py:28-36 has no 'seed' key), so the stream
# is glibc's startup state srandom(1) — snake goldens MUST be generated in
# a FRESH process (generate_golden.py --scenarios snake_basic, nothing else)
# because the reference gridworld's turn_mode placement consumes libc rand()
# from the same per-process state.

SNAKE_SCENARIOS = {
    "snake_basic": dict(
        map_width=24, map_height=24, view_width=11, view_height=11,
        total_resource=40, n_food=25, n_agents=6, steps=40, action_seed=53,
    ),
}


def run_snake_scenario(magent_module, name, engine_mode=None):
    return run_snake_spec(magent_module, SNAKE_SCENARIOS[name],
                          engine_mode=engine_mode)


def run_snake_spec(magent_module, spec, engine_mode=None, render_dir=None):
    import importlib
    ds = importlib.import_module(magent_module.__name__ + ".discrete_snake")
    conf = {"map_width": spec["map_width"], "map_height": spec["map_height"],
            "view_width": spec["view_width"], "view_height": spec["view_height"],
            "total_resource": spec["total_resource"]}
    if hasattr(ds, "_LIB"):
        # the reference wrapper passes config keys as str to ctypes, which
        # truncates them under Python 3 (discrete_snake.py:41-47); build the
        # env with an empty config and push properly-encoded keys ourselves
        import ctypes

        cfg = ds.Config()
        env = ds.DiscreteSnake(cfg)
        for key, value in conf.items():
            ds._LIB.env_config_game(
                env.game, ctypes.c_char_p(key.encode("ascii")),
                ctypes.byref(ctypes.c_int(int(value))))
        import numpy as _np
        buf = _np.empty((3,), dtype=_np.int32)
        ds._LIB.env_get_info(env.game, 0, b"view_space",
                             buf.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
        env.view_space = [int(buf[0]), int(buf[1]), int(buf[2])]
        ds._LIB.env_get_info(env.game, 0, b"feature_space",
                             buf.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
        env.feature_space = int(buf[0])

        # two more Python-3 breakages in the reference wrapper: get_num /
        # get_food_num pass the info name as str (truncated by ctypes) and
        # get_alive allocates with the removed np.bool alias
        import types

        def _get_num(self, handle=0):
            num = ctypes.c_int32()
            ds._LIB.env_get_info(self.game, handle, b"num", ctypes.byref(num))
            return num.value

        def _get_food_num(self):
            num = ctypes.c_int32()
            ds._LIB.env_get_info(self.game, -2, b"num", ctypes.byref(num))
            return num.value

        def _get_alive(self, handle=0):
            n = self.get_num(handle)
            abuf = _np.empty((n,), dtype=_np.bool_)
            ds._LIB.env_get_info(self.game, handle, b"alive",
                                 abuf.ctypes.data_as(ctypes.POINTER(ctypes.c_bool)))
            return abuf

        env.get_num = types.MethodType(_get_num, env)
        env.get_food_num = types.MethodType(_get_food_num, env)
        env.get_alive = types.MethodType(_get_alive, env)
        if render_dir is not None:
            # the wrapper's set_render_dir passes a str to ctypes
            # (truncated under Python 3) — push the encoded key directly
            _LIB = ds._LIB
            _LIB.env_config_game(
                env.game, ctypes.c_char_p(b"render_dir"),
                ctypes.c_char_p(render_dir.encode("ascii")))
    else:
        cfg = ds.Config()
        cfg.set(conf)
        kwargs = {}
        if engine_mode is not None:
            kwargs["engine_mode"] = engine_mode
        env = ds.DiscreteSnake(cfg, **kwargs)
        if render_dir is not None:
            env.set_render_dir(render_dir)
    env.reset()
    env.add_food(method="random", n=spec["n_food"])
    env.add_agent(method="random", n=spec["n_agents"])

    trace = {"steps": 0, "num": [], "food_num": [], "ids": [], "head": [],
             "length": [], "alive": [], "rew": [], "view0": None,
             "feat0": None}
    rng = np.random.RandomState(spec["action_seed"])
    for step in range(spec["steps"]):
        view, feat = env.get_observation(0)
        if step == 0:
            trace["view0"] = np.array(view, np.float32, copy=True)
            trace["feat0"] = np.array(feat, np.float32, copy=True)
        n = env.get_num()
        acts = rng.randint(0, 5, n).astype(np.int32)
        env.set_action(0, acts)
        env.step()
        trace["num"].append(env.get_num())
        trace["food_num"].append(env.get_food_num())
        trace["ids"].append(np.asarray(env.get_agent_id(), np.int32))
        trace["head"].append(np.asarray(env.get_head(), np.int32))
        trace["length"].append(np.asarray(env.get_length(), np.int32))
        trace["alive"].append(np.asarray(env.get_alive(), bool))
        trace["rew"].append(np.asarray(env.get_reward(), np.float32))
        if render_dir is not None:
            env.render()
        env.clear_dead()
        trace["steps"] = step + 1
    return trace


def flatten_snake_trace(trace):
    flat = {"steps": trace["steps"], "num": np.asarray(trace["num"]),
            "food_num": np.asarray(trace["food_num"]),
            "view0": trace["view0"], "feat0": trace["feat0"]}
    for key in ("ids", "head", "length", "alive", "rew"):
        flat[key + "_data"] = np.concatenate(
            [np.asarray(v).reshape(len(v), -1).reshape(-1)
             if np.asarray(v).size else np.asarray(v, np.float32).reshape(-1)
             for v in trace[key]]
        ) if trace[key] else np.zeros(0)
    return flat
