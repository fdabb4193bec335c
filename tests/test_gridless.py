"""The gridless lockstep path must be bit-exact with the grid-maintaining
engine (same quad kernels, same priorities) on gridless-capable configs."""

import os

import numpy as np
import jax

from magent_tpu.builtin.config import battle
from magent_tpu.parallel import VecGridWorld


def test_gridless_matches_grid_path():
    cfg = battle.get_config(40)
    old = os.environ.get("MAGENT_GRIDLESS")
    try:
        os.environ["MAGENT_GRIDLESS"] = "0"
        v_grid = VecGridWorld(cfg, [24, 24], n_envs=3)
        os.environ.pop("MAGENT_GRIDLESS")
        v_free = VecGridWorld(cfg, [24, 24], n_envs=3)
    finally:
        if old is not None:
            os.environ["MAGENT_GRIDLESS"] = old
        else:
            os.environ.pop("MAGENT_GRIDLESS", None)

    s1 = v_grid.reset(jax.random.PRNGKey(0))
    s2 = jax.tree.map(lambda a: a, s1)
    t_grid = jax.jit(v_grid.transition)  # compile once, not per step
    t_free = jax.jit(v_free.transition)
    key = jax.random.PRNGKey(1)
    for _ in range(25):
        key, akey = jax.random.split(key)
        acts = v_grid.random_actions(akey)
        s1, r1, a1, d1 = t_grid(s1, acts)
        s2, r2, a2, d2 = t_free(s2, acts)
        for name in ("x", "y", "hp", "dead", "last_op", "op_obj",
                     "last_reward", "next_reward"):
            np.testing.assert_array_equal(
                np.asarray(getattr(s1, name)), np.asarray(getattr(s2, name)),
                err_msg=name)
        np.testing.assert_array_equal(np.asarray(r1), np.asarray(r2))
        np.testing.assert_array_equal(np.asarray(d1), np.asarray(d2))


def test_gridless_stay_not_collided_by_blocked_mover():
    """An in-place (0,0) move always succeeds; a lower-slot agent blocked by
    the stayer must not register as contention against it (the gridless
    claim sweep counts blocked movers' target cells, engine.py stay gate)."""
    import jax.numpy as jnp
    import magent_tpu as magent
    from magent_tpu.core import engine
    from magent_tpu.spec import OP_COLLIDE

    env = magent.GridWorld("battle", map_size=20)
    h0, _ = env.get_handles()
    env.reset()
    # slot 0 at (4,5) will move +x onto slot 1 at (5,5), which stays
    env.add_agents(h0, method="custom", pos=[[4, 5], [5, 5]])
    spec, state = env.spec, env.state

    dx = np.asarray(spec.s_move_dx)[0]
    dy = np.asarray(spec.s_move_dy)[0]
    stay = int(np.flatnonzero((dx == 0) & (dy == 0))[0])
    right = int(np.flatnonzero((dx == 1) & (dy == 0))[0])
    actions = np.zeros(spec.n_agents_cap, np.int32)
    actions[0], actions[1] = right, stay

    outs = []
    for maintain in (True, False):
        step = jax.jit(engine.make_step(spec, maintain_grid=maintain))
        outs.append(step(state, jnp.asarray(actions)))
    s_grid, s_free = outs

    for s in (s_grid, s_free):
        # the stayer keeps its cell with a successful (non-collide) op
        assert int(s.x[1]) == 5 and int(s.y[1]) == 5
        assert int(s.last_op[1]) != OP_COLLIDE
        # the mover is blocked by the stayer
        assert int(s.x[0]) == 4 and int(s.last_op[0]) == OP_COLLIDE
        assert int(s.op_obj[0]) == 1
    for name in ("x", "y", "last_op", "op_obj", "dead"):
        np.testing.assert_array_equal(
            np.asarray(getattr(s_grid, name)), np.asarray(getattr(s_free, name)))


def test_lockstep_last_reward_excludes_group_reward():
    """Agent::init_reward rotates only the INDIVIDUAL reward into
    last_reward (the obs feature); group reward appears solely in the
    reported rewards (GridWorld.cc:694-704 vs GridWorld.h:168-174)."""
    import jax.numpy as jnp
    import magent_tpu as magent

    gw = magent.gridworld
    cfg = gw.Config()
    cfg.set({"map_width": 24, "map_height": 24, "embedding_size": 4})
    t = gw.Config.register_agent_type(cfg, "t", {
        'width': 1, 'length': 1, 'hp': 10, 'speed': 1,
        'view_range': gw.CircleRange(3), 'attack_range': gw.CircleRange(1),
        'damage': 1, 'step_reward': -0.01})
    g0 = cfg.add_group(t)
    g1 = cfg.add_group(t)
    a = gw.AgentSymbol(g0, index='any')
    b = gw.AgentSymbol(g1, index='any')
    # group-level receiver: every attack pays the WHOLE group 0
    cfg.add_reward_rule(gw.Event(a, 'attack', b),
                        receiver=gw.AgentSymbol(g0, index='all'), value=0.5)

    venv = VecGridWorld(cfg, [12, 12], n_envs=2)
    state = jax.jit(venv.reset)(jax.random.PRNGKey(0))
    step_j = jax.jit(venv.step)
    trans_j = jax.jit(venv.transition)
    key = jax.random.PRNGKey(1)
    saw_group_reward = False
    for _ in range(12):
        key, akey = jax.random.split(key)
        acts = venv.random_actions(akey)
        stepped = step_j(state, acts)
        nxt, rewards, alive, done = trans_j(state, acts)
        if not bool(np.any(done)):
            np.testing.assert_allclose(
                np.asarray(nxt.last_reward), np.asarray(stepped.next_reward),
                atol=1e-6)
        if np.any(np.asarray(stepped.group_reward) != 0):
            saw_group_reward = True
            # the reported reward carries each slot's own group's reward
            gof = np.asarray(venv.spec.group_of_slot)
            gr = np.asarray(stepped.group_reward)[:, gof]
            np.testing.assert_allclose(
                np.asarray(rewards),
                np.asarray(stepped.next_reward) + gr, atol=1e-6)
        state = nxt
    assert saw_group_reward, "scenario never fired the group rule"


def _forest_cfg(map_size):
    """Forest/pursuit-class config: 2x2 predators + 1x1 fast prey
    (reference scripts/test/test_1m.py:14-41) — the multi-cell gridless
    rect-kernel path."""
    import magent_tpu as magent

    gw = magent.gridworld
    cfg = gw.Config()
    cfg.set({"map_width": map_size, "map_height": map_size})
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
    cfg.add_reward_rule(gw.Event(a, 'attack', b), receiver=[a, b],
                        value=[1, -1])
    return cfg


def _forest_placements(map_size, n_pred, n_prey, seed=3):
    rng = np.random.RandomState(seed)
    taken = set()
    preds = []
    while len(preds) < n_pred:
        x = int(rng.randint(1, map_size - 3))
        y = int(rng.randint(1, map_size - 3))
        block = [(x + dx, y + dy) for dx in range(2) for dy in range(2)]
        if not any(c in taken for c in block):
            taken.update(block)
            preds.append([x, y, 0])
    prey = []
    while len(prey) < n_prey:
        x = int(rng.randint(1, map_size - 2))
        y = int(rng.randint(1, map_size - 2))
        if (x, y) not in taken:
            taken.add((x, y))
            prey.append([x, y, 0])
    return [preds, prey]


def test_gridless_rect_matches_grid_path():
    """Multi-cell (2x2) bodies: the rect-kernel gridless path must be
    bit-exact with the grid-maintaining engine — including collide-object
    identity (op_obj feeds reward rules), the per-cell claim-min
    arbitration, and the (i, j) first-hit scan order."""
    cfg = _forest_cfg(30)
    placements = _forest_placements(30, 20, 20)
    old = os.environ.get("MAGENT_GRIDLESS")
    try:
        os.environ["MAGENT_GRIDLESS"] = "0"
        v_grid = VecGridWorld(cfg, [20, 20], n_envs=4,
                              placements=placements)
        os.environ.pop("MAGENT_GRIDLESS")
        v_free = VecGridWorld(cfg, [20, 20], n_envs=4,
                              placements=placements)
    finally:
        if old is not None:
            os.environ["MAGENT_GRIDLESS"] = old
        else:
            os.environ.pop("MAGENT_GRIDLESS", None)

    s1 = v_grid.reset(jax.random.PRNGKey(0))
    s2 = jax.tree.map(lambda a: a, s1)
    step_grid = jax.jit(v_grid.step)
    step_free = jax.jit(v_free.step)
    t_grid = jax.jit(v_grid.transition)
    t_free = jax.jit(v_free.transition)
    key = jax.random.PRNGKey(1)
    saw_collide = saw_attack = False
    from magent_tpu.spec import OP_COLLIDE, OP_ATTACK
    for _ in range(40):
        key, akey = jax.random.split(key)
        acts = v_grid.random_actions(akey)
        # compare the RAW stepped states too — transition rotates last_op /
        # op_obj to NULL, so only the pre-rotation state exposes the
        # collide-object identities the rect path must reproduce
        st1 = step_grid(s1, acts)
        st2 = step_free(s2, acts)
        for name in ("x", "y", "hp", "dead", "last_op", "op_obj",
                     "next_reward"):
            np.testing.assert_array_equal(
                np.asarray(getattr(st1, name)),
                np.asarray(getattr(st2, name)), err_msg="step:" + name)
        saw_collide |= bool(np.any(np.asarray(st1.last_op) == OP_COLLIDE))
        saw_attack |= bool(np.any(np.asarray(st1.last_op) == OP_ATTACK))
        s1, r1, a1, d1 = t_grid(s1, acts)
        s2, r2, a2, d2 = t_free(s2, acts)
        for name in ("x", "y", "hp", "dead", "last_reward", "next_reward"):
            np.testing.assert_array_equal(
                np.asarray(getattr(s1, name)), np.asarray(getattr(s2, name)),
                err_msg=name)
        np.testing.assert_array_equal(np.asarray(r1), np.asarray(r2))
        np.testing.assert_array_equal(np.asarray(d1), np.asarray(d2))
    # dense 30x30 map with 20 2x2 bodies: both event kinds must have fired
    # for the comparison to mean anything (forest predators have no damage
    # attribute, so attacks reward via the rule but never kill)
    assert saw_collide and saw_attack


def _interior_walls(map_size, n_wall, taken, seed=17):
    """Random interior wall cells avoiding `taken` (the FPS protocol's
    add_walls(method='random', n=n/10), reference scripts/test/test_1m.py:70)."""
    rng = np.random.RandomState(seed)
    walls = []
    while len(walls) < n_wall:
        x = int(rng.randint(1, map_size - 1))
        y = int(rng.randint(1, map_size - 1))
        if (x, y) not in taken:
            taken.add((x, y))
            walls.append([x, y])
    return walls


def _run_lockstep_parity(cfg, caps, placements, walls, steps=40, n_envs=4):
    """Step grid vs gridless engines in lockstep, asserting bit-exact state;
    returns the set of ops observed (for density sanity checks)."""
    from magent_tpu.spec import OP_COLLIDE, OP_ATTACK

    old = os.environ.get("MAGENT_GRIDLESS")
    try:
        os.environ["MAGENT_GRIDLESS"] = "0"
        v_grid = VecGridWorld(cfg, caps, n_envs=n_envs,
                              placements=placements, walls=walls)
        os.environ.pop("MAGENT_GRIDLESS")
        v_free = VecGridWorld(cfg, caps, n_envs=n_envs,
                              placements=placements, walls=walls)
    finally:
        if old is not None:
            os.environ["MAGENT_GRIDLESS"] = old
        else:
            os.environ.pop("MAGENT_GRIDLESS", None)

    s1 = v_grid.reset(jax.random.PRNGKey(0))
    s2 = jax.tree.map(lambda a: a, s1)
    # interior walls must land in the traced wall grid (obs channel 0 and
    # the grid path's enc both read it)
    if walls:
        w = np.asarray(s1.cell_wall[0])
        assert all(w[y, x] for x, y in walls)
    step_grid = jax.jit(v_grid.step)
    step_free = jax.jit(v_free.step)
    t_grid = jax.jit(v_grid.transition)
    t_free = jax.jit(v_free.transition)
    key = jax.random.PRNGKey(1)
    saw_collide = saw_attack = False
    for _ in range(steps):
        key, akey = jax.random.split(key)
        acts = v_grid.random_actions(akey)
        st1 = step_grid(s1, acts)
        st2 = step_free(s2, acts)
        for name in ("x", "y", "hp", "dead", "last_op", "op_obj",
                     "next_reward"):
            np.testing.assert_array_equal(
                np.asarray(getattr(st1, name)),
                np.asarray(getattr(st2, name)), err_msg="step:" + name)
        saw_collide |= bool(np.any(np.asarray(st1.last_op) == OP_COLLIDE))
        saw_attack |= bool(np.any(np.asarray(st1.last_op) == OP_ATTACK))
        s1, r1, a1, d1 = t_grid(s1, acts)
        s2, r2, a2, d2 = t_free(s2, acts)
        np.testing.assert_array_equal(np.asarray(r1), np.asarray(r2))
        np.testing.assert_array_equal(np.asarray(d1), np.asarray(d2))
    return saw_collide, saw_attack


def test_gridless_interior_walls_match_grid_path():
    """Interior walls (the FPS protocol's n/10 random wall cells) through
    the 1x1 pairwise path: wall-blocked movers must fail their move without
    registering a collide object — bit-exact vs the grid path's enc scan
    (engine._wall_blocked_gridless one-gather bitmap vs cell_wall reads)."""
    from magent_tpu.builtin.config import battle as battle_cfg

    cfg = battle_cfg.get_config(24)
    # dense hand layout around the walls so wall hits are guaranteed
    rng = np.random.RandomState(5)
    taken = set()
    walls = _interior_walls(24, 40, taken)
    sides = [[], []]
    for side in sides:
        while len(side) < 30:
            x, y = int(rng.randint(1, 23)), int(rng.randint(1, 23))
            if (x, y) not in taken:
                taken.add((x, y))
                side.append([x, y, 0])
    saw_collide, saw_attack = _run_lockstep_parity(
        cfg, [30, 30], sides, walls)
    assert saw_collide and saw_attack


def test_gridless_rect_interior_walls_match_grid_path():
    """Interior walls through the multi-cell rect path: a 2x2 predator whose
    target rect clips a single wall cell must be blocked (the packed
    rect-overlap code grid), while overlap with a BODY must still record
    that body as the collide object even when a wall also overlaps."""
    map_size = 28
    taken = set()
    walls = _interior_walls(map_size, 60, taken)
    cfg = _forest_cfg(map_size)
    rng = np.random.RandomState(9)
    preds = []
    while len(preds) < 16:
        x = int(rng.randint(1, map_size - 3))
        y = int(rng.randint(1, map_size - 3))
        block = [(x + dx, y + dy) for dx in range(2) for dy in range(2)]
        if not any(c in taken for c in block):
            taken.update(block)
            preds.append([x, y, 0])
    prey = []
    while len(prey) < 16:
        x = int(rng.randint(1, map_size - 2))
        y = int(rng.randint(1, map_size - 2))
        if (x, y) not in taken:
            taken.add((x, y))
            prey.append([x, y, 0])
    saw_collide, saw_attack = _run_lockstep_parity(
        cfg, [16, 16], [preds, prey], walls)
    assert saw_collide and saw_attack


def test_gridless_rect_matches_grid_path_mixed_sizes():
    """Asymmetric footprints (1x3 snakes vs 2x2 blocks): the first-overlap
    reduction must reproduce the grid path's (i outer, j inner) first-hit
    scan order when rects differ in BOTH dimensions (max_body=3 exercises
    a non-power-of-two key stride)."""
    import magent_tpu as magent

    gw = magent.gridworld
    cfg = gw.Config()
    cfg.set({"map_width": 26, "map_height": 26})
    block = cfg.register_agent_type(
        "block", {'width': 2, 'length': 2, 'hp': 1, 'speed': 1,
                  'view_range': gw.CircleRange(4),
                  'attack_range': gw.CircleRange(2)})
    snake = cfg.register_agent_type(
        "snake", {'width': 1, 'length': 3, 'hp': 1, 'speed': 2,
                  'view_range': gw.CircleRange(4),
                  'attack_range': gw.CircleRange(1)})
    g0 = cfg.add_group(block)
    g1 = cfg.add_group(snake)
    a = gw.AgentSymbol(g0, index='any')
    b = gw.AgentSymbol(g1, index='any')
    cfg.add_reward_rule(gw.Event(a, 'attack', b), receiver=[a, b],
                        value=[1, -1])

    rng = np.random.RandomState(11)
    taken = set()
    blocks, snakes = [], []
    while len(blocks) < 12:
        x, y = int(rng.randint(1, 22)), int(rng.randint(1, 22))
        cells = [(x + dx, y + dy) for dx in range(2) for dy in range(2)]
        if not any(c in taken for c in cells):
            taken.update(cells)
            blocks.append([x, y, 0])
    while len(snakes) < 12:
        x, y = int(rng.randint(1, 22)), int(rng.randint(1, 21))
        cells = [(x, y + dy) for dy in range(3)]
        if not any(c in taken for c in cells):
            taken.update(cells)
            snakes.append([x, y, 0])

    old = os.environ.get("MAGENT_GRIDLESS")
    try:
        os.environ["MAGENT_GRIDLESS"] = "0"
        v_grid = VecGridWorld(cfg, [12, 12], n_envs=3,
                              placements=[blocks, snakes])
        os.environ.pop("MAGENT_GRIDLESS")
        v_free = VecGridWorld(cfg, [12, 12], n_envs=3,
                              placements=[blocks, snakes])
    finally:
        if old is not None:
            os.environ["MAGENT_GRIDLESS"] = old
        else:
            os.environ.pop("MAGENT_GRIDLESS", None)

    s1 = v_grid.reset(jax.random.PRNGKey(0))
    s2 = jax.tree.map(lambda a_: a_, s1)
    step_grid = jax.jit(v_grid.step)
    step_free = jax.jit(v_free.step)
    key = jax.random.PRNGKey(1)
    saw_collide = False
    from magent_tpu.spec import OP_COLLIDE
    for _ in range(30):
        key, akey = jax.random.split(key)
        acts = v_grid.random_actions(akey)
        st1 = step_grid(s1, acts)
        st2 = step_free(s2, acts)
        for name in ("x", "y", "hp", "dead", "last_op", "op_obj",
                     "next_reward"):
            np.testing.assert_array_equal(
                np.asarray(getattr(st1, name)),
                np.asarray(getattr(st2, name)), err_msg="step:" + name)
        saw_collide |= bool(np.any(np.asarray(st1.last_op) == OP_COLLIDE))
        s1, *_ = v_grid.transition(s1, acts)
        s2, *_ = v_free.transition(s2, acts)
    assert saw_collide
