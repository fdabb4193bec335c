"""DiscreteSnake behavior tests (capability parity with the deprecated
reference game, src/discrete_snake/)."""

import numpy as np

from magent_tpu.discrete_snake import (ACT_LEFT, ACT_NOOP, ACT_RIGHT,
                                       ACT_UP, Config, DiscreteSnake)


def make_env(max_length=16, **over):
    cfg = Config()
    conf = dict(map_width=24, map_height=24, view_width=7, view_height=7,
                max_dead_penalty=-10, corpse_value=1, total_resource=30,
                embedding_size=8, seed=3)
    conf.update(over)
    cfg.set(conf)
    return DiscreteSnake(cfg, caps=16, max_length=max_length)

def test_snake_basic_episode():
    env = make_env()
    env.reset()
    env.add_food(method="random", n=20)
    env.add_agent(method="random", n=4)
    assert env.get_num() == 4
    assert env.get_view_space() == (7, 7, 5)
    assert env.get_feature_space() == (8 + 5 + 1,)
    lengths0 = env.get_length()
    assert (lengths0 == 3).all()

    rng = np.random.RandomState(0)
    total = 0.0
    for _ in range(20):
        view, feat = env.get_observation()
        n = env.get_num()
        assert view.shape == (n, 7, 7, 5)
        acts = rng.randint(0, env.get_action_space()[0], n).astype(np.int32)
        env.set_action(0, acts)
        env.step()
        total += env.get_reward().sum()
        env.clear_dead()
        if env.get_num() == 0:
            break
    # food rebalancing keeps resources around the target
    assert env.get_food_num() > 0


def test_snake_eats_and_grows():
    env = make_env(total_resource=0)  # no auto-spawn noise
    env.reset()
    # one snake placed manually via random until we know its head
    env.add_agent(method="random", n=1)
    (hx, hy), = env.get_head()
    # put food right of the head and move right
    food = np.asarray(env.state.cell_food).copy()
    if hx + 1 < 23:
        food[hy, hx + 1] = 1.0
    env.state = env.state.replace(cell_food=np.asarray(food))
    env.set_action(0, np.asarray([ACT_RIGHT], np.int32))
    env.step()
    if env.get_alive()[0]:
        assert env.get_reward()[0] == 1.0
        env.set_action(0, np.asarray([ACT_RIGHT], np.int32))
        env.step()
        if env.get_alive()[0]:
            assert env.get_length()[0] == 4  # grew by the eaten value


def test_snake_wall_death():
    env = make_env(total_resource=0)
    env.reset()
    env.add_agent(method="random", n=1)
    rng = np.random.RandomState(1)
    # walk left until hitting the border wall
    for _ in range(30):
        env.set_action(0, np.asarray([ACT_LEFT], np.int32))
        env.step()
        if not env.get_alive()[0]:
            break
    assert not env.get_alive()[0]
    assert env.get_reward()[0] == 10.0  # -max_dead_penalty
    env.clear_dead()
    assert env.get_num() == 0


def test_snake_render_dump(tmp_path):
    """Snake replay dump in the reference format (reference:
    src/discrete_snake/RenderGenerator.cc:53-206)."""
    import os

    env = make_env()
    env.add_food(method="random", n=10)
    env.add_agent(method="random", n=4)
    env.set_render_dir(str(tmp_path))

    for _ in range(3):
        n = env.get_num()
        env.set_action(0, np.zeros(n, np.int32) + ACT_NOOP)
        env.step()
        env.render()
        env.clear_dead()

    cfg = os.path.join(str(tmp_path), "config.json")
    video = os.path.join(str(tmp_path), "video_0.txt")
    static = os.path.join(str(tmp_path), "static.map")
    assert os.path.exists(cfg) and os.path.exists(video) and os.path.exists(static)
    import json
    parsed = json.loads(open(cfg).read())
    assert parsed["width"] == env.width and len(parsed["group"]) == 3

    lines = open(video).read().strip().splitlines()
    frames = [l for l in lines if l.startswith("F ")]
    assert len(frames) == 3
    # each frame: F count 0 0 followed by `count` entity lines
    n0 = int(frames[0].split()[1])
    i0 = lines.index(frames[0])
    body = lines[i0 + 1 : i0 + 1 + n0]
    assert len(body) == n0
    groups = {int(l.split()[-1]) for l in body}
    assert groups <= {0, 1, 2} and 0 in groups  # heads present


def test_snake_grid_invariants_under_collisions():
    """cell_ct stays non-negative and equals the live snakes' body footprint
    after deaths (a dead snake's never-placed new head must not be removed
    from the grid, discrete_snake.py dead-body loop; the full-ring overwrite
    forces a tail pop)."""
    env = make_env(map_width=14, map_height=14, total_resource=60, seed=11)
    env.reset()
    env.add_food(method="random", n=30)
    env.add_agent(method="random", n=10)
    rng = np.random.RandomState(1)

    for step in range(60):
        n = env.get_num()
        if n == 0:
            break
        env.set_action(0, rng.randint(0, 4, n).astype(np.int32))
        env.step()
        st = env.state
        ct = np.asarray(st.cell_ct)
        assert (ct >= 0).all(), f"negative cell_ct at step {step}"
        # recompute the live body footprint from the rings
        expect = np.zeros_like(ct)
        bx, by = np.asarray(st.body_x), np.asarray(st.body_y)
        head, length = np.asarray(st.head), np.asarray(st.length)
        alive = np.asarray(st.alive & st.active)
        L = bx.shape[1]
        for s_ in range(bx.shape[0]):
            if not alive[s_]:
                continue
            for i in range(int(length[s_])):
                ring = (int(head[s_]) - i) % L
                expect[by[s_, ring], bx[s_, ring]] += 1
        np.testing.assert_array_equal(ct, expect,
                                      err_msg=f"step {step}")
        env.clear_dead()


def test_snake_full_ring_forced_pop():
    """With max_length=4 the ring fills almost immediately: the push then
    overwrites the tail slot, which must count as a forced tail pop (the
    lost cell leaves the grid) or phantom occupied cells accumulate."""
    env = make_env(max_length=4, map_width=16, map_height=16,
                   total_resource=100, corpse_value=3, seed=5)
    env.reset()
    env.add_food(method="random", n=60)
    env.add_agent(method="random", n=4)
    rng = np.random.RandomState(2)

    hit_cap = False
    for step in range(50):
        n = env.get_num()
        if n == 0:
            break
        env.set_action(0, rng.randint(0, 4, n).astype(np.int32))
        env.step()
        st = env.state
        ct = np.asarray(st.cell_ct)
        length = np.asarray(st.length)
        alive = np.asarray(st.alive & st.active)
        hit_cap |= bool((length[alive] >= 4).any()) if alive.any() else False
        assert (ct >= 0).all(), f"negative cell_ct at step {step}"
        expect = np.zeros_like(ct)
        bx, by = np.asarray(st.body_x), np.asarray(st.body_y)
        head = np.asarray(st.head)
        L = bx.shape[1]
        for s_ in range(bx.shape[0]):
            if not alive[s_]:
                continue
            for i in range(int(length[s_])):
                ring = (int(head[s_]) - i) % L
                expect[by[s_, ring], bx[s_, ring]] += 1
        np.testing.assert_array_equal(ct, expect, err_msg=f"step {step}")
        env.clear_dead()
    assert hit_cap, "no snake ever reached the ring capacity"
