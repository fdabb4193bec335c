"""Replay dump format tests (reference: src/gridworld/RenderGenerator.cc)."""

import json
import os

import numpy as np

import magent_tpu as magent


def test_render_dump_format(tmp_path):
    env = magent.GridWorld("battle", map_size=16)
    h0, h1 = env.get_handles()
    env.set_render_dir(str(tmp_path))
    env.reset()
    env.add_agents(h0, method="custom", pos=[[3, 3], [5, 5]])
    env.add_agents(h1, method="custom", pos=[[10, 10], [12, 12]])

    rng = np.random.RandomState(0)
    for _ in range(3):
        for h in (h0, h1):
            n = env.get_num(h)
            env.set_action(
                h, rng.randint(0, env.get_action_space(h)[0], n).astype(np.int32)
            )
        env.step()
        env.render()
        env.clear_dead()

    cfg = json.load(open(tmp_path / "config.json"))
    assert cfg["width"] == 16 and cfg["height"] == 16
    assert len(cfg["group"]) == 2
    assert cfg["group"][0]["style"].startswith("rgba(")

    lines = open(tmp_path / "video_1.txt").read().strip().split("\n")
    assert lines[0].startswith("W ")
    n_wall = int(lines[0].split()[1])
    assert n_wall >= 4 * 16 - 4  # border walls
    i = 1 + n_wall
    frames = 0
    while i < len(lines):
        tag, n_agents, n_attacks, _ = lines[i].split()
        assert tag == "F"
        for j in range(int(n_agents)):
            parts = lines[i + 1 + j].split()
            assert len(parts) == 6
            hp = int(parts[1])
            assert 0 <= hp <= 100
        i += 1 + int(n_agents) + int(n_attacks)
        frames += 1
    assert frames == 3


def test_render_next_file_on_reset(tmp_path):
    env = magent.GridWorld("battle", map_size=16)
    h0, h1 = env.get_handles()
    env.set_render_dir(str(tmp_path))
    env.reset()
    env.add_agents(h0, method="random", n=2)
    env.add_agents(h1, method="random", n=2)
    env.render()
    env.reset()
    env.add_agents(h0, method="random", n=2)
    env.add_agents(h1, method="random", n=2)
    env.render()
    assert os.path.exists(tmp_path / "video_1.txt")
    assert os.path.exists(tmp_path / "video_1.txt")


def test_no_phantom_attack_events_for_long_dead_agents():
    """An agent that died in an EARLIER step must not emit attack events
    from its sticky last_op when the env is stepped without clear_dead
    (render/generator.py pre-step snapshot)."""
    import numpy as np
    import magent_tpu as magent
    from magent_tpu.render.generator import attack_events

    env = magent.GridWorld("battle", map_size=16)
    h0, h1 = env.get_handles()
    env.reset()
    env.add_agents(h0, method="custom", pos=[[3, 3]])
    env.add_agents(h1, method="custom", pos=[[4, 3]])
    b0, v2a0 = env.get_view2attack(h0)
    c = v2a0.shape[0] // 2
    right = int(b0 + v2a0[c, c + 1])
    stay = 6  # center of the 13-move diamond

    dead_seen = False
    for _ in range(30):
        env.set_action(h0, np.array([right], np.int32))
        env.set_action(h1, np.array([stay], np.int32))
        env.step()
        alive0, alive1 = env.get_alive(h0), env.get_alive(h1)
        if not (alive0.all() and alive1.all()):
            dead_seen = True
            break
        env.clear_dead()
    assert dead_seen

    # two further steps WITHOUT clear_dead: the dead agent's sticky op must
    # not re-emit its event; the survivor keeps emitting
    for _ in range(2):
        env.step()
        ev_ids = [e[0] for e in attack_events(env)]
        assert len(ev_ids) == 1, ev_ids
