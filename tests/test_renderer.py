"""Interactive renderer tests (headless: SDL dummy video driver)."""

import os

import numpy as np
import pytest

os.environ.setdefault("SDL_VIDEODRIVER", "dummy")

pygame = pytest.importorskip("pygame")

from magent_tpu.renderer import PyGameRenderer
from magent_tpu.renderer.server import (ArrangeServer, BattleServer,
                                        RandomServer, SampleServer)


def test_renderer_runs_sample_server():
    PyGameRenderer().start(SampleServer(), max_frames=5, fps=100)


def test_renderer_runs_random_server():
    PyGameRenderer().start(RandomServer(agent_number=50, map_size=40),
                           max_frames=5, fps=100)


def test_battle_server_steps():
    server = BattleServer(map_size=32, total_step=6, add_counter=0)
    info = server.get_info()
    assert info[0] == (32, 32)
    data = server.get_data(1, (0, 32), (0, 32))
    assert data is not None
    pos, events = data
    assert len(pos) > 0
    banners = server.get_banners(1, (800, 600))
    assert any("vs" in t for row in banners for (t, c) in row)


def test_battle_server_loads_bundled_checkpoints():
    """The interactive battle demo works out of the box: when the repo
    ships pretrained checkpoints under data/models (the local analog of
    the reference's downloaded models, reference utility.py:216-268),
    BattleServer must load them even with no save_model dir."""
    import magent_tpu as magent

    bundled = os.path.join(magent.utility.bundled_model_dir(),
                           "trusty-battle-game-l")
    if not os.path.isdir(bundled):
        pytest.skip("no bundled demo checkpoints in data/models")
    server = BattleServer(map_size=32, total_step=4, add_counter=0,
                          path="/nonexistent-save-model")
    assert all(server.loaded)
    assert server.get_data(1, (0, 32), (0, 32)) is not None


def test_arrange_server_steps():
    server = ArrangeServer(messages=["HI"], map_size=48, total_step=6)
    n_goals = server.env.get_num(server.goal_handle)
    assert n_goals > 0
    for frame in range(3):
        server.get_data(frame, (0, 48), (0, 48))
    banners = server.get_banners(3, (800, 600))
    assert "arranged" in banners[0][0][0]


def test_replay_snapshot_draw_frame(tmp_path):
    """The headless frontend mirror (scripts/replay_snapshot.py) draws every
    layer of replay.js: obstacle, food, body, hp bar, attack cross, range
    sector, minimap inset, count badges."""
    import sys as _sys

    sys_path_added = os.path.join(os.path.dirname(__file__), "..", "scripts")
    _sys.path.insert(0, sys_path_added)
    try:
        from replay_snapshot import draw_frame
    finally:
        _sys.path.remove(sys_path_added)

    cfg = {
        "width": 10, "height": 10,
        "obstacle-style": "rgba(127,127,127,1)",
        "attack-style": "rgba(63,63,63,0.8)",
        "minimap-width": 2, "minimap-height": 2,
        "group": [
            {"width": 1, "height": 1, "style": "rgba(192,64,64,1)",
             "attack-radius": 1.5, "attack-angle": 360,
             "attack-style": "rgba(192,64,64,0.1)"},
            {"width": 1, "height": 1, "style": "rgba(64,64,192,1)",
             "attack-radius": 2, "attack-angle": 120,
             "attack-style": "rgba(64,64,192,0.1)"},
        ],
    }
    # sections: events;agents;breads;obstacles;minimap;counts
    body = ";".join([
        "0 0 4 4",                       # one attack cross at (4,4)
        "0 2 2 0 0 50|1 7 3 1 90 100",   # id x y group dir hp
        "5 5",                           # one food cell
        "1 1",                           # one obstacle
        "4278190335 16711935 65535 4294967295",  # 2x2 minimap
        "1 1",
    ])
    out = tmp_path / "frame.png"
    img = draw_frame(cfg, body, 10, str(out))
    assert out.exists()
    px = img.load()
    assert px[18, 18] == (127, 127, 127)        # obstacle at (1,1)
    assert px[55, 55] == (210, 180, 80)         # food at (5,5)
    assert px[25, 25] == (192, 64, 64)          # red body at (2,2)
    assert px[75, 35] == (64, 64, 192)          # blue body at (7,3)
    # left half of the 50%-hp bar is green, right half red
    assert px[22, 17][1] > 100 and px[22, 17][0] < 100
    assert px[28, 17][0] > 150 and px[28, 17][1] < 100
    # with ranges on, a sector tint appears outside the red body
    # (radius 1.5 cells) where the plain image is white
    assert px[25, 37] == (255, 255, 255)
    px2 = draw_frame(cfg, body, 10, str(out), ranges=True).load()
    assert px2[25, 37] != (255, 255, 255) and px2[25, 37][0] > 200
