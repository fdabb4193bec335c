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


def test_arrange_server_steps():
    server = ArrangeServer(messages=["HI"], map_size=48, total_step=6)
    n_goals = server.env.get_num(server.goal_handle)
    assert n_goals > 0
    for frame in range(3):
        server.get_data(frame, (0, 48), (0, 48))
    banners = server.get_banners(3, (800, 600))
    assert "arranged" in banners[0][0][0]
