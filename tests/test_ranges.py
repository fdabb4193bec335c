"""Range masks and action-space layout parity with reference formulas
(reference: src/gridworld/Range.h, AgentType.cc:85-122)."""

import numpy as np

from magent_tpu.ranges import circle_range, sector_range
from magent_tpu.spec import AgentTypeSpec


def test_circle_range_battle_view():
    # battle "small": CircleRange(6), body width 1 -> 13x13, 113 cells
    r = circle_range(6, 0, 1)
    assert r.width == 13 and r.height == 13
    assert r.mask[6, 6]  # center included (inner = 0)
    assert r.count == int(r.mask.sum())
    # symmetric
    assert np.array_equal(r.mask, r.mask[::-1])
    assert np.array_equal(r.mask, r.mask[:, ::-1])
    assert (r.x1, r.y1, r.x2, r.y2) == (-6, -6, 6, 6)


def test_circle_range_attack_excludes_inner():
    # battle attack: CircleRange(1.5) with inner width/2 = 0.5 -> 8 cells (3x3 minus center)
    r = circle_range(1.5, 0.5, 1)
    assert r.width == 3
    assert r.count == 8
    assert not r.mask[1, 1]


def test_move_range_speed2():
    # speed 2 move range: 13 cells (diamond of radius 2 incl. diagonal dist < 2+eps)
    r = circle_range(2, 0, 1)
    assert r.count == 13
    # row-major delta ordering: first action is (0, -2)
    assert r.num2delta(0) == (0, -2)
    assert r.num2delta(6) == (0, 0)  # center no-op is action 6


def test_sector_range():
    r = sector_range(120, 4, 1)
    assert r.height == 4
    assert r.count == int(r.mask.sum())
    assert r.y2 == -1  # eye sits one row below the mask


def test_battle_action_space():
    t = AgentTypeSpec(
        "small",
        {"width": 1, "length": 1, "hp": 10, "speed": 2,
         "view_radius": 6, "view_angle": 360,
         "attack_radius": 1.5, "attack_angle": 360,
         "damage": 2, "step_recover": 0.1},
        turn_mode=False,
    )
    assert t.move_range.count == 13
    assert t.attack_range.count == 8
    assert t.turn_base == 13
    assert t.attack_base == 13
    assert t.n_action == 21  # known battle action-space size


def test_view2attack_table():
    t = AgentTypeSpec(
        "small",
        {"width": 1, "length": 1, "speed": 2, "view_radius": 6,
         "view_angle": 360, "attack_radius": 1.5, "attack_angle": 360},
        turn_mode=False,
    )
    v2a = t.view2attack()
    assert v2a.shape == (13, 13)
    assert (v2a >= 0).sum() == 8
    assert v2a[6, 6] == -1  # own cell not attackable
    # attack deltas land centered around the eye
    ys, xs = np.nonzero(v2a >= 0)
    assert ys.min() == 5 and ys.max() == 7 and xs.min() == 5 and xs.max() == 7


def test_pursuit_predator_even_parity():
    t = AgentTypeSpec(
        "predator",
        {"width": 2, "length": 2, "hp": 1, "speed": 1,
         "view_radius": 5, "view_angle": 360,
         "attack_radius": 2, "attack_angle": 360, "attack_penalty": -0.2},
        turn_mode=False,
    )
    # even body -> even-sized view mask
    assert t.view_range.width % 2 == 0
    assert t.view_x_offset == 1 and t.view_y_offset == 1
    assert t.n_action == t.move_range.count + t.attack_range.count
