"""Replay frame dumper, byte-compatible with the reference render format.

Writes ``config.json`` and ``video_<k>.txt`` files exactly like the
reference's RenderGenerator (reference: src/gridworld/RenderGenerator.cc:
gen_config :57-105, render_a_frame :108-185):

- ``config.json``: map size, per-group style/size/speed/view/attack;
- ``video_<k>.txt``: one ``W n`` wall list when a file starts, then per
  frame ``F n_agents n_attacks 0`` followed by agent lines
  ``id hp dir x y group`` and attack-event lines ``op id x y``.

Attack events are reconstructed host-side from the last actions: an agent
whose action is an attack emits ``(id, target_x, target_y)`` whether or not
it hit (reference: GridWorld.cc:475-490 records the event before checking
the target).
"""

from __future__ import annotations

import os

import numpy as np


_COLORS = [(192, 64, 64), (64, 64, 192), (64, 192, 64), (64, 64, 64)]
_DIR2ANGLE = [0, 90, 180, 270]


def _rgba(r, g, b, alpha):
    # match the reference's C++ float printing (0.8 -> "0.8", 1.0 -> "1")
    a = ("%g" % alpha)
    return '"rgba(%d,%d,%d,%s)"' % (r, g, b, a)


def attack_events(env):
    """Reconstruct (id, tx, ty) per attacking agent from last actions
    (reference: GridWorld.cc:475-490 records the event before checking the
    target).  Pure read of env state; also used by env.get_both_attack."""
    from ..core import geometry as geo
    from .. import spec as speclib

    seq_events = getattr(env, "_last_attack_events", None)
    if seq_events is not None:
        # sequential engine mode: the exact buffer-order event list
        return list(seq_events)
    spec = env.spec
    events = []
    st = env.state
    actions = env._actions
    x = np.asarray(st.x)
    y = np.asarray(st.y)
    d = np.asarray(st.dir)
    ids = np.asarray(st.id)
    active = np.asarray(st.active)
    dead = np.asarray(st.dead)
    last_op = np.asarray(st.last_op)
    pre_dead = getattr(env, "_pre_step_dead", None)
    if pre_dead is None or len(pre_dead) != len(dead):
        pre_dead = dead  # no snapshot (e.g. render before any step)
    for g in spec.groups:
        t = g.type
        sl = slice(g.offset, g.offset + g.cap)
        act = actions[sl]
        # the reference emits the event for every attacker alive AT ITS TURN
        # in the (shuffled) attack phase, even one killed later that step
        # (GridWorld.cc:476-486).  Pre-step liveness excludes agents that
        # died in EARLIER steps (whose sticky ops would otherwise emit
        # phantoms in raw step() chains); for an attacker that died THIS
        # step, its op showing it acted is the best post-step signal (only
        # a mid-phase-killed blank-attacker is unknowable).
        acted = (last_op[sl] == speclib.OP_ATTACK) | (
            last_op[sl] == speclib.OP_KILL)
        is_attack = (
            active[sl] & ~pre_dead[sl] & (~dead[sl] | acted)
            & (act >= t.attack_base) & (act < t.n_action)
        )
        if not is_attack.any():
            continue
        for k in np.nonzero(is_attack)[0]:
            s = g.offset + k
            att = act[k] - t.attack_base
            dx, dy = t.attack_range.num2delta(int(att))
            rx, ry = geo.save_to_real_np(x[s], y[s], d[s], t.width, t.length)
            tx, ty = geo.rela_to_abs_np(
                rx, ry, d[s], t.att_x_offset + dx, t.att_y_offset + dy
            )
            events.append((int(ids[s]), int(tx), int(ty)))
    return events


class RenderGenerator:
    def __init__(self, save_dir: str, frame_per_file: int = 10000):
        self.save_dir = save_dir
        self.frame_per_file = frame_per_file
        self.file_ct = 0
        self.frame_ct = 0
        os.makedirs(save_dir, exist_ok=True)

    def next_file(self):
        self.file_ct += 1
        self.frame_ct = 0

    # ----------------------------------------------------------------- config
    def gen_config(self, env):
        """reference: RenderGenerator::gen_config (RenderGenerator.cc:57-105)"""
        spec = env.spec
        lines = ["{"]

        def kv(key, value, last=False):
            lines.append('"%s": %s%s' % (key, value, "" if last else ","))

        kv("width", spec.width)
        kv("height", spec.height)
        kv("static-file", '"static.map"')
        kv("obstacle-style", _rgba(127, 127, 127, 1))
        kv("dynamic-file-directory", '"."')
        kv("attack-style", _rgba(63, 63, 63, 0.8))
        kv("minimap-width", 300)
        kv("minimap-height", 250)
        lines.append('"group" : [')
        for i, g in enumerate(spec.groups):
            t = g.type
            c = _COLORS[i % len(_COLORS)]
            lines.append("{")
            kv("height", t.length)
            kv("width", t.width)
            kv("style", _rgba(c[0], c[1], c[2], 1))
            kv("anchor", "[0, 0]")
            kv("max-speed", int(t.speed))
            kv("speed-style", _rgba(c[0], c[1], c[2], 0.01))
            kv("vision-radius", "%g" % t.view_radius)
            kv("vision-angle", "%g" % t.view_angle)
            kv("vision-style", _rgba(c[0], c[1], c[2], 0.2))
            kv("attack-radius", "%g" % t.attack_radius)
            kv("attack-angle", "%g" % t.attack_angle)
            kv("attack-style", _rgba(c[0], c[1], c[2], 0.1))
            kv("broadcast-radius", 1, last=True)
            lines.append("}," if i < len(spec.groups) - 1 else "}")
        lines.append("]")
        lines.append("}")
        with open(os.path.join(self.save_dir, "config.json"), "w") as f:
            f.write("\n".join(lines) + "\n")

    # ----------------------------------------------------------------- frames
    def _attack_events(self, env):
        return attack_events(env)

    def render_a_frame(self, env, include_events=True):
        """reference: RenderGenerator::render_a_frame
        (RenderGenerator.cc:108-185).  ``include_events=False`` replicates
        the very first frame of a session: the reference captures attack
        events during step() only once rendering has been ACTIVATED
        (GridWorld.cc:484 ``if (!first_render)``), so the frame rendered
        right after the first activation carries none."""
        spec = env.spec
        st = env.state
        path = os.path.join(self.save_dir, "video_%d.txt" % self.file_ct)
        mode = "w" if self.frame_ct == 0 else "a"
        out = []

        if self.frame_ct == 0:
            wall = np.asarray(st.cell_wall)
            ys, xs = np.nonzero(wall)
            out.append("W %d" % len(xs))
            for i in range(len(xs)):
                out.append("%d %d" % (xs[i], ys[i]))

        events = self._attack_events(env) if include_events else []

        # agents (can_absorb types render only absorbed members,
        # RenderGenerator.cc:137-163)
        active = np.asarray(st.active)
        absorbed = np.asarray(st.absorbed)
        hp = np.asarray(st.hp)
        ids = np.asarray(st.id)
        x = np.asarray(st.x)
        y = np.asarray(st.y)
        d = np.asarray(st.dir)

        agent_lines = []
        for i, g in enumerate(spec.groups):
            t = g.type
            sl = slice(g.offset, g.offset + g.cap)
            keep = active[sl]
            if t.can_absorb:
                keep = keep & absorbed[sl]
            idx = np.nonzero(keep)[0]
            hp_pct = np.clip((100 * hp[sl] / t.hp).astype(np.int64), 0, 100)
            for k in idx:
                agent_lines.append(
                    "%d %d %d %d %d %d"
                    % (
                        ids[sl][k],
                        hp_pct[k],
                        _DIR2ANGLE[int(d[sl][k])],
                        x[sl][k],
                        y[sl][k],
                        i,
                    )
                )

        out.append("F %d %d 0" % (len(agent_lines), len(events)))
        out.extend(agent_lines)
        for (aid, tx, ty) in events:
            out.append("0 %d %d %d" % (aid, tx, ty))

        with open(path, mode) as f:
            f.write("\n".join(out) + "\n")

        env._attack_events = np.asarray(
            [[e[0], e[1], e[2]] for e in events], np.int32
        ).reshape(-1, 3)

        self.frame_ct += 1
        if self.frame_ct > self.frame_per_file:
            self.frame_ct = 0
            self.file_ct += 1


class SnakeRenderGenerator:
    """Replay dumper for DiscreteSnake in the reference snake format
    (reference: src/discrete_snake/RenderGenerator.cc:53-206):

    - ``config.json`` + ``static.map`` (wall list) at setup;
    - per frame ``F n 0 0`` then one line per food cell (group 1) and per
      snake body segment tail->head (body group 2, head group 0), each
      ``id hp dir x y group`` with hp=100 and dir=270 like the reference.
    """

    def __init__(self, save_dir: str, frame_per_file: int = 10000):
        self.save_dir = save_dir
        self.frame_per_file = frame_per_file
        self.file_ct = 0
        self.frame_ct = 0
        self.id_ct = 0
        os.makedirs(save_dir, exist_ok=True)

    def gen_config(self, env):
        """reference: RenderGenerator::gen_config (snake,
        RenderGenerator.cc:53-144)"""
        lines = ["{"]

        def kv(key, value, last=False):
            lines.append('"%s": %s%s' % (key, value, "" if last else ","))

        kv("width", env.width)
        kv("height", env.height)
        kv("static-file", '"static.map"')
        kv("obstacle-style", _rgba(127, 127, 127, 1))
        kv("dynamic-file-directory", '"."')
        kv("attack-style", _rgba(63, 63, 63, 0.8))
        kv("minimap-width", 300)
        kv("minimap-height", 250)
        lines.append('"group" : [')
        # groups: food, snake head, snake body (reference color table)
        for n, (c, alpha) in enumerate([((64, 64, 192), 1),
                                        ((192, 64, 64), 1),
                                        ((64, 192, 64), 0.9)]):
            lines.append("{")
            kv("height", 1)
            kv("width", 1)
            kv("style", _rgba(c[0], c[1], c[2], alpha))
            kv("anchor", "[0, 0]")
            kv("max-speed", 0)
            kv("speed-style", _rgba(c[0], c[1], c[2], 0.01))
            kv("vision-radius", 0)
            kv("vision-angle", 0)
            kv("vision-style", _rgba(c[0], c[1], c[2], 0.2))
            kv("attack-radius", 0)
            kv("attack-angle", 0)
            kv("attack-style", _rgba(c[0], c[1], c[2], 0.1))
            kv("broadcast-radius", 1, last=True)
            lines.append("}," if n < 2 else "}")
        lines.append("]")
        lines.append("}")
        with open(os.path.join(self.save_dir, "config.json"), "w") as f:
            f.write("\n".join(lines) + "\n")

        st = getattr(env, "state", None)
        wall = (np.asarray(st.cell_wall) if st is not None
                else env.wall_mask())
        ys, xs = np.nonzero(wall)
        with open(os.path.join(self.save_dir, "static.map"), "w") as f:
            f.write("%d\n" % len(xs))
            for i in range(len(xs)):
                f.write("%d %d\n" % (xs[i], ys[i]))

    def render_a_frame(self, env):
        """reference: RenderGenerator::render_a_frame (snake,
        RenderGenerator.cc:146-203)"""
        st = env.state
        alive = np.asarray(st.active & st.alive)
        length = np.asarray(st.length)
        head = np.asarray(st.head)
        body_x = np.asarray(st.body_x)
        body_y = np.asarray(st.body_y)
        food = np.asarray(st.cell_food)
        L = body_x.shape[1]

        fys, fxs = np.nonzero(food > 0)
        bodies = []
        for s in np.nonzero(alive)[0]:
            n = int(length[s])
            bodies.append([
                (int(body_x[s, (int(head[s]) - k) % L]),
                 int(body_y[s, (int(head[s]) - k) % L]))
                for k in range(n - 1, -1, -1)  # tail -> head
            ])
        self.write_frame(list(zip(fxs.tolist(), fys.tolist())), bodies)

    def write_frame(self, foods, bodies):
        """Shared frame writer: ``foods`` = [(x, y), ...]; ``bodies`` =
        one list per live snake of (x, y) segments tail -> head (the last
        segment is the head, rendered as group 0 — the reference walks the
        deque rbegin->rend, RenderGenerator.cc:187-197)."""
        path = os.path.join(self.save_dir, "video_%d.txt" % self.file_ct)
        mode = "w" if self.frame_ct == 0 else "a"
        n_snake = sum(len(b) for b in bodies)
        out = ["F %d 0 0" % (n_snake + len(foods))]

        hp, angle = 100, 270
        for fx, fy in foods:
            out.append("%d %d %d %d %d 1" % (self.id_ct, hp, angle, fx, fy))
            self.id_ct += 1
        for body in bodies:
            for k, (bx, by) in enumerate(body):
                group = 0 if k == len(body) - 1 else 2
                out.append("%d %d %d %d %d %d" % (
                    self.id_ct, hp, angle, bx, by, group))
                self.id_ct += 1

        with open(path, mode) as f:
            f.write("\n".join(out) + "\n")

        self.frame_ct += 1
        if self.frame_ct > self.frame_per_file:
            self.frame_ct = 0
            self.file_ct += 1
