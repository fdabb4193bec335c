"""Arrange demo: agents swarm onto absorbing goal markers that spell a
message rendered from the 8x8 pixel font (reference:
python/magent/renderer/server/arrange_server.py).

Goal markers are a ``can_absorb`` agent type; colliding agents are absorbed
(Map.cc:340-353) and light the marker up — the absorbed markers are exactly
the ones the replay/live renderers draw (RenderGenerator.cc:137-152)."""

import numpy as np

import magent_tpu as magent
from magent_tpu.builtin.jax_model import DeepQNetwork
from magent_tpu.builtin.rule_model import RandomActor
from magent_tpu.utility import FontProvider

from .base_server import BaseServer


def load_config(map_size):
    gw = magent.gridworld
    cfg = gw.Config()
    cfg.set({"map_width": map_size, "map_height": map_size})
    cfg.set({"minimap_mode": True})
    cfg.set({"embedding_size": 12})

    goal = cfg.register_agent_type(
        "goal",
        {'width': 1, 'length': 1, 'can_absorb': True})
    agent = cfg.register_agent_type(
        "agent",
        {'width': 1, 'length': 1, 'hp': 10, 'speed': 2,
         'view_range': gw.CircleRange(6),
         'damage': 2, 'step_recover': -10.0 / 400,
         'step_reward': 0})

    g_goal = cfg.add_group(goal)
    g_agent = cfg.add_group(agent)

    g = gw.AgentSymbol(g_goal, 'any')
    a = gw.AgentSymbol(g_agent, 'any')
    cfg.add_reward_rule(gw.Event(a, 'collide', g), receiver=a, value=10)
    return cfg


def generate_map(env, map_size, goal_handle, agent_handle, messages, font,
                 agent_density=0.02):
    """place goal markers spelling the message + a ring of agents"""
    max_len = 8
    lines = []
    for msg in messages:
        for i in range(0, len(msg), max_len):
            lines.append(msg[i : i + max_len])

    base_y = (map_size - len(lines) * font.height) // 2
    for message in lines:
        base_x = (map_size - len(message) * font.width) // 2
        for ch in message:
            data = font.get(ch)
            pos = []
            for i in range(font.height):
                for j in range(font.width):
                    if data[i][j] == 1:
                        pos.append([base_x + j, base_y + i])
            env.add_agents(goal_handle, method="custom", pos=pos)
            base_x += font.width
        base_y += font.height

    env.add_agents(agent_handle, method="random",
                   n=int(map_size * map_size * agent_density))


class ArrangeServer(BaseServer):
    def __init__(self, path="save_model", epoch=None, name="arrange",
                 messages=None, map_size=100, total_step=1000, eps=0.15,
                 font_file="data/font_8x8/basic.txt"):
        from magent_tpu.builtin.jax_model.base import latest_epoch

        messages = messages or ["MAGENT"]
        env = magent.GridWorld(load_config(map_size))
        goal_handle, agent_handle = env.get_handles()

        ep = epoch if epoch is not None else latest_epoch(path, name)
        try:
            if ep is None:
                raise FileNotFoundError(name)
            model = DeepQNetwork(env, agent_handle, name, memory_size=2 ** 10)
            model.load(path, ep, name)
            print("loaded %s epoch %d" % (name, ep))
        except FileNotFoundError:
            model = RandomActor(env, agent_handle)
            print("no checkpoint for %s: agents act randomly "
                  "(train with examples/train_arrange.py)" % name)

        env.reset()
        font = FontProvider(font_file)
        generate_map(env, map_size, goal_handle, agent_handle, messages, font)

        self.env = env
        self.goal_handle = goal_handle
        # goals must STAY PUT: action 0 is the (0,-1) north move in the
        # row-major move numbering, which would drift the glyph pixels up
        # every step (the reference never sets goal actions; this engine
        # consumes last_action for every active agent).  Computed once; the
        # zero-padded tail of the move tables must not be mistaken for a
        # (0,0) move, so the index is checked against turn_base.
        off = env.spec.groups[goal_handle.value].offset
        sdx = np.asarray(env.spec.s_move_dx)[off]
        sdy = np.asarray(env.spec.s_move_dy)[off]
        stay = int(np.flatnonzero((sdx == 0) & (sdy == 0))[0])
        assert stay < int(np.asarray(env.spec.s_turn_base)[off]), \
            "goal type's move range has no true (0,0) stay"
        self._goal_stay = stay
        self.agent_handle = agent_handle
        self.model = model
        self.eps = eps
        self.map_size = map_size
        self.total_step = total_step
        self.done = False

    def get_info(self):
        return ((self.map_size, self.map_size), self.env._get_groups_info(),
                {"wall": self.env._get_walls_info()})

    def step(self):
        env = self.env
        obs = env.get_observation(self.agent_handle)
        ids = env.get_agent_id(self.agent_handle)
        acts = self.model.infer_action(obs, ids, "e_greedy", eps=self.eps)
        env.set_action(self.agent_handle, acts)
        env.set_action(self.goal_handle, np.full(
            env.get_num(self.goal_handle), self._goal_stay, np.int32))
        done = env.step()
        env.clear_dead()
        return done

    def get_data(self, frame_id, x_range, y_range):
        if self.done:
            return None
        self.done = self.step()
        return self.env._get_render_info(x_range, y_range)

    def add_agents(self, x, y, g):
        pos = [(x + i, y + j) for i in range(-2, 3) for j in range(-2, 3)]
        self.env.add_agents(self.agent_handle, method="custom", pos=pos)

    def get_map_size(self):
        return self.map_size, self.map_size

    def _absorbed_count(self):
        env = self.env
        sl = env._group_slice(self.goal_handle)
        return int(np.sum(np.asarray(env.state.absorbed[sl])))

    def get_banners(self, frame_id, resolution):
        filled = self._absorbed_count()
        total = self.env.get_num(self.goal_handle)
        return [
            (("arranged %d / %d" % (filled, total), (0, 0, 0)),),
            (("%d / %d steps" % (frame_id, self.total_step), (0, 0, 0)),),
        ]

    def get_status(self, frame_id):
        if frame_id >= self.total_step or self.done:
            return None
        return True

    def keydown(self, frame_id, key, mouse_x, mouse_y):
        return False

    def mousedown(self, frame_id, pressed, mouse_x, mouse_y):
        if pressed[0]:
            self.add_agents(mouse_x, mouse_y, 1)
            return True
        return False

    def get_endscreen(self, frame_id):
        if frame_id >= self.total_step or self.done:
            return [(("Done, %d markers filled" % self._absorbed_count(),
                      (0, 0, 0)),)]
        return []
