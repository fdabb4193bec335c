"""Playable battle: a live env stepped by two trained DQNs; the user drops
reinforcements with the mouse (reference:
python/magent/renderer/server/battle_server.py)."""

import math

import numpy as np

import magent_tpu as magent
from magent_tpu.builtin.jax_model import DeepQNetwork

from .base_server import BaseServer


def load_config(map_size):
    gw = magent.gridworld
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


def generate_map(env, map_size, handles):
    width = height = map_size
    init_num = map_size * map_size * 0.04
    gap = 3
    side = int(math.sqrt(init_num)) * 2
    pos = []
    for x in range(width // 2 - gap - side, width // 2 - gap - side + side, 2):
        for y in range((height - side) // 2, (height - side) // 2 + side, 2):
            pos.append([x, y, 0])
    env.add_agents(handles[0], method="custom", pos=pos)
    pos = []
    for x in range(width // 2 + gap, width // 2 + gap + side, 2):
        for y in range((height - side) // 2, (height - side) // 2 + side, 2):
            pos.append([x, y, 0])
    env.add_agents(handles[1], method="custom", pos=pos)


class BattleServer(BaseServer):
    def __init__(self, path="save_model", epoch=None,
                 names=("trusty-battle-game-l", "trusty-battle-game-r"),
                 map_size=125, total_step=1000, add_counter=10, add_interval=50,
                 eps=0.05):
        from magent_tpu.builtin.jax_model.base import latest_epoch

        env = magent.GridWorld(load_config(map_size))
        handles = env.get_handles()
        models = [
            DeepQNetwork(env, handles[0], names[0], memory_size=2 ** 10),
            DeepQNetwork(env, handles[1], names[1], memory_size=2 ** 10),
        ]
        # load order: locally-trained checkpoints first, then the
        # checkpoints bundled with the repo (the reference's downloaded
        # pretrained models, examples/show_battle_game.py:13-15) so the
        # interactive game works out of the box
        self.loaded = [False] * len(models)
        roots = [path, magent.utility.bundled_model_dir()]
        for i, model in enumerate(models):
            for root in roots:
                ep = (epoch if epoch is not None
                      else latest_epoch(root, names[i]))
                if ep is None:
                    continue
                try:
                    model.load(root, ep, names[i])
                except FileNotFoundError:
                    continue
                print("loaded %s epoch %d from %s" % (names[i], ep, root))
                self.loaded[i] = True
                break
            if not self.loaded[i]:
                print("no checkpoint for %s: plays untrained "
                      "(train with examples/train_battle_game.py)" % names[i])

        env.reset()
        generate_map(env, map_size, handles)

        self.env = env
        self.handles = handles
        self.models = models
        self.eps = eps
        self.map_size = map_size
        self.total_step = total_step
        self.add_interval = add_interval
        self.add_counter = add_counter
        self.done = False

    def get_info(self):
        return ((self.map_size, self.map_size), self.env._get_groups_info(),
                {"wall": self.env._get_walls_info()})

    def step(self):
        env, handles, models = self.env, self.handles, self.models
        obs = [env.get_observation(h) for h in handles]
        ids = [env.get_agent_id(h) for h in handles]
        for i, h in enumerate(handles):
            acts = models[i].infer_action(obs[i], ids[i], "e_greedy",
                                          eps=self.eps)
            env.set_action(h, acts)
        done = env.step()
        env.clear_dead()
        return done

    def get_data(self, frame_id, x_range, y_range):
        if self.done:
            return None
        self.done = self.step()
        return self.env._get_render_info(x_range, y_range)

    def add_agents(self, x, y, g):
        pos = [(x + i, y + j) for i in range(-5, 5) for j in range(-5, 5)]
        self.env.add_agents(self.handles[g], method="custom", pos=pos)

    def get_map_size(self):
        return self.map_size, self.map_size

    def get_banners(self, frame_id, resolution):
        red = ("%d" % self.env.get_num(self.handles[0]), (200, 0, 0))
        vs = (" vs ", (0, 0, 0))
        blue = ("%d" % self.env.get_num(self.handles[1]), (0, 0, 200))
        result = [(red, vs, blue)]
        result.append((("%d chance(s) remained" % max(0, self.add_counter),
                        (0, 0, 0)),))
        result.append((("%d / %d steps" % (frame_id, self.total_step),
                        (0, 0, 0)),))
        if frame_id % self.add_interval == 0 and frame_id < self.total_step \
                and self.add_counter > 0:
            result.append((("Press the left mouse button to add agents",
                            (0, 0, 0)),))
        return result

    def get_status(self, frame_id):
        if frame_id % self.add_interval == 0 and self.add_counter > 0:
            return False
        if frame_id >= self.total_step or self.done:
            return None
        return True

    def keydown(self, frame_id, key, mouse_x, mouse_y):
        return False

    def mousedown(self, frame_id, pressed, mouse_x, mouse_y):
        if frame_id % self.add_interval == 0 and frame_id < self.total_step \
                and pressed[0] and self.add_counter > 0 and not self.done:
            self.add_counter -= 1
            # the player reinforces red where clicked; blue gets a random drop
            pos = [(mouse_x + i, mouse_y + j)
                   for i in range(-5, 5) for j in range(-5, 5)]
            self.env.add_agents(self.handles[0], method="custom", pos=pos)
            x = np.random.randint(0, self.map_size - 1)
            y = np.random.randint(0, self.map_size - 1)
            pos = [(x + i, y + j) for i in range(-5, 6) for j in range(-5, 5)]
            self.env.add_agents(self.handles[1], method="custom", pos=pos)
            return True
        return False

    def get_endscreen(self, frame_id):
        if frame_id == self.total_step or self.done:
            if self.env.get_num(self.handles[0]) > self.env.get_num(self.handles[1]):
                return [(("You", (200, 0, 0)), (" win! :)", (0, 0, 0)))]
            return [(("You", (200, 0, 0)), (" lose. :(", (0, 0, 0)))]
        return []
