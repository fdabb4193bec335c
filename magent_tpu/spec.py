"""Static game specification compiled from a :class:`magent_tpu.config.Config`.

The spec is the bridge between the declarative config DSL and the JAX engine:
everything shape- or table-like is precomputed here once (numpy), and the
jitted step/observe functions close over it as compile-time constants.

Reference parity notes are cited per-item against /root/reference.
"""

from __future__ import annotations

import numpy as np

from .config import Config
from .ranges import RangeMask, build_range, circle_range

# Direction enum (reference: src/gridworld/grid_def.h:15)
EAST, SOUTH, WEST, NORTH = 0, 1, 2, 3

# Event / last-op codes (reference: src/gridworld/grid_def.h:17-23)
OP_AND, OP_OR, OP_NOT = 0, 1, 2
OP_KILL, OP_AT, OP_IN, OP_COLLIDE, OP_ATTACK, OP_DIE = 3, 4, 5, 6, 7, 8
OP_IN_A_LINE, OP_ALIGN = 9, 10
OP_NULL = 11


class AgentTypeSpec:
    """Compiled agent type: scalar attributes + range/action tables.

    Defaults and derived quantities replicate the reference
    (src/gridworld/AgentType.cc:30-123); user-supplied view/attack offsets are
    overwritten by body-derived values exactly like the reference does
    (AgentType.cc:106-108).
    """

    _INT_KEYS = {"width", "length", "speak_ability"}
    _BOOL_KEYS = {"attack_in_group", "can_absorb"}
    _FLOAT_KEYS = {
        "speed", "hp", "view_radius", "view_angle", "attack_radius",
        "attack_angle", "hear_radius", "speak_radius", "damage", "trace",
        "eat_ability", "step_recover", "kill_supply", "food_supply",
        "step_reward", "kill_reward", "dead_penalty", "attack_penalty",
        "view_x_offset", "view_y_offset", "att_x_offset", "att_y_offset",
        "turn_x_offset", "turn_y_offset",
    }

    def __init__(self, name: str, attr: dict, turn_mode: bool):
        self.name = name
        # defaults (reference: AgentType.cc:33-48)
        self.width = 1
        self.length = 1
        self.speed = 1.0
        self.hp = 1.0
        self.view_radius = 1.0
        self.view_angle = 360.0
        self.attack_radius = 0.0
        self.attack_angle = 0.0
        self.hear_radius = 0.0
        self.speak_radius = 0.0
        self.speak_ability = 0
        self.damage = 0.0
        self.trace = 0.0
        self.eat_ability = 0.0
        self.step_recover = 0.0
        self.kill_supply = 0.0
        self.food_supply = 0.0
        self.attack_in_group = False
        self.can_absorb = False
        self.step_reward = 0.0
        self.kill_reward = 0.0
        self.dead_penalty = 0.0
        self.attack_penalty = 0.0

        attr = dict(attr)
        # view_range/attack_range DSL objects expand to radius+angle
        # (reference: python/magent/gridworld.py:69-80)
        if "view_range" in attr:
            rng = attr.pop("view_range")
            attr["view_radius"] = rng.radius
            attr["view_angle"] = rng.angle
        if "attack_range" in attr:
            rng = attr.pop("attack_range")
            attr["attack_radius"] = rng.radius
            attr["attack_angle"] = rng.angle

        for key, value in attr.items():
            if key in self._INT_KEYS:
                setattr(self, key, int(float(value) + 0.5))
            elif key in self._BOOL_KEYS:
                setattr(self, key, bool(int(float(value) + 0.5)))
            elif key in self._FLOAT_KEYS:
                setattr(self, key, float(value))
            else:
                raise ValueError("invalid agent config key: %s" % key)

        # ranges (reference: AgentType.cc:85-105); parity follows body width
        parity = self.width % 2
        self.view_range: RangeMask = build_range(self.view_radius, self.view_angle, parity)
        self.attack_range: RangeMask = build_range(
            self.attack_radius, self.attack_angle, parity, inner=self.width / 2.0
        )
        self.move_range: RangeMask = circle_range(self.speed, 0.0, 1)

        # eye offsets (reference: AgentType.cc:106-108) — overwrite user values
        self.view_x_offset = self.width // 2
        self.view_y_offset = self.length // 2
        self.att_x_offset = self.width // 2
        self.att_y_offset = self.length // 2
        self.turn_x_offset = 0
        self.turn_y_offset = 0

        # action space layout [move | turn | attack] (reference: AgentType.cc:110-122)
        self.move_base = 0
        self.turn_base = self.move_range.count
        self.attack_base = self.turn_base + (2 if turn_mode else 0)
        self.n_action = self.attack_base + self.attack_range.count

    def view2attack(self) -> np.ndarray:
        """Map view-window cells to attack action ids, -1 if not attackable
        (reference: GridWorld.cc:853-870)."""
        vh, vw = self.view_range.height, self.view_range.width
        ret = np.full((vh, vw), -1, dtype=np.int32)
        x1, y1 = self.view_range.x1, self.view_range.y1
        for i in range(self.attack_range.count):
            dx, dy = self.attack_range.num2delta(i)
            ret[dy - y1, dx - x1] = i
        return ret


class GroupSpec:
    def __init__(self, group_id: int, type_spec: AgentTypeSpec, cap: int, offset: int):
        self.group_id = group_id
        self.type = type_spec
        self.cap = cap
        self.offset = offset


class GameSpec:
    """Fully compiled static game description.

    Hash/eq are identity-based: a spec is created once per environment and
    jitted functions are cached per spec instance.
    """

    def __init__(self, config: Config, caps):
        cd = config.config_dict
        self.width = int(cd.get("map_width", 100))
        self.height = int(cd.get("map_height", 100))
        self.food_mode = bool(cd.get("food_mode", False))
        self.turn_mode = bool(cd.get("turn_mode", False))
        self.minimap_mode = bool(cd.get("minimap_mode", False))
        self.goal_mode = bool(cd.get("goal_mode", False))
        self.embedding_size = int(cd.get("embedding_size", 0))
        self.seed = int(cd.get("seed", 0))

        # compile agent types
        self.types = {
            name: AgentTypeSpec(name, attr, self.turn_mode)
            for name, attr in config.agent_type_dict.items()
        }

        # groups
        if isinstance(caps, int):
            caps = [caps] * len(config.groups)
        assert len(caps) == len(config.groups)
        self.groups = []
        offset = 0
        for gid, (type_name, cap) in enumerate(zip(config.groups, caps)):
            self.groups.append(GroupSpec(gid, self.types[type_name], int(cap), offset))
            offset += int(cap)
        self.n_agents_cap = offset
        self.n_groups = len(self.groups)

        # channel layout (reference: GridWorld.cc:915-924)
        self.channel_base = 1 + (1 if self.food_mode else 0)
        self.channel_scale = 2 + (1 if self.minimap_mode else 0)
        self.n_channel = self.channel_base + self.n_groups * self.channel_scale

        # raw reward rules (compiled lazily by core.rules)
        self.reward_rules = list(config.reward_rules)
        self._compiled_rules = None

        self._build_tables()

    # -- channel helpers ----------------------------------------------------
    def group2channel(self, group: int) -> int:
        return self.channel_base + group * self.channel_scale

    def channel_perm(self, observer_group: int) -> np.ndarray:
        """Per-observer-group channel permutation making the layout symmetric
        (reference: GridWorld.cc:897-913 + hp/minimap offsets)."""
        perm = np.arange(self.n_channel, dtype=np.int32)
        for gg in range(self.n_groups):
            orig = self.group2channel(gg)
            new = self.channel_base + ((gg - observer_group) % self.n_groups) * self.channel_scale
            perm[orig] = new
            perm[orig + 1] = new + 1
            if self.minimap_mode:
                perm[orig + 2] = new + 2
        return perm

    def feature_size(self, group: int) -> int:
        """[embedding | last_action one-hot | last_reward (| x, y)]
        (reference: GridWorld.cc:926-934)."""
        n = self.embedding_size + self.groups[group].type.n_action + 1
        if self.goal_mode:
            n += 2
        if self.minimap_mode:
            n += 2
        return n

    def view_space(self, group: int):
        t = self.groups[group].type
        return (t.view_range.height, t.view_range.width, self.n_channel)

    def action_space(self, group: int):
        return (self.groups[group].type.n_action,)

    # -- static device tables ------------------------------------------------
    def _build_tables(self):
        G = self.n_groups
        A = self.n_agents_cap

        group_of_slot = np.zeros(A, dtype=np.int32)
        slot_in_group = np.zeros(A, dtype=np.int32)
        for g in self.groups:
            group_of_slot[g.offset : g.offset + g.cap] = g.group_id
            slot_in_group[g.offset : g.offset + g.cap] = np.arange(g.cap)
        self.group_of_slot = group_of_slot
        self.slot_in_group = slot_in_group
        self.group_offsets = np.asarray([g.offset for g in self.groups], dtype=np.int32)
        self.group_caps = np.asarray([g.cap for g in self.groups], dtype=np.int32)

        def per_group(fn, dtype):
            return np.asarray([fn(g.type) for g in self.groups], dtype=dtype)

        self.g_hp_max = per_group(lambda t: t.hp, np.float32)
        self.g_damage = per_group(lambda t: t.damage, np.float32)
        self.g_step_recover = per_group(lambda t: t.step_recover, np.float32)
        self.g_kill_supply = per_group(lambda t: t.kill_supply, np.float32)
        self.g_food_supply = per_group(lambda t: t.food_supply, np.float32)
        self.g_eat_ability = per_group(lambda t: t.eat_ability, np.float32)
        self.g_step_reward = per_group(lambda t: t.step_reward, np.float32)
        self.g_kill_reward = per_group(lambda t: t.kill_reward, np.float32)
        self.g_dead_penalty = per_group(lambda t: t.dead_penalty, np.float32)
        self.g_attack_penalty = per_group(lambda t: t.attack_penalty, np.float32)
        self.g_attack_in_group = per_group(lambda t: t.attack_in_group, np.bool_)
        self.g_can_absorb = per_group(lambda t: t.can_absorb, np.bool_)
        self.g_width = per_group(lambda t: t.width, np.int32)
        self.g_length = per_group(lambda t: t.length, np.int32)
        self.g_turn_base = per_group(lambda t: t.turn_base, np.int32)
        self.g_attack_base = per_group(lambda t: t.attack_base, np.int32)
        self.g_n_action = per_group(lambda t: t.n_action, np.int32)

        self.max_body_w = int(max(max(t.width, t.length) for t in (g.type for g in self.groups)))
        self.max_move = int(max(g.type.move_range.count for g in self.groups))
        self.max_attack = int(max(max(g.type.attack_range.count, 1) for g in self.groups))

        # padded per-group delta tables; invalid entries produce no-ops
        move_dx = np.zeros((G, self.max_move), dtype=np.int32)
        move_dy = np.zeros((G, self.max_move), dtype=np.int32)
        att_dx = np.zeros((G, self.max_attack), dtype=np.int32)
        att_dy = np.zeros((G, self.max_attack), dtype=np.int32)
        for g in self.groups:
            t = g.type
            mc = t.move_range.count
            move_dx[g.group_id, :mc] = t.move_range.dx
            move_dy[g.group_id, :mc] = t.move_range.dy
            ac = t.attack_range.count
            att_dx[g.group_id, :ac] = t.attack_range.dx
            att_dy[g.group_id, :ac] = t.attack_range.dy
        self.g_move_dx, self.g_move_dy = move_dx, move_dy
        self.g_att_dx, self.g_att_dy = att_dx, att_dy

        self.g_view_x_offset = per_group(lambda t: t.view_x_offset, np.int32)
        self.g_view_y_offset = per_group(lambda t: t.view_y_offset, np.int32)
        self.g_att_x_offset = per_group(lambda t: t.att_x_offset, np.int32)
        self.g_att_y_offset = per_group(lambda t: t.att_y_offset, np.int32)

        # per-SLOT constants: group_of_slot is static, so every per-group
        # scalar becomes a compile-time [A] array — runtime gathers from
        # tiny per-group tables are a measured TPU hotspot (~0.3ms each)
        gof = self.group_of_slot
        for name in ("hp_max", "damage", "step_recover", "kill_supply",
                     "food_supply", "eat_ability", "step_reward",
                     "kill_reward", "dead_penalty", "attack_penalty",
                     "attack_in_group", "can_absorb", "width", "length",
                     "turn_base", "attack_base", "n_action",
                     "att_x_offset", "att_y_offset"):
            setattr(self, "s_" + name, getattr(self, "g_" + name)[gof])
        self.s_move_dx = self.g_move_dx[gof]  # [A, max_move]
        self.s_move_dy = self.g_move_dy[gof]
        self.s_att_dx = self.g_att_dx[gof]  # [A, max_attack]
        self.s_att_dy = self.g_att_dy[gof]

    def compiled_rules(self):
        if self._compiled_rules is None:
            from .core import rules as _rules

            self._compiled_rules = _rules.compile_rules(self)
        return self._compiled_rules


def compile_spec(config: Config, caps) -> GameSpec:
    return GameSpec(config, caps)
