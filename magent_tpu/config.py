"""User-facing configuration DSL.

API-compatible with the reference's ``magent.gridworld`` config surface
(reference: python/magent/gridworld.py:571-800): ``Config``, ``Event``/
``EventNode``, ``AgentSymbol``, ``CircleRange``, ``SectorRange``.

The DSL builds a declarative description (global settings, agent types,
groups, reward rules); :mod:`magent_tpu.spec` compiles it into static tables
the JAX engine closes over.
"""

from __future__ import annotations


class EventNode:
    """AST node of a reward-trigger event expression.

    Op codes match the engine enum (reference: src/gridworld/grid_def.h:17-23)
    and the Python serializer (reference: python/magent/gridworld.py:571-651).
    """

    OP_AND = 0
    OP_OR = 1
    OP_NOT = 2

    OP_KILL = 3
    OP_AT = 4
    OP_IN = 5
    OP_COLLIDE = 6
    OP_ATTACK = 7
    OP_DIE = 8
    OP_IN_A_LINE = 9
    OP_ALIGN = 10

    # predicate name -> (op code, argument shape)
    _PREDICATES = {
        "kill": (OP_KILL, "object"),
        "attack": (OP_ATTACK, "object"),
        "collide": (OP_COLLIDE, "object"),
        "at": (OP_AT, "point"),
        "in": (OP_IN, "rect"),
        "die": (OP_DIE, "none"),
        "in_a_line": (OP_IN_A_LINE, "none"),
        "align": (OP_ALIGN, "none"),
    }

    def __init__(self, op=None, inputs=(), predicate=None):
        self.op = op
        self.predicate = predicate
        self.inputs = list(inputs)

    def __call__(self, subject, predicate, *args):
        """Build a leaf event: ``Event(sym, 'attack', other)``,
        ``Event(sym, 'at', (x, y))``, ``Event(sym, 'in', ((x1,y1),(x2,y2)))``,
        ``Event(sym, 'die')``, ..."""
        try:
            op, shape = self._PREDICATES[predicate]
        except KeyError:
            raise ValueError(
                "unknown event predicate %r (one of %s)"
                % (predicate, sorted(self._PREDICATES)))
        if shape == "object":
            inputs = [subject, args[0]]
        elif shape == "point":
            x, y = args[0]
            inputs = [subject, x, y]
        elif shape == "rect":
            (xa, ya), (xb, yb) = args[0]
            inputs = [subject,
                      min(xa, xb), min(ya, yb), max(xa, xb), max(ya, yb)]
        else:
            inputs = [subject]
        return EventNode(op, inputs, predicate)

    def __and__(self, other):
        return EventNode(EventNode.OP_AND, [self, other])

    def __or__(self, other):
        return EventNode(EventNode.OP_OR, [self, other])

    def __invert__(self):
        return EventNode(EventNode.OP_NOT, [self])


Event = EventNode()


class AgentSymbol:
    """Symbol representing agent(s) of a group in a reward rule.

    index: int for a deterministic agent index, 'any' (-1) or 'all' (-2)
    (reference: python/magent/gridworld.py:654-675).
    """

    _SENTINELS = {"any": -1, "all": -2}

    def __init__(self, group, index):
        self.group = -1 if group is None else group
        if index in self._SENTINELS:
            self.index = self._SENTINELS[index]
        else:
            assert isinstance(index, int), "index must be a deterministic int"
            self.index = index

    def is_any(self):
        return self.index == -1

    def is_all(self):
        return self.index == -2

    def __str__(self):
        tag = {-1: "any", -2: "all"}.get(self.index, self.index)
        return "AgentSymbol(group=%s, index=%s)" % (self.group, tag)


class Config:
    """Configuration of a gridworld game (reference: gridworld.py:678-766)."""

    def __init__(self):
        self.config_dict = {}
        self.agent_type_dict = {}
        self.groups = []
        self.reward_rules = []

    def set(self, args):
        """Set global configuration parameters (dict of key/value)."""
        for key in args:
            self.config_dict[key] = args[key]

    def register_agent_type(self, name, attr):
        """Register an agent type; returns the type name.

        See AgentTypeSpec for available attributes (width, length, speed, hp,
        view_range, attack_range, damage, step_recover, kill_supply,
        step_reward, kill_reward, dead_penalty, attack_penalty, ...).
        """
        if name in self.agent_type_dict:
            raise Exception("type name %s already exists" % name)
        self.agent_type_dict[name] = attr
        return name

    def add_group(self, agent_type):
        """Add a group of the given registered type; returns its handle."""
        no = len(self.groups)
        self.groups.append(agent_type)
        return no

    def add_reward_rule(self, on, receiver, value, terminal=False):
        """Add a reward rule triggered by event expression ``on``.

        A non-deterministic receiver must be one of the agents involved in the
        triggering event.
        """
        if not isinstance(receiver, (tuple, list)):
            assert not isinstance(value, (tuple, list))
            receiver, value = [receiver], [value]
        if len(receiver) != len(value):
            raise ValueError(
                "got %d receivers but %d values" % (len(receiver), len(value)))
        self.reward_rules.append([on, receiver, value, terminal])


class CircleRange:
    """Circular view/attack range of given radius."""

    def __init__(self, radius):
        self.radius = radius
        self.angle = 360

    def __str__(self):
        return 'circle(%g)' % self.radius


class SectorRange:
    """Sector view/attack range; angle must be < 180."""

    def __init__(self, radius, angle):
        self.radius = radius
        self.angle = angle
        if self.angle >= 180:
            raise Exception("the angle of a sector should be smaller than 180 degree")

    def __str__(self):
        return 'sector(%g, %g)' % (self.radius, self.angle)
