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

    def __init__(self):
        self.op = None
        self.predicate = None
        self.inputs = []

    def __call__(self, subject, predicate, *args):
        node = EventNode()
        node.predicate = predicate
        if predicate == 'kill':
            node.op = EventNode.OP_KILL
            node.inputs = [subject, args[0]]
        elif predicate == 'at':
            node.op = EventNode.OP_AT
            coor = args[0]
            node.inputs = [subject, coor[0], coor[1]]
        elif predicate == 'in':
            node.op = EventNode.OP_IN
            coor = args[0]
            x1, y1 = min(coor[0][0], coor[1][0]), min(coor[0][1], coor[1][1])
            x2, y2 = max(coor[0][0], coor[1][0]), max(coor[0][1], coor[1][1])
            node.inputs = [subject, x1, y1, x2, y2]
        elif predicate == 'attack':
            node.op = EventNode.OP_ATTACK
            node.inputs = [subject, args[0]]
        elif predicate == 'collide':
            node.op = EventNode.OP_COLLIDE
            node.inputs = [subject, args[0]]
        elif predicate == 'die':
            node.op = EventNode.OP_DIE
            node.inputs = [subject]
        elif predicate == 'in_a_line':
            node.op = EventNode.OP_IN_A_LINE
            node.inputs = [subject]
        elif predicate == 'align':
            node.op = EventNode.OP_ALIGN
            node.inputs = [subject]
        else:
            raise Exception("invalid predicate of event " + predicate)
        return node

    def __and__(self, other):
        node = EventNode()
        node.op = EventNode.OP_AND
        node.inputs = [self, other]
        return node

    def __or__(self, other):
        node = EventNode()
        node.op = EventNode.OP_OR
        node.inputs = [self, other]
        return node

    def __invert__(self):
        node = EventNode()
        node.op = EventNode.OP_NOT
        node.inputs = [self]
        return node


Event = EventNode()


class AgentSymbol:
    """Symbol representing agent(s) of a group in a reward rule.

    index: int for a deterministic agent index, 'any' (-1) or 'all' (-2)
    (reference: python/magent/gridworld.py:654-675).
    """

    def __init__(self, group, index):
        self.group = group if group is not None else -1
        if index == 'any':
            self.index = -1
        elif index == 'all':
            self.index = -2
        else:
            assert isinstance(index, int), "index must be a deterministic int"
            self.index = index

    def is_any(self):
        return self.index == -1

    def is_all(self):
        return self.index == -2

    def __str__(self):
        return 'agent(%d,%d)' % (self.group, self.index)


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
        if not (isinstance(receiver, (tuple, list))):
            assert not isinstance(value, (tuple, list))
            receiver = [receiver]
            value = [value]
        if len(receiver) != len(value):
            raise Exception("the length of receiver and value should be equal")
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
