"""Reward-rule compiler: event ASTs -> batched boolean-mask evaluation.

The reference evaluates reward rules with a DFS over symbol bindings
(reference: src/gridworld/RewardEngine.cc:373-443) where 'any' symbols iterate
every agent of a group, object symbols are inferred from the subject's
``last_op``/``op_obj`` pair (RewardEngine.cc:150-189), and each successful
binding pays the receivers once.

Here each rule is compiled once (at spec build time) into one of a few
vectorized plans; evaluation is pure array ops inside the jitted step:

- :class:`SingleSubjectRule` — one subject symbol, optionally one inferred
  object symbol; leaves are binary events (attack/kill/collide) from subject
  to object and unary predicates (at/in/die) on either; the event tree is
  evaluated per-subject-slot as boolean masks.
- :class:`PairSharedObjectRule` — two 'any' subjects that both infer the same
  object (the double_attack pattern, builtin/config/double_attack.py:36-41);
  binding counts per object turn the quantified pair-DFS into degree counting.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..config import AgentSymbol, EventNode
from ..spec import (OP_AND, OP_AT, OP_ATTACK, OP_COLLIDE, OP_DIE, OP_IN,
                    OP_IN_A_LINE, OP_KILL, OP_NOT, OP_OR)

BINARY_OPS = (OP_KILL, OP_COLLIDE, OP_ATTACK)
UNARY_OPS = (OP_AT, OP_IN, OP_DIE, OP_IN_A_LINE)
LOGIC_OPS = (OP_AND, OP_OR, OP_NOT)


def _collect_symbols(node, out):
    for item in node.inputs:
        if isinstance(item, EventNode):
            _collect_symbols(item, out)
        elif isinstance(item, AgentSymbol):
            if item not in out:
                out.append(item)


def _collect_leaves(node, out):
    if node.op in LOGIC_OPS:
        for item in node.inputs:
            _collect_leaves(item, out)
    else:
        out.append(node)


class _BaseRule:
    def __init__(self, receivers, values, is_terminal):
        self.receivers = receivers
        self.values = values
        self.is_terminal = is_terminal


def _group_slice(spec, group):
    gs = spec.groups[group]
    return gs.offset, gs.cap


def _unary_pred(spec, state, leaf, sym_group):
    """Per-slot predicate for a unary leaf over the whole slot axis.

    AT / IN use strict bounds exactly like the reference
    (RewardEngine.cc:297-335); DIE is the dead flag (RewardEngine.cc:337-351).
    """
    if leaf.op == OP_AT:
        x, y = leaf.inputs[1], leaf.inputs[2]
        return (state.x == x) & (state.y == y)
    if leaf.op == OP_IN:
        x1, y1, x2, y2 = leaf.inputs[1:5]
        return (state.x > x1) & (state.x < x2) & (state.y > y1) & (state.y < y2)
    if leaf.op == OP_DIE:
        return state.dead
    if leaf.op == OP_IN_A_LINE:
        # group-level predicate (subject must be 'all'): the group's agents
        # occupy one contiguous row or column (RewardEngine.cc:262-296);
        # broadcast the group verdict to every slot
        import jax.numpy as jnp

        sym = leaf.inputs[0]
        member = (jnp.asarray(spec.group_of_slot) == sym.group) & state.active
        n = jnp.sum(member.astype(jnp.int32))
        big = 1 << 20
        xs_min = jnp.min(jnp.where(member, state.x, big))
        xs_max = jnp.max(jnp.where(member, state.x, -big))
        ys_min = jnp.min(jnp.where(member, state.y, big))
        ys_max = jnp.max(jnp.where(member, state.y, -big))
        col = (xs_min == xs_max) & (ys_max - ys_min + 1 == n)
        row = (ys_min == ys_max) & (xs_max - xs_min + 1 == n)
        verdict = (n < 2) | col | row
        return jnp.broadcast_to(verdict, state.x.shape)
    raise NotImplementedError("unary op %d" % leaf.op)



def _group_slot_of(spec, idx):
    """(group, slot-in-group) of slot index ``idx`` by arithmetic on the
    contiguous per-group slot ranges — a ``group_of_slot[idx]`` gather costs
    ~0.2ms/step on TPU, boundary compares are free."""
    og = jnp.zeros(idx.shape, jnp.int32)
    base = jnp.zeros(idx.shape, jnp.int32)
    for g in range(1, spec.n_groups):
        off = int(spec.group_offsets[g])
        hit = idx >= off
        og = og + hit.astype(jnp.int32)
        base = jnp.where(hit, off, base)
    return og, idx - base


class SingleSubjectRule(_BaseRule):
    """Rules over one subject symbol with at most one inferred object."""

    def __init__(self, spec, on, subject, obj, receivers, values, is_terminal):
        super().__init__(receivers, values, is_terminal)
        self.on = on
        self.subject = subject
        self.obj = obj

    def apply(self, spec, state, next_reward, group_reward):
        A = spec.n_agents_cap
        g = jnp.asarray(spec.group_of_slot)
        sgroup = self.subject.group
        in_subj = (g == sgroup) & state.active

        obj = self.obj
        if obj is not None:
            # binding: object inferred from subject's op_obj (RewardEngine.cc:405-409)
            oo = state.op_obj
            ok = (oo >= 0) & in_subj
            og_raw, oi = _group_slot_of(spec, jnp.clip(oo, 0, A - 1))
            og = jnp.where(ok, og_raw, -1)
            bind = ok & (og == obj.group)
            if obj.index >= 0:
                bind = bind & (oi == obj.index)
        else:
            bind = in_subj

        def eval_node(node):
            if node.op == OP_AND:
                return eval_node(node.inputs[0]) & eval_node(node.inputs[1])
            if node.op == OP_OR:
                return eval_node(node.inputs[0]) | eval_node(node.inputs[1])
            if node.op == OP_NOT:
                return ~eval_node(node.inputs[0])
            if node.op in BINARY_OPS:
                return state.last_op == node.op  # object identity enforced by bind
            if node.op in UNARY_OPS:
                pred = _unary_pred(spec, state, node, None)
                sym = node.inputs[0]
                if sym is self.subject:
                    return pred
                # predicate on the inferred object: gather at op_obj
                padded = jnp.concatenate([pred, jnp.zeros((1,), bool)])
                return padded[jnp.where(state.op_obj >= 0, state.op_obj, A)]
            raise NotImplementedError("op %d" % node.op)

        mask = bind & eval_node(self.on)

        if self.subject.is_any():
            trig_mask = mask
            n_trig = jnp.sum(trig_mask.astype(jnp.int32))
        elif self.subject.is_all():
            # single trigger if every agent of the group satisfies the event;
            # vacuously true on an empty group for unary events, never
            # triggered on an empty group when an object must be inferred
            # (RewardEngine.cc:415-426, 224-234)
            n_subj = jnp.sum(in_subj.astype(jnp.int32))
            if obj is not None:
                # the object binds from the FIRST member's op_obj and every
                # member must reference THAT object (RewardEngine.cc:224-234)
                off, _ = _group_slice(spec, sgroup)
                obj0 = state.op_obj[off]
                mask = mask & (state.op_obj == obj0)
            all_true = jnp.sum((mask & in_subj).astype(jnp.int32)) == n_subj
            if obj is not None:
                all_true = all_true & (n_subj > 0)
            trig_mask = jnp.zeros(A, bool)
            n_trig = all_true.astype(jnp.int32)
        else:
            off, cap = _group_slice(spec, sgroup)
            sel = jnp.zeros(A, bool).at[off + int(self.subject.index)].set(
                self.subject.index < cap
            )
            trig_mask = mask & sel
            n_trig = jnp.sum(trig_mask.astype(jnp.int32))

        for sym, val in zip(self.receivers, self.values):
            if sym is self.subject and not sym.is_all():
                if self.subject.is_all():
                    raise NotImplementedError
                next_reward = next_reward + jnp.where(trig_mask, val, 0.0)
            elif self.obj is not None and sym is self.obj and not sym.is_all():
                if self.subject.is_all():
                    # trig_mask is empty for 'all' subjects; the object bound
                    # from the first member is paid once on trigger
                    off, _ = _group_slice(spec, sgroup)
                    obj0 = state.op_obj[off]
                    contrib = jnp.zeros(A + 1).at[
                        jnp.where(n_trig > 0, obj0, A)
                    ].add(val)[:A]
                else:
                    contrib = jnp.zeros(A + 1).at[
                        jnp.where(trig_mask, state.op_obj, A)
                    ].add(val)[:A]
                next_reward = next_reward + contrib
            elif sym.is_all():
                group_reward = group_reward.at[sym.group].add(val * n_trig)
            elif sym.index >= 0:
                off, _ = _group_slice(spec, sym.group)
                next_reward = next_reward.at[off + int(sym.index)].add(
                    jnp.where(n_trig > 0, val, 0.0)
                )
            else:
                raise NotImplementedError("receiver symbol not involved in event")

        return next_reward, group_reward, n_trig > 0


class PairSharedObjectRule(_BaseRule):
    """AND of two binary events whose subjects both infer the same object
    (the cooperative double_attack pattern)."""

    def __init__(self, spec, op1, op2, sub1, sub2, obj, receivers, values, is_terminal):
        super().__init__(receivers, values, is_terminal)
        self.op1, self.op2 = op1, op2
        self.sub1, self.sub2 = sub1, sub2
        self.obj = obj

    def _subject_mask(self, spec, state, sym, op):
        A = spec.n_agents_cap
        g = jnp.asarray(spec.group_of_slot)
        m = (g == sym.group) & state.active & (state.last_op == op)
        oo = state.op_obj
        ok = oo >= 0
        og_raw, oi = _group_slot_of(spec, jnp.clip(oo, 0, A - 1))
        og = jnp.where(ok, og_raw, -1)
        m = m & ok & (og == self.obj.group)
        if self.obj.index >= 0:
            m = m & (oi == self.obj.index)
        return m

    def apply(self, spec, state, next_reward, group_reward):
        A = spec.n_agents_cap
        m1 = self._subject_mask(spec, state, self.sub1, self.op1)
        same = (self.sub1.group == self.sub2.group) and (self.op1 == self.op2)
        m2 = m1 if same else self._subject_mask(spec, state, self.sub2, self.op2)

        def degree(m):
            return jnp.zeros(A + 1, jnp.float32).at[
                jnp.where(m, state.op_obj, A)
            ].add(1.0)[:A]

        k1 = degree(m1)
        k2 = k1 if same else degree(m2)

        oc = jnp.clip(state.op_obj, 0, A - 1)
        if same:
            # ordered pairs (a, b), a != b within the same group
            pairs_as_1 = jnp.where(m1, k1[oc] - 1.0, 0.0)
            pairs_as_2 = pairs_as_1
            total_pairs = jnp.sum(pairs_as_1)
        else:
            pairs_as_1 = jnp.where(m1, k2[oc], 0.0)
            pairs_as_2 = jnp.where(m2, k1[oc], 0.0)
            total_pairs = jnp.sum(pairs_as_1)

        for sym, val in zip(self.receivers, self.values):
            if sym is self.sub1:
                next_reward = next_reward + val * pairs_as_1
            elif sym is self.sub2:
                next_reward = next_reward + val * pairs_as_2
            elif sym is self.obj:
                # per_obj is indexed by object slot directly
                per_obj = k1 * (k1 - 1.0) if same else k1 * k2
                next_reward = next_reward + jnp.where(state.active, val * per_obj, 0.0)
            elif sym.is_all():
                group_reward = group_reward.at[sym.group].add(val * total_pairs)
            else:
                raise NotImplementedError("receiver not involved in pair rule")

        return next_reward, group_reward, total_pairs > 0


def compile_rules(spec):
    """Compile all config reward rules into vectorized plans."""
    plans = []
    for on, receivers, values, terminal in spec.reward_rules:
        plans.append(_compile_one(spec, on, receivers, values, terminal))
    return plans


def _compile_one(spec, on, receivers, values, terminal):
    symbols: list[AgentSymbol] = []
    _collect_symbols(on, symbols)
    leaves: list[EventNode] = []
    _collect_leaves(on, leaves)

    binary = [lf for lf in leaves if lf.op in BINARY_OPS]
    subjects = []
    objects = []
    for lf in binary:
        if lf.inputs[0] not in subjects:
            subjects.append(lf.inputs[0])
        if lf.inputs[1] not in objects:
            objects.append(lf.inputs[1])

    # pair pattern: two distinct 'any' subjects, one shared object, AND root
    if (
        len(binary) == 2
        and len(subjects) == 2
        and len(objects) == 1
        and on.op == OP_AND
        and len(leaves) == 2
        and subjects[0].is_any()
        and subjects[1].is_any()
    ):
        return PairSharedObjectRule(
            spec, binary[0].op, binary[1].op,
            binary[0].inputs[0], binary[1].inputs[0], objects[0],
            receivers, values, terminal,
        )

    # single-subject pattern (with optional inferred object)
    if len(subjects) <= 1 and len(objects) <= 1:
        if binary:
            subject = subjects[0]
            obj = objects[0]
        else:
            # unary-only rule: the single symbol is the subject
            syms = symbols
            if len(syms) != 1:
                raise NotImplementedError("multi-symbol unary rule not supported yet")
            subject = syms[0]
            obj = None
        return SingleSubjectRule(spec, on, subject, obj, receivers, values, terminal)

    raise NotImplementedError("unsupported reward rule shape")
