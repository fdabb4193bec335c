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

import jax
import jax.numpy as jnp

from ..config import AgentSymbol, EventNode
from ..spec import (OP_ALIGN, OP_AND, OP_AT, OP_ATTACK, OP_COLLIDE, OP_DIE,
                    OP_IN, OP_IN_A_LINE, OP_KILL, OP_NOT, OP_OR)

BINARY_OPS = (OP_KILL, OP_COLLIDE, OP_ATTACK)
UNARY_OPS = (OP_AT, OP_IN, OP_DIE, OP_IN_A_LINE, OP_ALIGN)
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
    """Rules over one 'any' subject symbol with at most one inferred object
    ('all'/fixed-index subjects route to :class:`GeneralRule`)."""

    def __init__(self, spec, on, subject, obj, receivers, values, is_terminal):
        super().__init__(receivers, values, is_terminal)
        assert subject.is_any(), "compile gate only builds 'any' subjects"
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

        trig_mask = mask
        n_trig = jnp.sum(trig_mask.astype(jnp.int32))

        for sym, val in zip(self.receivers, self.values):
            if sym is self.subject and not sym.is_all():
                next_reward = next_reward + jnp.where(trig_mask, val, 0.0)
            elif self.obj is not None and sym is self.obj and not sym.is_all():
                contrib = jnp.zeros(A + 1).at[
                    jnp.where(trig_mask, state.op_obj, A)
                ].add(val)[:A]
                next_reward = next_reward + contrib
            elif sym.is_all():
                group_reward = group_reward.at[sym.group].add(val * n_trig)
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


def _symbol_order(reward_rules):
    """Reference symbol numbering: first-visit order over all rules'
    event trees then receivers (reference:
    python/magent/gridworld.py:_serialize_event_exp; the C++ side's
    ``related_symbols`` std::set then iterates in that number order because
    symbol pointers live in one contiguous vector)."""
    order: list[AgentSymbol] = []

    def visit(node):
        for item in node.inputs:
            if isinstance(item, EventNode):
                visit(item)
            elif isinstance(item, AgentSymbol):
                if item not in order:
                    order.append(item)

    for on, receivers, _values, _terminal in reward_rules:
        visit(on)
        for r in receivers:
            if r not in order:
                order.append(r)
    return order


def _related_and_infer(node, sym_index):
    """(related symbols sorted by registration number, infer map sub->obj)
    — reference: RewardEngine.cc collect_related_symbol (:71-100)."""
    related = set()
    infer: dict[AgentSymbol, AgentSymbol] = {}

    def walk(n):
        if n.op in (OP_AND, OP_OR):
            walk(n.inputs[0])
            walk(n.inputs[1])
        elif n.op == OP_NOT:
            walk(n.inputs[0])
        elif n.op in BINARY_OPS:
            related.add(n.inputs[0])
            related.add(n.inputs[1])
            infer.setdefault(n.inputs[0], n.inputs[1])  # std::map keeps first
        else:
            related.add(n.inputs[0])

    walk(node)
    return sorted(related, key=sym_index), infer


class GeneralRule(_BaseRule):
    """Exact vectorized lowering of the reference's binding DFS for an
    arbitrary event AST (reference: RewardEngine.cc:373-443, :216-371).

    The DFS enumerates *input symbols* in registration order: symbols that
    can infer an object bind it from their ``op_obj`` (re-binding on every
    level, so a shared object's leaf-time value comes from its LAST
    inferring subject), 'any' symbols iterate their group with
    involved-agent exclusivity, and receivers are paid once per triggering
    binding tuple.  Here each 'any' input symbol becomes a dense tensor
    axis, object bindings become per-axis slot expressions, and the AST
    evaluates to a boolean trigger tensor whose reductions give every
    per-receiver multiplicity.  Joins whose full tensor would exceed
    ``MAX_TENSOR`` (many axes or large groups) are evaluated block-by-block
    under one ``lax.scan`` — no rule shape ever leaves jit.

    Reference quirks replicated exactly:

    - a fixed-index input symbol with no inferable object never recurses, so
      the rule never fires (RewardEngine.cc:432-441);
    - an 'all' symbol as an inferred *object* can never bind
      (``bind_with_check`` index test, RewardEngine.cc:14-23);
    - an 'any' subject with an infer pair requires ``op_obj`` non-null even
      when the leaf could be satisfied otherwise (OR branches);
    - binary leaves with an 'all' subject are vacuously true on empty
      groups (RewardEngine.cc:223-234).
    """

    # per-ENV block cap: the vectorized path vmaps rules over the env
    # batch, so a B-env loop materializes B join blocks (4M f32 = 16MB/env);
    # joins larger than this are evaluated in chunks under one lax.scan
    MAX_TENSOR = 1 << 22

    def __init__(self, spec, on, receivers, values, is_terminal, sym_index):
        super().__init__(receivers, values, is_terminal)
        self.on = on
        related, infer = _related_and_infer(on, sym_index)
        input_symbols, infer_obj = [], []
        added = set()
        for sym in related:  # first pass: infer pairs (RewardEngine.cc:163-176)
            if sym in added:
                continue
            if sym in infer:
                input_symbols.append(sym)
                infer_obj.append(infer[sym])
                added.add(sym)
                added.add(infer[sym])
        for sym in related:  # second pass: remaining symbols become free
            if sym not in added:
                input_symbols.append(sym)
                infer_obj.append(None)
        self.input_symbols = input_symbols
        self.infer_obj = infer_obj

        self.axes = [s for s in input_symbols if s.is_any()]
        # chunked join: each 'any' axis gets a block size; oversized joins
        # (many axes or big groups) are evaluated block-by-block under one
        # lax.scan so ANY rule AST stays inside jit (the reference DFS,
        # RewardEngine.cc:373-443, has no size cliff either).  The common
        # all-fits case remains a single statically-sliced block.
        caps = [spec.groups[s.group].cap for s in self.axes]
        csz = list(caps)

        def _prod(v):
            size = 1
            for c in v:
                size *= c
            return size

        while _prod(csz) > self.MAX_TENSOR:
            j = max(range(len(csz)), key=lambda i: csz[i])
            csz[j] = (csz[j] + 1) // 2
        self.chunk_sizes = csz

        # the reference asserts binary-leaf objects are never groups
        # (RewardEngine.cc:223); fail at compile instead of at runtime
        leaves: list[EventNode] = []
        _collect_leaves(on, leaves)
        for lf in leaves:
            if lf.op in BINARY_OPS and lf.inputs[1].is_all():
                raise ValueError(
                    "the object of attack/kill/collide cannot be a group "
                    "(reference asserts this)")

        # dead-rule quirks (see class docstring)
        self.never_fires = any(
            (not s.is_any()) and (not s.is_all())
            and (o is None or int(s.index) >= spec.groups[s.group].cap)
            for s, o in zip(input_symbols, infer_obj)
        ) or any(o is not None and o.is_all() for o in infer_obj)

        # leaf-time binding source for each inferred object = LAST inferrer
        self.last_inferrer: dict[AgentSymbol, AgentSymbol] = {}
        for s, o in zip(input_symbols, infer_obj):
            if o is not None:
                self.last_inferrer[o] = s

        for sym in receivers:
            bound = (sym in self.axes or sym.is_all()
                     or sym in self.last_inferrer
                     or (sym in input_symbols and not sym.is_any()))
            if not bound:
                raise NotImplementedError(
                    "receiver symbol not involved in the triggering event")

    # ------------------------------------------------------------ evaluation
    def apply(self, spec, state, next_reward, group_reward):
        A = spec.n_agents_cap
        if self.never_fires:
            return next_reward, group_reward, jnp.asarray(False)

        axes = self.axes
        caps = tuple(spec.groups[s.group].cap for s in axes)
        shape = tuple(self.chunk_sizes)  # per-BLOCK tensor shape
        offs = [spec.groups[s.group].offset for s in axes]
        nchunks = [-(-caps[i] // shape[i]) for i in range(len(axes))]
        n_iter = 1
        for nc in nchunks:
            n_iter *= nc

        def first_member_slot(group):
            """Slot of groups[g].get_agents()[0] (first active slot)."""
            off, cap = _group_slice(spec, group)
            act = state.active[off : off + cap]
            return off + jnp.argmax(act), jnp.any(act)

        def binding_global(sym):
            """Slot value for a block-independent bound symbol (inferred by a
            non-'any' symbol, or a fixed input symbol)."""
            t = self.last_inferrer.get(sym)
            if t is not None:
                if t.is_all():
                    first, _ = first_member_slot(t.group)
                    return state.op_obj[first]
                toff, _ = _group_slice(spec, t.group)
                return state.op_obj[toff + int(t.index)]
            soff, _ = _group_slice(spec, sym.group)
            return jnp.asarray(soff + int(sym.index), jnp.int32)

        def members_of(group):
            g = jnp.asarray(spec.group_of_slot)
            return (g == group) & state.active

        # ---- per-slot unary predicates, shared by leaves
        def unary_vec(leaf):
            if leaf.op == OP_ALIGN:
                # same-column + same-row group-mate counts of the subject
                # (the reference's counters are dead code; this matches the
                # sequential engine's documented-intent implementation)
                sym = leaf.inputs[0]
                mem = members_of(sym.group)
                cnt_col = jnp.zeros(spec.width, jnp.int32).at[
                    jnp.where(mem, state.x, spec.width)
                ].add(1, mode="drop")
                cnt_row = jnp.zeros(spec.height, jnp.int32).at[
                    jnp.where(mem, state.y, spec.height)
                ].add(1, mode="drop")
                align = cnt_col[jnp.clip(state.x, 0, spec.width - 1)] + \
                    cnt_row[jnp.clip(state.y, 0, spec.height - 1)]
                return align > 1
            return _unary_pred(spec, state, leaf, None)

        def eval_block(starts, next_reward):
            """Evaluate one join block (axis i covers group slots
            ``starts[i] .. starts[i]+shape[i]`` within its group) and pay the
            block-local receivers ('any' axes and objects inferred by an
            'any' axis).  ``starts`` of Python ints compile to static slices
            — the all-fits case is exactly the old single-tensor program.
            Returns (next_reward, block trigger count)."""
            static = all(isinstance(s, int) for s in starts)

            def bcast(vec, axis):
                """Lift a per-axis vector (or a scalar for axis None) onto
                the block tensor shape."""
                if axis is None:
                    return jnp.broadcast_to(vec, shape) if shape else vec
                view = [1] * len(shape)
                view[axis] = shape[axis]
                return jnp.broadcast_to(vec.reshape(view), shape)

            def axis_slots(i):
                return offs[i] + starts[i] + jnp.arange(
                    shape[i], dtype=jnp.int32)

            def axis_valid(i):
                return starts[i] + jnp.arange(shape[i]) < caps[i]

            def axis_take(per_slot, i):
                """Block slice per_slot[offs[i]+starts[i] :][: shape[i]].
                The array is padded by the block size first so a ragged tail
                on the LAST group can never trip dynamic_slice's
                start-clamping (which would shift VALID elements onto
                neighboring slots); pad reads are masked by axis_valid
                through T."""
                if static:
                    lo = offs[i] + starts[i]
                    return per_slot[lo : lo + shape[i]]
                padded = jnp.concatenate(
                    [per_slot, jnp.zeros((shape[i],), per_slot.dtype)])
                return jax.lax.dynamic_slice_in_dim(
                    padded, offs[i] + starts[i], shape[i])

            def binding(sym):
                """(axis_or_None, slot-values) for a bound (non-'all')
                symbol."""
                if sym in axes:
                    i = axes.index(sym)
                    return i, axis_slots(i)
                t = self.last_inferrer.get(sym)
                if t is not None and t.is_any():
                    i = axes.index(t)
                    return i, axis_take(state.op_obj, i)
                return None, binding_global(sym)

            def take(per_slot, sym):
                """Gather a per-slot array at a symbol's bound slots."""
                i, slots = binding(sym)
                safe = jnp.clip(slots, 0, A - 1)
                return bcast(per_slot[safe], i)

            def eval_node(node):
                if node.op == OP_AND:
                    return eval_node(node.inputs[0]) & eval_node(node.inputs[1])
                if node.op == OP_OR:
                    return eval_node(node.inputs[0]) | eval_node(node.inputs[1])
                if node.op == OP_NOT:
                    return ~eval_node(node.inputs[0])
                if node.op in BINARY_OPS:
                    sub, obj = node.inputs[0], node.inputs[1]
                    oi, ovals = binding(obj)
                    obj_t = bcast(ovals, oi)
                    if sub.is_all():
                        # forall members: last_op==op and op_obj==obj
                        mem = members_of(sub.group)
                        n_mem = jnp.sum(mem.astype(jnp.int32))
                        hit = mem & (state.last_op == node.op)
                        cnt_at = jnp.zeros(A + 1, jnp.int32).at[
                            jnp.where(hit & (state.op_obj >= 0),
                                      state.op_obj, A)
                        ].add(1)[:A]
                        padded = jnp.concatenate(
                            [cnt_at, jnp.zeros(1, jnp.int32)])
                        safe = jnp.where((obj_t >= 0) & (obj_t < A), obj_t, A)
                        return padded[safe] == n_mem  # vacuous True if empty
                    sub_op = take(state.last_op, sub) == node.op
                    sub_obj = take(state.op_obj, sub)
                    return sub_op & (sub_obj == obj_t)
                # unary leaf
                sym = node.inputs[0]
                if node.op == OP_IN_A_LINE or sym.is_all():
                    pred = _unary_pred(spec, state, node, None) \
                        if node.op == OP_IN_A_LINE else unary_vec(node)
                    if node.op == OP_IN_A_LINE:
                        verdict = pred[_group_slice(spec, sym.group)[0]]
                    else:  # forall members (vacuous True when empty)
                        mem = members_of(sym.group)
                        verdict = jnp.all(~mem | pred)
                    return bcast(verdict, None)
                return take(unary_vec(node), sym)

            T = eval_node(self.on)
            if shape:
                T = jnp.broadcast_to(T, shape)
            for i in range(len(axes)):  # mask ragged block tails
                T = T & bcast(axis_valid(i), i)

            # ---- binding masks (DFS-level pruning, applied to every branch)
            def bind_mask(sub, obj):
                """op_obj of `sub` binds `obj`: non-null + group/index check
                (bind_with_check, RewardEngine.cc:14-23)."""
                if sub.is_any():
                    i = axes.index(sub)
                    oo = axis_take(state.op_obj, i)
                    ax = i
                elif sub.is_all():
                    first, nonempty = first_member_slot(sub.group)
                    oo = state.op_obj[first]
                    ax = None
                else:
                    soff, _ = _group_slice(spec, sub.group)
                    oo = state.op_obj[soff + int(sub.index)]
                    ax = None
                ok = oo >= 0
                og, oidx = _group_slot_of(spec, jnp.clip(oo, 0, A - 1))
                ok = ok & (og == obj.group)
                if obj.index >= 0:
                    ok = ok & (oidx == obj.index)
                if sub.is_all():
                    ok = ok & nonempty
                return bcast(ok, ax)

            for sub, obj in zip(self.input_symbols, self.infer_obj):
                if obj is not None:
                    T = T & bind_mask(sub, obj)
                if sub.is_any():
                    i = axes.index(sub)
                    T = T & bcast(axis_take(state.active, i), i)
                elif not sub.is_all():  # fixed: index must be within group
                    soff, cap = _group_slice(spec, sub.group)
                    k = int(sub.index)
                    in_size = (k < cap) and jnp.asarray(True)
                    n_g = jnp.sum(members_of(sub.group).astype(jnp.int32))
                    T = T & bcast((k < n_g) & in_size, None)

            # involved-agent exclusivity between same-group 'any' axes
            for i in range(len(axes)):
                for j in range(i + 1, len(axes)):
                    if axes[i].group == axes[j].group:
                        T = T & (bcast(axis_slots(i), i)
                                 != bcast(axis_slots(j), j))

            Tf = T.astype(jnp.float32)
            n_trig = jnp.sum(Tf)

            def axis_multiplicity(i):
                other = tuple(k for k in range(len(axes)) if k != i)
                return jnp.sum(Tf, axis=other) if other else Tf

            # block-local receivers: per-slot multiplicities live here
            for sym, val in zip(self.receivers, self.values):
                if sym in axes:
                    i = axes.index(sym)
                    m = axis_multiplicity(i)
                    if static and shape[i] == caps[i]:
                        lo = offs[i] + starts[i]
                        next_reward = next_reward.at[
                            lo : lo + shape[i]].add(val * m)
                    else:
                        next_reward = next_reward.at[
                            jnp.where(axis_valid(i), axis_slots(i), A)
                        ].add(val * m, mode="drop")
                elif (sym in self.last_inferrer
                      and self.last_inferrer[sym].is_any()):
                    i = axes.index(self.last_inferrer[sym])
                    m = axis_multiplicity(i)
                    oo = axis_take(state.op_obj, i)
                    next_reward = next_reward.at[
                        jnp.where(m > 0, jnp.clip(oo, 0, A - 1), A)
                    ].add(val * m, mode="drop")
            return next_reward, n_trig

        if n_iter == 1:  # everything fits: one statically-sliced block
            next_reward, n_trig = eval_block([0] * len(axes), next_reward)
        else:  # chunked join: scan the block grid (np.indices of chunk ids)
            import numpy as _onp

            grid = _onp.stack(
                _onp.meshgrid(*[_onp.arange(nc) * c
                                for nc, c in zip(nchunks, shape)],
                              indexing="ij"),
                axis=-1,
            ).reshape(-1, len(axes)).astype(_onp.int32)

            def body(carry, st):
                nr, acc = carry
                nr, nt = eval_block(
                    [st[i] for i in range(len(axes))], nr)
                return (nr, acc + nt), None

            (next_reward, n_trig), _ = jax.lax.scan(
                body, (next_reward, jnp.float32(0.0)), jnp.asarray(grid))

        # ---- block-independent receivers (need the TOTAL trigger count)
        for sym, val in zip(self.receivers, self.values):
            if sym.is_all():
                group_reward = group_reward.at[sym.group].add(val * n_trig)
            elif sym in axes or (sym in self.last_inferrer
                                 and self.last_inferrer[sym].is_any()):
                pass  # paid per block above
            elif sym in self.last_inferrer:
                v = binding_global(sym)
                next_reward = next_reward.at[
                    jnp.where(n_trig > 0, jnp.clip(v, 0, A - 1), A)
                ].add(val * n_trig, mode="drop")
            else:  # fixed input symbol bound to its own slot
                soff, _ = _group_slice(spec, sym.group)
                next_reward = next_reward.at[soff + int(sym.index)].add(
                    val * n_trig)

        return next_reward, group_reward, n_trig > 0


def compile_rules(spec):
    """Compile all config reward rules into vectorized plans."""
    order = _symbol_order(spec.reward_rules)
    plans = []
    for on, receivers, values, terminal in spec.reward_rules:
        plans.append(
            _compile_one(spec, on, receivers, values, terminal, order.index)
        )
    return plans


def _compile_one(spec, on, receivers, values, terminal, sym_index):
    import os

    symbols: list[AgentSymbol] = []
    _collect_symbols(on, symbols)
    leaves: list[EventNode] = []
    _collect_leaves(on, leaves)

    force_general = os.environ.get("MAGENT_RULES") == "general"

    binary = [lf for lf in leaves if lf.op in BINARY_OPS]
    subjects = []
    objects = []
    for lf in binary:
        if lf.inputs[0] not in subjects:
            subjects.append(lf.inputs[0])
        if lf.inputs[1] not in objects:
            objects.append(lf.inputs[1])

    # pair pattern: two distinct 'any' subjects, one shared 'any' object,
    # AND root — the cooperative double_attack shape, lowered to degree
    # counting instead of a dense pair join
    if (
        not force_general
        and len(binary) == 2
        and len(subjects) == 2
        and len(objects) == 1
        and on.op == OP_AND
        and len(leaves) == 2
        and subjects[0].is_any()
        and subjects[1].is_any()
        and objects[0].is_any()
        and objects[0] not in subjects
        and all(r in subjects or r is objects[0] or r.is_all()
                for r in receivers)
    ):
        return PairSharedObjectRule(
            spec, binary[0].op, binary[1].op,
            binary[0].inputs[0], binary[1].inputs[0], objects[0],
            receivers, values, terminal,
        )

    # single-subject pattern (with optional inferred object): per-slot masks
    if not force_general and len(symbols) <= 2 and len(subjects) <= 1 and (
        len(objects) <= 1
    ):
        ok_unary = all(
            lf.inputs[0] is (subjects[0] if subjects else symbols[0])
            or (binary and lf.inputs[0] is objects[0])
            for lf in leaves if lf.op in UNARY_OPS
        )
        no_align = all(lf.op != OP_ALIGN for lf in leaves)
        if binary:
            subject = subjects[0]
            obj = objects[0]
            shape_ok = (obj not in subjects and len(symbols) == 2
                        and not obj.is_all())
        else:
            subject = symbols[0]
            obj = None
            shape_ok = len(symbols) == 1
        # a receiver must be bound by the event (subject/object) or be a
        # whole group; a fixed-index receiver OUTSIDE the event is rejected
        # by every exact path (GeneralRule/seq raise; the reference would
        # dereference an unbound entity, RewardEngine.cc:387) — route it to
        # GeneralRule so the user gets that clear compile-time error
        # instead of silently paying once per step
        recv_ok = all(
            r is subject or (obj is not None and r is obj) or r.is_all()
            for r in receivers
        )
        # 'all' subjects need group-level logic evaluation (NOT/OR over the
        # forall verdict) — the general join handles them; the per-slot plan
        # only serves 'any' subjects
        if shape_ok and ok_unary and no_align and recv_ok \
                and subject.is_any():
            return SingleSubjectRule(
                spec, on, subject, obj, receivers, values, terminal)

    # everything else: the exact general join
    return GeneralRule(spec, on, receivers, values, terminal, sym_index)
