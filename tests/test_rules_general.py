"""Property test for the general reward-rule compiler.

Random event ASTs over random micro-worlds: the vectorized rule plans
(``magent_tpu.core.rules``) must pay exactly the same rewards as the
reference-order DFS (``magent_tpu.core.seq_engine``, itself validated
bit-exact against the reference C++ engine by tests/test_reference_parity.py).
Reference semantics: src/gridworld/RewardEngine.cc:216-443.
"""

import os
import random

import numpy as np
import jax.numpy as jnp
import pytest

import magent_tpu as magent
from magent_tpu import spec as speclib
from magent_tpu.config import AgentSymbol, EventNode
from magent_tpu.core import seq_engine
from magent_tpu.core.state import State
from magent_tpu.spec import (OP_ALIGN, OP_AND, OP_AT, OP_ATTACK, OP_COLLIDE,
                             OP_DIE, OP_IN, OP_IN_A_LINE, OP_KILL, OP_NOT,
                             OP_NULL, OP_OR)

CAPS = [5, 6]
MAP = 12


def _base_config():
    gw = magent.gridworld
    cfg = gw.Config()
    cfg.set({"map_width": MAP, "map_height": MAP})
    t = cfg.register_agent_type(
        "t", {"width": 1, "length": 1, "hp": 5, "speed": 1,
              "view_range": gw.CircleRange(2),
              "attack_range": gw.CircleRange(1), "damage": 1})
    cfg.add_group(t)
    cfg.add_group(t)
    return cfg


def _random_symbol(rng, pool):
    if pool and rng.random() < 0.55:
        return rng.choice(pool)
    group = rng.randrange(2)
    index = rng.choice(["any", "any", "all", 0, 1])
    return AgentSymbol(group, index)


def _random_leaf(rng, pool):
    op = rng.choice([OP_ATTACK, OP_KILL, OP_COLLIDE, OP_AT, OP_IN, OP_DIE,
                     OP_ALIGN, OP_IN_A_LINE])
    sub = _random_symbol(rng, pool)
    if op in (OP_ATTACK, OP_KILL, OP_COLLIDE):
        obj = _random_symbol(rng, pool)
        tries = 0
        while obj.is_all() or obj is sub:
            obj = _random_symbol(rng, pool)
            tries += 1
            if tries > 20:
                obj = AgentSymbol(rng.randrange(2), "any")
        node = EventNode()
        node.op = op
        node.inputs = [sub, obj]
        return node
    if op == OP_ALIGN:
        while sub.is_all():
            sub = _random_symbol(rng, pool)
    if op == OP_IN_A_LINE and not sub.is_all():
        # the reference asserts is_all() for in_a_line subjects
        sub = AgentSymbol(rng.randrange(2), "all")
    node = EventNode()
    node.op = op
    if op == OP_AT:
        node.inputs = [sub, rng.randrange(MAP), rng.randrange(MAP)]
    elif op == OP_IN:
        x1, x2 = sorted(rng.sample(range(MAP), 2))
        y1, y2 = sorted(rng.sample(range(MAP), 2))
        node.inputs = [sub, x1, y1, x2, y2]
    else:
        node.inputs = [sub]
    return node


def _random_ast(rng, depth, pool):
    if depth == 0 or rng.random() < 0.45:
        return _random_leaf(rng, pool)
    op = rng.choice([OP_AND, OP_AND, OP_OR, OP_NOT])
    node = EventNode()
    node.op = op
    if op == OP_NOT:
        node.inputs = [_random_ast(rng, depth - 1, pool)]
    else:
        node.inputs = [_random_ast(rng, depth - 1, pool),
                       _random_ast(rng, depth - 1, pool)]
    return node


def _collect_syms(node, out):
    for item in node.inputs:
        if isinstance(item, EventNode):
            _collect_syms(item, out)
        elif isinstance(item, AgentSymbol) and item not in out:
            out.append(item)


def _random_state(rng, spec):
    A = spec.n_agents_cap
    x = np.array([rng.randrange(1, MAP - 1) for _ in range(A)], np.int32)
    y = np.array([rng.randrange(1, MAP - 1) for _ in range(A)], np.int32)
    # active is always a per-group prefix in real states: the stateful engine
    # compacts at clear_dead, the vectorized path never clears slots
    active = np.zeros(A, bool)
    for g in spec.groups:
        active[g.offset : g.offset + rng.randrange(0, g.cap + 1)] = True
    dead = np.array([rng.random() < 0.2 for _ in range(A)], bool) & active
    last_op = np.array(
        [rng.choice([OP_NULL, OP_ATTACK, OP_KILL, OP_COLLIDE])
         for _ in range(A)], np.int32)
    # op_obj always references an agent that exists this step (the engine
    # only ever records live targets)
    live = [k for k in range(A) if active[k]]
    op_obj = np.array(
        [rng.choice([-1] + live) for _ in range(A)], np.int32)
    op_obj = np.where(last_op == OP_NULL, -1, op_obj)
    return dict(x=x, y=y, active=active, dead=dead, last_op=last_op,
                op_obj=op_obj)


def _eval_seq(spec, S0):
    eng = seq_engine.SequentialEngine(spec)
    S = dict(
        x=S0["x"].copy(), y=S0["y"].copy(),
        active=S0["active"].copy(), dead=S0["dead"].copy(),
        last_op=S0["last_op"].copy(), op_obj=S0["op_obj"].copy(),
        next_reward=np.zeros(spec.n_agents_cap, np.float32),
        group_reward=np.zeros(spec.n_groups, np.float32),
        dir=np.zeros(spec.n_agents_cap, np.int32),
        hp=np.ones(spec.n_agents_cap, np.float32),
    )
    eng._calc_reward(S)
    return S["next_reward"], S["group_reward"]


def _eval_fast(spec, S0):
    A = spec.n_agents_cap
    zf = jnp.zeros(A, jnp.float32)
    zi = jnp.zeros(A, jnp.int32)
    state = State(
        cell_slot=jnp.full((MAP, MAP), -1, jnp.int32),
        cell_wall=jnp.zeros((MAP, MAP), bool),
        cell_food=jnp.zeros((MAP, MAP), jnp.float32),
        x=jnp.asarray(S0["x"]), y=jnp.asarray(S0["y"]),
        dir=zi, hp=jnp.ones(A, jnp.float32),
        active=jnp.asarray(S0["active"]), dead=jnp.asarray(S0["dead"]),
        absorbed=jnp.zeros(A, bool), id=zi,
        last_action=zi, next_reward=zf, last_reward=zf,
        last_op=jnp.asarray(S0["last_op"]), op_obj=jnp.asarray(S0["op_obj"]),
        group_reward=jnp.zeros(spec.n_groups, jnp.float32),
        n_in_group=jnp.zeros(spec.n_groups, jnp.int32),
        lcg=jnp.asarray(1, jnp.uint32),
        key=jnp.zeros(2, jnp.uint32), done=jnp.asarray(False),
        id_counter=jnp.asarray(A, jnp.int32), step_ct=jnp.asarray(0, jnp.int32),
    )
    nr = zf
    gr = jnp.zeros(spec.n_groups, jnp.float32)
    for rule in spec.compiled_rules():
        nr, gr, _ = rule.apply(spec, state, nr, gr)
    return np.asarray(nr), np.asarray(gr)


def _one_case(seed, force_general, caps=None):
    caps = CAPS if caps is None else caps
    rng = random.Random(seed)
    cfg = _base_config()
    pool = []
    n_rules = rng.randrange(1, 3)
    for _ in range(n_rules):
        ast = _random_ast(rng, rng.randrange(0, 3), pool)
        syms = []
        _collect_syms(ast, syms)
        pool = list(dict.fromkeys(pool + syms))
        receivers, values = [], []
        for _ in range(rng.randrange(1, 3)):
            receivers.append(rng.choice(syms))
            values.append(round(rng.uniform(-2, 2), 2))
        try:
            cfg.add_reward_rule(
                ast, receiver=receivers, value=values,
                terminal=rng.random() < 0.2)
        except TypeError:
            cfg.add_reward_rule(ast, receiver=receivers, value=values)

    old = os.environ.get("MAGENT_RULES")
    try:
        if force_general:
            os.environ["MAGENT_RULES"] = "general"
        elif "MAGENT_RULES" in os.environ:
            del os.environ["MAGENT_RULES"]
        try:
            spec = speclib.compile_spec(cfg, caps)
            plans = spec.compiled_rules()
        except NotImplementedError:
            return None  # receiver shapes without defined semantics
        except ValueError:
            return None  # shapes the reference itself asserts on
        S0 = _random_state(rng, spec)
        nr_f, gr_f = _eval_fast(spec, S0)
        nr_s, gr_s = _eval_seq(spec, S0)
        np.testing.assert_allclose(nr_f, nr_s, atol=2e-4, err_msg=f"seed {seed}")
        np.testing.assert_allclose(gr_f, gr_s, atol=2e-4, err_msg=f"seed {seed}")
        return True
    finally:
        if old is None:
            os.environ.pop("MAGENT_RULES", None)
        else:
            os.environ["MAGENT_RULES"] = old


@pytest.mark.parametrize("force_general", [True, False])
def test_random_rules_match_sequential(force_general):
    ran = 0
    for seed in range(120):
        if _one_case(seed, force_general):
            ran += 1
    assert ran > 60, f"only {ran} cases were evaluable"


def test_chunked_join_matches_sequential(monkeypatch):
    """Joins larger than MAX_TENSOR take the lax.scan block path
    (rules.GeneralRule.eval_block): shrink the cap so EVERY multi-axis join
    chunks (incl. ragged tails) and re-run the property sweep against the
    reference-order DFS.  Caps [5,7]: the LAST group's cap is odd, so its
    ragged tail block runs past n_agents_cap — the shape that used to trip
    dynamic_slice start-clamping in axis_take (ADVICE r3 high)."""
    from magent_tpu.core.rules import GeneralRule

    monkeypatch.setattr(GeneralRule, "MAX_TENSOR", 8)
    ran = 0
    for seed in range(60):
        if _one_case(seed, True, caps=[5, 7]):
            ran += 1
    assert ran > 30, f"only {ran} cases were evaluable"


def test_chunked_ragged_tail_on_last_group(monkeypatch):
    """Deterministic regression for the axis_take clamping bug: a
    two-'any'-axis rule with caps [5,7] under MAX_TENSOR=8 chunks group 1's
    axis into blocks of 2; the last block (group start 6) slices slots
    [11,12) of a 12-slot array, which lax.dynamic_slice clamps to [10,12) —
    shifting the block so slot 11 reads slot 10's active/op_obj.  With slot
    10 active and slot 11 inactive the buggy fast path paid the inactive
    slot."""
    from magent_tpu.core.rules import GeneralRule

    monkeypatch.setattr(GeneralRule, "MAX_TENSOR", 8)
    monkeypatch.setenv("MAGENT_RULES", "general")
    cfg = _base_config()
    a0 = AgentSymbol(0, "any")
    a1 = AgentSymbol(1, "any")
    n1 = EventNode(); n1.op = OP_IN; n1.inputs = [a0, 0, 0, MAP - 1, MAP - 1]
    n2 = EventNode(); n2.op = OP_IN; n2.inputs = [a1, 0, 0, MAP - 1, MAP - 1]
    root = EventNode(); root.op = OP_AND; root.inputs = [n1, n2]
    cfg.add_reward_rule(root, receiver=[a1], value=[-2.5])
    spec = speclib.compile_spec(cfg, [5, 7])
    rule = spec.compiled_rules()[0]
    assert type(rule).__name__ == "GeneralRule" and min(rule.chunk_sizes) >= 1

    rng = random.Random(0)
    S0 = _random_state(rng, spec)
    S0["active"][:] = False
    S0["active"][0] = True        # group 0: one live agent
    S0["active"][5:11] = True     # group 1: 6/7 live — slot 11 INACTIVE
    S0["dead"][:] = False
    nr_f, gr_f = _eval_fast(spec, S0)
    nr_s, gr_s = _eval_seq(spec, S0)
    np.testing.assert_allclose(nr_f, nr_s, atol=2e-4)
    np.testing.assert_allclose(gr_f, gr_s, atol=2e-4)
    assert nr_s[11] == 0.0 and nr_s[10] == -2.5


@pytest.mark.parametrize("max_tensor", [None, 8])
def test_four_any_axes(monkeypatch, max_tensor):
    """Rules with >3 'any' symbols used to raise NotImplementedError; the
    chunked join handles any rank (dense when it fits, scanned blocks when
    forced small)."""
    from magent_tpu.core.rules import GeneralRule

    if max_tensor is not None:
        monkeypatch.setattr(GeneralRule, "MAX_TENSOR", max_tensor)
    cfg = _base_config()
    syms = [AgentSymbol(0, "any"), AgentSymbol(1, "any"),
            AgentSymbol(0, "any"), AgentSymbol(1, "any")]
    leaves = []
    # IN bounds are strict, so every box must span >=3 to be non-empty;
    # overlapping-but-distinct boxes keep the conjunction satisfiable while
    # still exercising per-axis predicates
    boxes = [(0, 0, MAP - 1, MAP - 1), (0, 0, MAP - 1, MAP - 1),
             (0, 0, 8, 8), (2, 2, MAP - 1, MAP - 1)]
    for s, box in zip(syms, boxes):
        node = EventNode()
        node.op = OP_IN
        node.inputs = [s, *box]
        leaves.append(node)
    n1 = EventNode(); n1.op = OP_AND; n1.inputs = leaves[:2]
    n2 = EventNode(); n2.op = OP_AND; n2.inputs = leaves[2:]
    root = EventNode(); root.op = OP_AND; root.inputs = [n1, n2]
    cfg.add_reward_rule(root, receiver=[syms[0], syms[3]],
                        value=[0.5, -0.25])
    spec = speclib.compile_spec(cfg, CAPS)
    assert spec.compiled_rules()  # must compile, not raise
    fired = 0
    for seed in range(8):
        srng = random.Random(100 + seed)
        S0 = _random_state(srng, spec)
        # exclusivity needs >=2 DISTINCT live agents per group to bind the
        # four axes at once; random prefixes are often too sparse
        S0["active"][:] = True
        nr_f, gr_f = _eval_fast(spec, S0)
        nr_s, gr_s = _eval_seq(spec, S0)
        np.testing.assert_allclose(nr_f, nr_s, atol=2e-4,
                                   err_msg=f"seed {seed}")
        np.testing.assert_allclose(gr_f, gr_s, atol=2e-4)
        fired += int(np.any(nr_s != 0))
    assert fired, "the 4-axis rule never fired; widen the IN boxes"


def test_fixed_receiver_outside_event_rejected():
    """A fixed-index receiver that is not bound by the event has no defined
    semantics (the reference would dereference an unbound entity pointer,
    RewardEngine.cc:387): every path must reject it at compile, not route
    it to a plan that silently pays once per step (rules.py recv_ok)."""
    gw = magent.gridworld
    cfg = _base_config()
    a = AgentSymbol(0, "any")
    b = AgentSymbol(1, "any")
    node = EventNode()
    node.op = OP_ATTACK
    node.inputs = [a, b]
    cfg.add_reward_rule(node, receiver=AgentSymbol(1, 0), value=1.0)
    spec = speclib.compile_spec(cfg, CAPS)
    with pytest.raises(NotImplementedError, match="receiver"):
        spec.compiled_rules()
