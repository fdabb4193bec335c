"""Fused rollout+train step behavior tests (parallel/train.py)."""

import numpy as np
import jax
import jax.numpy as jnp
import optax

from magent_tpu.builtin.config import battle
from magent_tpu.builtin.jax_model.dqn import DQNNet
from magent_tpu.parallel import VecGridWorld, make_dqn_train_step


def _setup(n_envs=4, cap=6, train_minibatch=None):
    venv = VecGridWorld(battle.get_config(20), [cap, cap], n_envs=n_envs)
    spec = venv.spec
    nets = [DQNNet(num_actions=spec.groups[g].type.n_action) for g in range(2)]
    params = []
    for g in range(2):
        vh, vw, C = spec.view_space(g)
        F = spec.feature_size(g)
        p = nets[g].init(jax.random.PRNGKey(g),
                         jnp.zeros((1, vh, vw, C), jnp.float32),
                         jnp.zeros((1, F), jnp.float32))["params"]
        params.append(p)
    params = tuple(params)
    tx = optax.adam(1e-3)
    opts = tuple(tx.init(p) for p in params)
    tgt = jax.tree.map(lambda x: x, params)
    step = jax.jit(make_dqn_train_step(venv, nets, tx, rollout_len=3,
                                       train_minibatch=train_minibatch))
    return venv, params, tgt, opts, step


def test_train_step_minibatch_sampling():
    venv, params, tgt, opts, step = _setup(train_minibatch=32)
    state = venv.reset(jax.random.PRNGKey(0))
    p1, o1, s1, m1 = step(params, tgt, opts, state, jax.random.PRNGKey(1), 0.5)
    loss = np.asarray(m1["loss"])
    assert np.all(np.isfinite(loss))
    moved = jax.tree_util.tree_leaves(
        jax.tree.map(lambda a, b: float(jnp.max(jnp.abs(a - b))), params, p1))
    assert max(moved) > 0.0


def test_train_step_with_dead_agents():
    venv, params, tgt, opts, step = _setup()
    state = venv.reset(jax.random.PRNGKey(0))
    # kill half of group 0 up front (dead but not compacted — the lockstep
    # regime); the boundary mask must come from this state
    dead = np.asarray(state.dead).copy()
    dead[:, :3] = True
    state = state.replace(dead=jnp.asarray(dead))

    p1, o1, s1, m1 = step(params, tgt, opts, state, jax.random.PRNGKey(1), 0.5)
    loss = np.asarray(m1["loss"])
    assert np.all(np.isfinite(loss))
    # params actually moved
    delta = jax.tree.map(lambda a, b: float(jnp.max(jnp.abs(a - b))),
                         params[0], p1[0])
    assert max(jax.tree.leaves(delta)) > 0


def test_train_step_chains():
    venv, params, tgt, opts, step = _setup()
    state = venv.reset(jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(2)
    for k in range(3):
        params, opts, state, metrics = step(
            params, tgt, opts, state, jax.random.fold_in(key, k), 0.5)
    assert np.all(np.isfinite(np.asarray(metrics["loss"])))


# ------------------------------------------------------------- fused A2C/DRQN
from magent_tpu.builtin.jax_model.a2c import A2CNet
from magent_tpu.builtin.jax_model.drqn import DRQNNet
from magent_tpu.parallel import (init_drqn_hiddens, make_a2c_train_step,
                                 make_drqn_train_step)


def _setup_a2c(n_envs=4, cap=6, use_comm=False):
    venv = VecGridWorld(battle.get_config(20), [cap, cap], n_envs=n_envs)
    spec = venv.spec
    nets = [A2CNet(num_actions=spec.groups[g].type.n_action,
                   use_comm=use_comm) for g in range(2)]
    params = []
    for g in range(2):
        vh, vw, C = spec.view_space(g)
        F = spec.feature_size(g)
        p = nets[g].init(jax.random.PRNGKey(g),
                         jnp.zeros((1, vh, vw, C), jnp.float32),
                         jnp.zeros((1, F), jnp.float32))["params"]
        params.append(p)
    params = tuple(params)
    tx = optax.adam(1e-3)
    opts = tuple(tx.init(p) for p in params)
    step = jax.jit(make_a2c_train_step(venv, nets, tx, rollout_len=3))
    return venv, params, opts, step


def test_a2c_train_step_moves_params():
    venv, params, opts, step = _setup_a2c()
    state = venv.reset(jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(1)
    for k in range(2):
        params, opts, state, metrics = step(
            params, opts, state, jax.random.fold_in(key, k))
    assert np.all(np.isfinite(np.asarray(metrics["loss"])))
    assert np.all(np.isfinite(np.asarray(metrics["mean_value"])))


def test_a2c_commnet_fused():
    venv, params, opts, step = _setup_a2c(use_comm=True)
    state = venv.reset(jax.random.PRNGKey(0))
    params, opts, state, metrics = step(params, opts, state,
                                        jax.random.PRNGKey(1))
    assert np.all(np.isfinite(np.asarray(metrics["loss"])))


def test_drqn_train_step_carries_hidden():
    venv = VecGridWorld(battle.get_config(20), [6, 6], n_envs=4)
    spec = venv.spec
    nets = [DRQNNet(num_actions=spec.groups[g].type.n_action)
            for g in range(2)]
    params = []
    for g in range(2):
        vh, vw, C = spec.view_space(g)
        F = spec.feature_size(g)
        p = nets[g].init(jax.random.PRNGKey(g),
                         jnp.zeros((1, nets[g].state_size), jnp.float32),
                         jnp.zeros((1, vh, vw, C), jnp.float32),
                         jnp.zeros((1, F), jnp.float32))["params"]
        params.append(p)
    params = tuple(params)
    tx = optax.adam(1e-3)
    opts = tuple(tx.init(p) for p in params)
    tgt = jax.tree.map(lambda x: x, params)
    hiddens = init_drqn_hiddens(venv, nets)
    step = jax.jit(make_drqn_train_step(venv, nets, tx, rollout_len=3))

    state = venv.reset(jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(1)
    for k in range(2):
        params, opts, state, hiddens, metrics = step(
            params, tgt, opts, state, hiddens, jax.random.fold_in(key, k),
            0.3)
    assert np.all(np.isfinite(np.asarray(metrics["loss"])))
    # hidden state is being carried (nonzero for alive agents)
    h0 = np.asarray(hiddens[0])
    alive = np.asarray(state.active & ~state.dead)[:, :6]
    assert np.any(np.abs(h0[alive]) > 0)


def test_dqn_remat_train_step():
    """Obs-rematerializing DQN trainer: stores compact states, re-renders
    sampled steps' windows in the loss."""
    from magent_tpu.parallel import make_dqn_train_step_remat

    venv, params, tgt, opts, _ = _setup()
    step = jax.jit(make_dqn_train_step_remat(
        venv, [DQNNet(num_actions=venv.spec.groups[g].type.n_action)
               for g in range(2)],
        optax.adam(1e-3), rollout_len=4, sample_steps=2))
    # rebuild nets/params to match the new net instances
    state = venv.reset(jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(1)
    for k in range(2):
        params, opts, state, metrics = step(
            params, tgt, opts, state, jax.random.fold_in(key, k), 0.5)
    assert np.all(np.isfinite(np.asarray(metrics["loss"])))
    moved = jax.tree.map(lambda a, b: float(jnp.max(jnp.abs(a - b))),
                         params[0], tgt[0])
    assert max(jax.tree.leaves(moved)) > 0


def test_drqn_remat_step_matches_plain():
    """unroll_remat only changes what the BPTT backward stores, never the
    math: one train step from identical inputs yields (near-)identical
    losses and updated params."""
    venv = VecGridWorld(battle.get_config(20), [6, 6], n_envs=4)
    spec = venv.spec
    nets = [DRQNNet(num_actions=spec.groups[g].type.n_action, state_size=32)
            for g in range(2)]
    params = []
    for g in range(2):
        vh, vw, C = spec.view_space(g)
        F = spec.feature_size(g)
        params.append(nets[g].init(
            jax.random.PRNGKey(g),
            jnp.zeros((1, 32), jnp.float32),
            jnp.zeros((1, vh, vw, C), jnp.float32),
            jnp.zeros((1, F), jnp.float32))["params"])
    params = tuple(params)
    tx = optax.adam(1e-3)
    opts = tuple(tx.init(p) for p in params)
    tgt = jax.tree.map(lambda x: x, params)
    hiddens = init_drqn_hiddens(venv, nets)
    state = venv.reset(jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(1)

    outs = []
    for remat in (False, True):
        step = jax.jit(make_drqn_train_step(venv, nets, tx, rollout_len=3,
                                            unroll_remat=remat))
        p2, o2, s2, h2, metrics = step(params, tgt, opts, state, hiddens,
                                       key, 0.3)
        outs.append((np.asarray(metrics["loss"]),
                     np.concatenate([np.asarray(l).ravel()
                                     for l in jax.tree.leaves(p2)])))
    np.testing.assert_allclose(outs[0][0], outs[1][0], rtol=1e-5)
    np.testing.assert_allclose(outs[0][1], outs[1][1], rtol=1e-4,
                               atol=1e-6)


def test_eval_q_on_fixed_set():
    """sample_eval_set + make_eval_q (the reference's sample_observation /
    eval-Q methodology, utility.py:115-178, dqn.py:348-356): the set is
    deterministic for a given key, and the Q estimate moves when params
    move."""
    from magent_tpu.parallel import make_eval_q, sample_eval_set

    venv, params, tgt, opts, _ = _setup()
    nets = [DQNNet(num_actions=venv.spec.groups[g].type.n_action)
            for g in range(2)]
    v1, f1 = sample_eval_set(venv, 0, n_steps=3, key=jax.random.PRNGKey(5))
    v2, f2 = sample_eval_set(venv, 0, n_steps=3, key=jax.random.PRNGKey(5))
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
    assert v1.shape[0] == 3 * venv.n_envs * venv.spec.groups[0].cap

    evq = make_eval_q(venv, nets, 0)
    q0 = float(evq(params, v1, f1))
    assert np.isfinite(q0)
    bumped = list(params)
    bumped[0] = jax.tree.map(lambda x: x + 0.05, params[0])
    q1 = float(evq(tuple(bumped), v1, f1))
    assert q0 != q1


def test_drqn_shared_acting_matches_plain():
    """share_acting differentiates through the acting rollout instead of
    re-unrolling the online net over the stored window — same math (the
    acting q/hidden chain IS the unroll chain), so one train step from
    identical inputs must yield matching losses, updated params AND carried
    hiddens; the env trajectory (actions from the same eps-greedy keys)
    must be identical."""
    venv = VecGridWorld(battle.get_config(20), [6, 6], n_envs=4)
    spec = venv.spec
    nets = [DRQNNet(num_actions=spec.groups[g].type.n_action, state_size=32)
            for g in range(2)]
    params = []
    for g in range(2):
        vh, vw, C = spec.view_space(g)
        F = spec.feature_size(g)
        params.append(nets[g].init(
            jax.random.PRNGKey(g),
            jnp.zeros((1, 32), jnp.float32),
            jnp.zeros((1, vh, vw, C), jnp.float32),
            jnp.zeros((1, F), jnp.float32))["params"])
    params = tuple(params)
    tx = optax.adam(1e-3)
    opts = tuple(tx.init(p) for p in params)
    tgt = jax.tree.map(lambda x: x, params)
    hiddens = init_drqn_hiddens(venv, nets)
    state = venv.reset(jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(1)

    outs = []
    for share in (False, True):
        step = jax.jit(make_drqn_train_step(venv, nets, tx, rollout_len=3,
                                            share_acting=share))
        p2, o2, s2, h2, metrics = step(params, tgt, opts, state, hiddens,
                                       key, 0.3)
        outs.append((np.asarray(metrics["loss"]),
                     np.concatenate([np.asarray(l).ravel()
                                     for l in jax.tree.leaves(p2)]),
                     np.asarray(h2[0]),
                     np.asarray(s2.x)))
    np.testing.assert_allclose(outs[0][0], outs[1][0], rtol=1e-5)
    # adam on float-reassociated grads can flip a near-zero update by ~lr
    # on isolated params; 5e-6 absolute still pins the math shared
    np.testing.assert_allclose(outs[0][1], outs[1][1], rtol=1e-4, atol=5e-6)
    np.testing.assert_allclose(outs[0][2], outs[1][2], rtol=1e-4, atol=5e-6)
    np.testing.assert_array_equal(outs[0][3], outs[1][3])


def test_drqn_split_unroll_matches_cell():
    """The fused DRQN loss's split unroll (batched trunk/input projections +
    carry-only scan, parallel/train.py unroll_q) computes exactly what
    stepping the stock DRQNNet per frame computes."""
    spec_shapes = dict(vh=5, vw=5, C=4, F=7)
    T, N = 4, 6
    net = DRQNNet(num_actions=9)
    key = jax.random.PRNGKey(0)
    views = jax.random.uniform(key, (T, N, spec_shapes["vh"],
                                     spec_shapes["vw"], spec_shapes["C"]))
    feats = jax.random.uniform(jax.random.fold_in(key, 1),
                               (T, N, spec_shapes["F"]))
    keep = jax.random.bernoulli(jax.random.fold_in(key, 2), 0.8, (T, N, 1))
    p = net.init(jax.random.fold_in(key, 3),
                 jnp.zeros((1, net.state_size), jnp.float32),
                 views[0, :1], feats[0, :1])["params"]
    h0 = jax.random.normal(jax.random.fold_in(key, 4), (N, net.state_size))

    # reference: step the stock module frame by frame
    def ref_body(h, xs):
        v, f, k = xs
        h2, q = net.apply({"params": p}, h, v, f)
        return jnp.where(k, h2, 0.0), q
    _, q_ref = jax.lax.scan(ref_body, h0, (views, feats, keep))

    # split: batched trunk + input projections, carry-only scan, batched heads
    from magent_tpu.builtin.jax_model.drqn import DRQNTrunk
    x = DRQNTrunk(dtype=net.dtype).apply(
        {"params": p["trunk"]},
        views.reshape((-1,) + views.shape[2:]),
        feats.reshape((-1,) + feats.shape[2:]))
    pg = p["gru"]
    xr, xz, xn = ((x @ pg[k]["kernel"] + pg[k]["bias"]).reshape(
        T, N, net.state_size) for k in ("ir", "iz", "in"))

    def body(h, xs):
        xr, xz, xn, k = xs
        r = jax.nn.sigmoid(xr + h @ pg["hr"]["kernel"])
        z = jax.nn.sigmoid(xz + h @ pg["hz"]["kernel"])
        n = jnp.tanh(xn + r * (h @ pg["hn"]["kernel"] + pg["hn"]["bias"]))
        h2 = (1.0 - z) * n + z * h
        return jnp.where(k, h2, 0.0), h2
    _, outs = jax.lax.scan(body, h0, (xr, xz, xn, keep))
    flat = outs.reshape(-1, net.state_size)
    value = flat @ p["value"]["kernel"] + p["value"]["bias"]
    adv = flat @ p["advantage"]["kernel"]
    q_split = (value + adv - jnp.mean(adv, axis=1, keepdims=True)).reshape(
        T, N, 9)

    np.testing.assert_allclose(np.asarray(q_split), np.asarray(q_ref),
                               atol=1e-5)

    # and the REAL split_unroll (both remat modes) agrees with the cell too
    from magent_tpu.builtin.jax_model.drqn import split_unroll
    for remat in (False, "dots", "all"):
        q_fn = split_unroll(net, p, views, feats, h0, keep=keep, remat=remat)
        np.testing.assert_allclose(np.asarray(q_fn), np.asarray(q_ref),
                                   atol=1e-5, err_msg=str(remat))


def test_drqn_bf16_gru_tracks_f32():
    """bf16 GRU compute (params f32): both the stepped cell and the split
    unroll stay within bf16 tolerance of the f32 net, and the params trees
    are interchangeable (same names/shapes/dtypes)."""
    from magent_tpu.builtin.jax_model.drqn import split_unroll

    T, N = 4, 6
    net32 = DRQNNet(num_actions=9, state_size=64)
    net16 = DRQNNet(num_actions=9, state_size=64, dtype=jnp.bfloat16)
    key = jax.random.PRNGKey(0)
    views = jax.random.uniform(key, (T, N, 5, 5, 4))
    feats = jax.random.uniform(jax.random.fold_in(key, 1), (T, N, 7))
    p = net32.init(jax.random.fold_in(key, 3),
                   jnp.zeros((1, 64), jnp.float32),
                   views[0, :1], feats[0, :1])["params"]
    p16 = net16.init(jax.random.fold_in(key, 3),
                     jnp.zeros((1, 64), jnp.float32),
                     views[0, :1], feats[0, :1])["params"]
    assert (jax.tree.structure(p) == jax.tree.structure(p16)
            and all(a.dtype == b.dtype == jnp.float32
                    for a, b in zip(jax.tree.leaves(p),
                                    jax.tree.leaves(p16))))
    h0 = 0.1 * jax.random.normal(jax.random.fold_in(key, 4), (N, 64))

    # stepped cell: bf16 net on the f32 params
    h32, q32 = net32.apply({"params": p}, h0, views[0], feats[0])
    h16, q16 = net16.apply({"params": p}, h0, views[0], feats[0])
    assert h16.dtype == q16.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(q16), np.asarray(q32),
                               atol=0.05)
    # split unroll in bf16 vs f32
    u32 = split_unroll(net32, p, views, feats, h0)
    u16 = split_unroll(net16, p, views, feats, h0)
    np.testing.assert_allclose(np.asarray(u16), np.asarray(u32),
                               atol=0.08)


def test_dqn_train_step_with_mid_rollout_resets():
    """Tiny 1v1 sides die quickly, forcing auto-resets INSIDE the rollout:
    the recorded start-of-step liveness must keep the loss finite and the
    env populated (parallel/train.py alive_in masking)."""
    import magent_tpu as magent
    gw = magent.gridworld
    cfg = gw.Config()
    cfg.set({"map_width": 16, "map_height": 16, "embedding_size": 4})
    # starvation guarantees extinction (and thus auto-reset) every ~4 steps
    t = cfg.register_agent_type(
        "t", {'width': 1, 'length': 1, 'hp': 1, 'speed': 1,
              'view_range': gw.CircleRange(2),
              'attack_range': gw.CircleRange(1), 'damage': 1,
              'step_recover': -0.3, 'dead_penalty': -1.0})
    cfg.add_group(t)
    cfg.add_group(t)
    venv = VecGridWorld(cfg, [1, 1], n_envs=4)
    spec = venv.spec
    nets = [DQNNet(num_actions=spec.groups[g].type.n_action)
            for g in range(2)]
    params = []
    for g in range(2):
        vh, vw, C = spec.view_space(g)
        F = spec.feature_size(g)
        params.append(nets[g].init(
            jax.random.PRNGKey(g),
            jnp.zeros((1, vh, vw, C), jnp.float32),
            jnp.zeros((1, F), jnp.float32))["params"])
    params = tuple(params)
    tx = optax.adam(1e-3)
    opts = tuple(tx.init(p) for p in params)
    tgt = jax.tree.map(lambda x: x, params)
    step = jax.jit(make_dqn_train_step(venv, nets, tx, rollout_len=16))

    state = venv.reset(jax.random.PRNGKey(0))
    resets_seen = 0
    key = jax.random.PRNGKey(1)
    for k in range(3):
        params, opts, state, metrics = step(
            params, tgt, opts, state, jax.random.fold_in(key, k), 0.9)
        assert np.all(np.isfinite(np.asarray(metrics["loss"])))
        # auto-reset keeps both 1-agent groups populated at rollout end
        alive = np.asarray(state.active & ~state.dead)
        resets_seen += int(np.asarray(state.step_ct).min() < 16 * (k + 1))
        assert alive.sum() >= 1
    assert resets_seen > 0, "no episode ever ended; scenario too gentle"


def test_train_groups_scripted_opponent():
    """train_groups: the scripted group's params stay bit-identical, its
    loss reports 0, and the trained group still moves (the tiger/gather
    regime: random-acting opponents inside the fused program)."""
    venv = VecGridWorld(battle.get_config(20), [6, 6], n_envs=4)
    spec = venv.spec
    nets = [DQNNet(num_actions=spec.groups[g].type.n_action)
            for g in range(2)]
    vh, vw, C = spec.view_space(1)
    F = spec.feature_size(1)
    p1 = nets[1].init(jax.random.PRNGKey(1),
                      jnp.zeros((1, vh, vw, C), jnp.float32),
                      jnp.zeros((1, F), jnp.float32))["params"]
    params = ({}, p1)  # group 0 scripted: no net built at all
    tx = optax.adam(1e-3)
    opts = tuple(tx.init(p) for p in params)
    tgt = jax.tree.map(lambda x: x, params)
    step = jax.jit(make_dqn_train_step(venv, nets, tx, rollout_len=3,
                                       train_groups=(1,)))
    state = venv.reset(jax.random.PRNGKey(0))
    p_new, o_new, s_new, m = step(params, tgt, opts, state,
                                  jax.random.PRNGKey(2), 0.5)
    loss = np.asarray(m["loss"])
    assert loss[0] == 0.0 and np.isfinite(loss[1])
    assert p_new[0] == {}  # untouched
    moved = jax.tree.map(lambda a, b: float(jnp.max(jnp.abs(a - b))),
                         params[1], p_new[1])
    assert max(jax.tree.leaves(moved)) > 0
