"""Fused rollout + learner step: the whole sample->train loop as one program.

The reference overlaps sampling and training with one subprocess per group
connected over pipes (reference: python/magent/model.py:115-285,
examples/train_battle.py:61-127).  Here env stepping, observation rendering,
policy inference, and the DQN update co-compile into a single XLA program
over the device mesh: the rollout is a ``lax.scan``, transitions stay in
device memory, and gradients data-parallel-reduce over ICI.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from .vec_env import VecGridWorld


def _egreedy_actions(venv, nets, params, state, key, eps,
                     return_obs=False, train_groups=None):
    """e-greedy actions for every group over the full slot axis; optionally
    also returns the rendered (views, feats) for trajectory storage.

    ``train_groups``: groups OUTSIDE this set act uniformly at random and
    skip observation rendering + policy inference entirely (scripted
    opponents: tiger's wandering deer, gather's inert food — reference
    runs a RandomActor for these, builtin/rule_model)."""
    spec = venv.spec
    B = venv.n_envs
    A = spec.n_agents_cap
    tg = (set(range(spec.n_groups)) if train_groups is None
          else set(train_groups))
    actions = jnp.zeros((B, A), jnp.int32)
    views, feats = [], []
    if train_groups is None:
        all_obs = venv.observe_all(state)
    else:  # render only the policy groups, sharing one grid pass
        grids_fn = getattr(venv._observe1[0], "grids_fn", None)
        grids = grids_fn(state) if grids_fn is not None else None
        all_obs = [venv.observe(state, g, grids) if g in tg else None
                   for g in range(spec.n_groups)]
    for g, gs in enumerate(spec.groups):
        n_act = gs.type.n_action
        kg, kr = jax.random.split(jax.random.fold_in(key, g))
        if g not in tg:
            act = jax.random.randint(kg, (B, gs.cap), 0, n_act, jnp.int32)
            actions = actions.at[:, gs.offset : gs.offset + gs.cap].set(act)
            if return_obs:
                views.append(None)
                feats.append(None)
            continue
        view, feat = all_obs[g]  # [B, cap, vh, vw, C], [B, cap, F]
        q = nets[g].apply(
            {"params": params[g]},
            view.reshape((-1,) + view.shape[2:]),
            feat.reshape((-1,) + feat.shape[2:]),
        ).reshape(B, gs.cap, n_act)
        greedy = jnp.argmax(q, axis=-1).astype(jnp.int32)
        rand = jax.random.randint(kg, greedy.shape, 0, n_act, jnp.int32)
        act = jnp.where(jax.random.uniform(kr, greedy.shape) < eps,
                        rand, greedy)
        actions = actions.at[:, gs.offset : gs.offset + gs.cap].set(act)
        if return_obs:
            views.append(view)
            feats.append(feat)
    if return_obs:
        return actions, views, feats
    return actions


def sample_eval_set(venv: "VecGridWorld", group: int, n_steps: int = 10,
                    key=None):
    """A FIXED set of evaluation observations for ``group``, gathered from
    a random rollout (the reference's sample_observation methodology,
    reference utility.py:115-178: random actors play, observations are
    sampled; DQN then reports its mean max-Q on that set every round,
    reference tf_model/dqn.py:348-356).

    Returns (views [n_steps*B*cap, vh, vw, C], feats [..., F]) as concrete
    arrays — compute once, reuse for the whole run so the Q curve is
    comparable across rounds.
    """
    import jax as _jax

    key = _jax.random.PRNGKey(1234) if key is None else key

    def body(carry, t):
        state, k = carry
        k, akey = _jax.random.split(k)
        view, feat = venv.observe(state, group)
        actions = venv.random_actions(akey)
        state, _, _, _ = venv.transition(state, actions)
        return (state, k), (view, feat)

    def run(k0):
        state0 = venv.reset(_jax.random.fold_in(k0, 0))
        (_, _), (views, feats) = jax.lax.scan(
            body, (state0, k0), jnp.arange(n_steps))
        return (views.reshape((-1,) + views.shape[3:]),
                feats.reshape((-1,) + feats.shape[3:]))

    return _jax.jit(run)(key)


def make_eval_q(venv: "VecGridWorld", nets, group: int):
    """``eval_q(params, views, feats) -> mean max-Q`` on a fixed eval set
    (one jitted program; pair with :func:`sample_eval_set`).  Tracking this
    against the TARGET net's value on the same set separates learning from
    replay-driven Q inflation."""

    def eval_q(params, views, feats):
        q = nets[group].apply({"params": params[group]}, views, feats)
        return jnp.mean(jnp.max(q, axis=-1))

    return jax.jit(eval_q)


def make_dqn_train_step(
    venv: VecGridWorld,
    nets,
    tx: optax.GradientTransformation,
    gamma: float = 0.99,
    rollout_len: int = 8,
    use_double: bool = True,
    train_minibatch: int | None = None,
    train_groups=None,
):
    """Build ``train_step(params, target_params, opt_states, env_state, key,
    eps) -> (params, opt_states, env_state, metrics)``.

    ``train_groups``: optional iterable of group ids that act with (and
    train) their nets; every other group acts uniformly at random, renders
    no observations, and keeps its params/opt state untouched (loss 0 in
    the metrics) — scripted opponents inside the fused program.

    ``nets``/``params`` are per-group (length ``n_groups``) and train
    INDEPENDENTLY: passing the same pytree for two groups does NOT share a
    policy — each group applies only its own gradient and the returned
    copies diverge from the first step (true sharing would need summed
    per-group gradients; the reference likewise trains one model per
    group, examples/train_battle.py).

    One call: roll ``rollout_len`` steps with e-greedy policies, then take
    one double-DQN gradient step per group on the collected transitions
    (TD(0) over consecutive rollout steps, masked by per-agent liveness —
    equivalent to the reference's replay of fresh samples with
    ``train_freq`` = 1, reference: builtin/tf_model/dqn.py:277-346).

    ``train_minibatch``: if set, the gradient step uses that many uniformly
    sampled transitions instead of all ``rollout_len * n_envs * cap`` of
    them — the reference's sampled-batch semantics
    (builtin/tf_model/dqn.py:300-320), and ~T/K-fold cheaper on the MXU.
    """
    spec = venv.spec
    G = spec.n_groups
    B = venv.n_envs
    offs = [g.offset for g in spec.groups]
    caps = [g.cap for g in spec.groups]


    def rollout(params, env_state, key, eps):
        def body(carry, t):
            state, key = carry
            key, akey = jax.random.split(key)
            # start-of-step liveness: correct across auto-resets, where the
            # previous step's end-of-step `alive` belongs to the OLD episode
            alive_in = state.active & ~state.dead
            actions, views, feats = _egreedy_actions(
                venv, nets, params, state, akey, eps, return_obs=True,
                train_groups=train_groups)
            next_state, rewards, alive, done = venv.transition(state, actions)
            out = dict(
                views=tuple(views),
                feats=tuple(feats),
                actions=tuple(
                    actions[:, offs[g] : offs[g] + caps[g]] for g in range(G)
                ),
                rewards=tuple(
                    rewards[:, offs[g] : offs[g] + caps[g]] for g in range(G)
                ),
                alive=tuple(
                    alive[:, offs[g] : offs[g] + caps[g]] for g in range(G)
                ),
                alive_in=tuple(
                    alive_in[:, offs[g] : offs[g] + caps[g]] for g in range(G)
                ),
                done=done,
            )
            return (next_state, key), out

        (env_state, _), traj = jax.lax.scan(
            body, (env_state, key), jnp.arange(rollout_len)
        )
        return env_state, traj

    def group_loss_sampled(p, tp, g, traj, skey):
        """Double-DQN TD loss on ``train_minibatch`` sampled transitions."""
        cap = caps[g]
        view = traj["views"][g]  # [T, B, cap, vh, vw, C]
        feat = traj["feats"][g]
        T = view.shape[0]
        flat_v = view.reshape((-1,) + view.shape[3:])
        flat_f = feat.reshape((-1,) + feat.shape[3:])
        act_fl = traj["actions"][g].reshape(-1)
        rew_fl = traj["rewards"][g].reshape(-1)
        alive = traj["alive"][g]
        prev_alive = traj["alive_in"][g]
        done_b = jnp.broadcast_to(
            traj["done"][:, :, None], (T, B, cap)
        )
        term_fl = ((~alive) | done_b).reshape(-1)
        prev_fl = prev_alive.reshape(-1)

        K = train_minibatch
        kidx = jax.random.randint(skey, (K,), 0, (T - 1) * B * cap)
        cur = kidx
        nxt = kidx + B * cap  # same (env, agent) one step later

        # the scan-stacked views inherit a cap-minor layout from the
        # observation kernel's consumers; row-gathering 16k samples from
        # that layout is fully strided (~8ms per gather).  Collapse the
        # sample rows to a 2-D matrix (natural row-major) so the gathers
        # read contiguous rows, and restore the window shape after.
        vshape = flat_v.shape[1:]
        flat_v = flat_v.reshape(flat_v.shape[0], -1)
        gather_v = lambda ix: flat_v[ix].reshape((ix.shape[0],) + vshape)

        q_cur = nets[g].apply({"params": p}, gather_v(cur), flat_f[cur])
        q_t = jnp.take_along_axis(q_cur, act_fl[cur][:, None], axis=-1)[:, 0]
        nv = gather_v(nxt)
        nf = flat_f[nxt]
        tq_nxt = nets[g].apply({"params": tp}, nv, nf)
        if use_double:
            q_nxt = nets[g].apply({"params": p}, nv, nf)
            sel = jnp.argmax(q_nxt, axis=-1, keepdims=True)
            next_v = jnp.take_along_axis(tq_nxt, sel, axis=-1)[:, 0]
        else:
            next_v = jnp.max(tq_nxt, axis=-1)

        target = jnp.where(
            term_fl[cur], rew_fl[cur],
            rew_fl[cur] + gamma * jax.lax.stop_gradient(next_v),
        )
        mask = prev_fl[cur].astype(jnp.float32)
        td = jnp.square(jax.lax.stop_gradient(target) - q_t)
        return jnp.sum(td * mask) / jnp.maximum(jnp.sum(mask), 1.0)

    def group_loss(p, tp, g, traj):
        """Masked double-DQN TD loss for group ``g`` over the rollout."""
        n_act = spec.groups[g].type.n_action
        view = traj["views"][g]  # [T, B, cap, vh, vw, C]
        feat = traj["feats"][g]
        act = traj["actions"][g]
        rew = traj["rewards"][g]
        alive = traj["alive"][g]
        done = traj["done"]  # [T, B]

        T = view.shape[0]
        flat_v = view.reshape((-1,) + view.shape[3:])
        flat_f = feat.reshape((-1,) + feat.shape[3:])
        q_all = nets[g].apply({"params": p}, flat_v, flat_f).reshape(
            T, B, caps[g], n_act
        )
        tq_all = nets[g].apply({"params": tp}, flat_v, flat_f).reshape(
            T, B, caps[g], n_act
        )

        q_t = jnp.take_along_axis(
            q_all[:-1], act[:-1][..., None], axis=-1
        )[..., 0]
        if use_double:
            sel = jnp.argmax(q_all[1:], axis=-1, keepdims=True)
            next_v = jnp.take_along_axis(tq_all[1:], sel, axis=-1)[..., 0]
        else:
            next_v = jnp.max(tq_all[1:], axis=-1)

        # terminal when the agent dies or the episode ends this step
        terminal = (~traj["alive"][g][:-1]) | done[:-1][:, :, None]
        target = jnp.where(
            terminal, rew[:-1], rew[:-1] + gamma * jax.lax.stop_gradient(next_v)
        )
        # only transitions whose state was alive at the START of the step
        # count (recorded in-rollout, so it is fresh-episode liveness right
        # after an auto-reset)
        mask = traj["alive_in"][g][:-1].astype(jnp.float32)
        td = jnp.square(jax.lax.stop_gradient(target) - q_t)
        return jnp.sum(td * mask) / jnp.maximum(jnp.sum(mask), 1.0)

    def train_step(params, target_params, opt_states, env_state, key, eps):
        key, rkey = jax.random.split(key)
        env_state, traj = rollout(params, env_state, rkey, eps)

        tg = set(range(G)) if train_groups is None else set(train_groups)
        new_params, new_opts, losses = [], [], []
        for g in range(G):
            if g not in tg:  # scripted group: params untouched
                new_params.append(params[g])
                new_opts.append(opt_states[g])
                losses.append(jnp.float32(0.0))
                continue
            if train_minibatch is not None:
                loss, grads = jax.value_and_grad(group_loss_sampled)(
                    params[g], target_params[g], g, traj,
                    jax.random.fold_in(key, 1000 + g),
                )
            else:
                loss, grads = jax.value_and_grad(group_loss)(
                    params[g], target_params[g], g, traj
                )
            updates, opt_g = tx.update(grads, opt_states[g], params[g])
            new_params.append(optax.apply_updates(params[g], updates))
            new_opts.append(opt_g)
            losses.append(loss)

        mean_rew = jnp.stack(
            [jnp.mean(traj["rewards"][g]) for g in range(G)]
        )
        metrics = dict(loss=jnp.stack(losses), mean_reward=mean_rew)
        return tuple(new_params), tuple(new_opts), env_state, metrics

    return train_step


def make_dqn_train_step_remat(
    venv: VecGridWorld,
    nets,
    tx: optax.GradientTransformation,
    gamma: float = 0.99,
    rollout_len: int = 16,
    use_double: bool = True,
    sample_steps: int = 2,
):
    """Fused DQN with observation REMATERIALIZATION: the rollout stores only
    the compact per-step agent state (~100KB/step) instead of the rendered
    windows (~100MB/step), and the learner re-renders observations just for
    ``sample_steps`` uniformly-sampled rollout steps, training on ALL agents
    of those steps.

    Why: at battle scale the plain fused trainer's wall is writing the
    [T, B, cap, vh, vw, C] view trajectory to HBM (~1.7GB per 16-step call
    — more than the rollout's compute).  Re-rendering two steps costs ~4ms
    against ~35ms of avoided traffic.  Requires the non-rotating
    observation path (no turn_mode).

    Returns ``train_step(params, target_params, opt_states, env_state, key,
    eps)`` with the same contract as :func:`make_dqn_train_step`.
    """
    spec = venv.spec
    assert not spec.turn_mode, "remat trainer needs the NORTH-only obs path"
    assert not spec.food_mode, "remat rebuild keeps grids static (no food)"
    G = spec.n_groups
    B = venv.n_envs
    offs = [g.offset for g in spec.groups]
    caps = [g.cap for g in spec.groups]

    OBS_FIELDS = ("x", "y", "hp", "dir", "active", "dead", "absorbed", "id",
                  "last_action", "last_reward")


    def rollout(params, env_state, key, eps):
        def body(carry, t):
            state, key = carry
            key, akey = jax.random.split(key)
            actions = _egreedy_actions(venv, nets, params, state,
                                        akey, eps)
            next_state, rewards, alive, done = venv.transition(state, actions)
            out = dict(
                snap={f: getattr(state, f) for f in OBS_FIELDS},
                actions=actions,
                rewards=rewards,
                alive=alive,
                # start-of-step liveness (fresh-episode-correct across
                # auto-resets, unlike the previous step's end-of-step alive)
                alive_in=state.active & ~state.dead,
                done=done,
            )
            return (next_state, key), out

        (env_state, _), traj = jax.lax.scan(
            body, (env_state, key), jnp.arange(rollout_len)
        )
        return env_state, traj

    def rebuild_state(template, traj, t):
        """State at rollout step ``t`` (grid fields from the template: the
        fast obs path renders from positions, never from cell_slot)."""
        fields = {
            f: jax.tree.map(lambda a: a[t], traj["snap"][f])
            for f in OBS_FIELDS
        }
        return template.replace(**fields)

    def step_loss(p, tp, g, traj, s_t, s_t1, grids_t, grids_t1, t,
                  prev_alive_t):
        """Double-DQN TD loss over ALL agents of rollout step ``t``.

        ``s_t``/``s_t1`` are the rebuilt states for the sampled step and
        ``grids_t``/``grids_t1`` their shared channel images: the grid
        scatter/render pass is group- and param-independent, so it is
        computed ONCE per sampled step outside the per-group
        ``value_and_grad`` calls instead of re-emitting it per group and
        per Q-net apply (~0.35ms per scatter pass at battle scale)."""
        n_act = spec.groups[g].type.n_action
        sl = slice(offs[g], offs[g] + caps[g])
        view, feat = venv.observe(s_t, g, grids_t)
        nview, nfeat = venv.observe(s_t1, g, grids_t1)

        def q_of(prm, v, f):
            return nets[g].apply(
                {"params": prm},
                v.reshape((-1,) + v.shape[2:]),
                f.reshape((-1,) + f.shape[2:]),
            ).reshape(B, caps[g], n_act)

        q_t = jnp.take_along_axis(
            q_of(p, view, feat),
            traj["actions"][t][:, sl][..., None], axis=-1)[..., 0]
        tq = q_of(tp, nview, nfeat)
        if use_double:
            sel = jnp.argmax(jax.lax.stop_gradient(q_of(p, nview, nfeat)),
                             axis=-1, keepdims=True)
            next_v = jnp.take_along_axis(tq, sel, axis=-1)[..., 0]
        else:
            next_v = jnp.max(tq, axis=-1)

        rew = traj["rewards"][t][:, sl]
        terminal = (~traj["alive"][t][:, sl]) | traj["done"][t][:, None]
        target = jnp.where(terminal, rew,
                           rew + gamma * jax.lax.stop_gradient(next_v))
        mask = prev_alive_t.astype(jnp.float32)
        td = jnp.square(jax.lax.stop_gradient(target) - q_t)
        return jnp.sum(td * mask), jnp.sum(mask)

    def train_step(params, target_params, opt_states, env_state, key, eps):
        key, rkey, skey = jax.random.split(key, 3)
        template = env_state  # grids/walls for state reconstruction
        env_state, traj = rollout(params, env_state, rkey, eps)

        # reindex snaps so traj["snap"][f][t] is the state BEFORE step t,
        # and t = rollout_len refers to the post-rollout state
        for f in OBS_FIELDS:
            traj["snap"][f] = jnp.concatenate(
                [traj["snap"][f],
                 getattr(env_state, f)[None]], axis=0)
        # start-of-step liveness per step (training mask)
        alive_seq = traj["alive_in"]

        ts = jax.random.randint(skey, (sample_steps,), 0, rollout_len)

        # rebuild the sampled states and render their channel images once,
        # shared by every group's loss below (see step_loss)
        grids_fn = getattr(venv._observe1[0], "grids_fn", None)
        samples = []
        for i in range(sample_steps):
            s_t = rebuild_state(template, traj, ts[i])
            s_t1 = rebuild_state(template, traj, ts[i] + 1)
            g_t = grids_fn(s_t) if grids_fn is not None else None
            g_t1 = grids_fn(s_t1) if grids_fn is not None else None
            samples.append((s_t, s_t1, g_t, g_t1))

        new_params, new_opts, losses = [], [], []
        for g in range(G):
            sl = slice(offs[g], offs[g] + caps[g])

            def loss_fn(p):
                total, denom = 0.0, 0.0
                for i in range(sample_steps):
                    lt, lm = step_loss(p, target_params[g], g, traj,
                                       *samples[i], ts[i],
                                       alive_seq[:, :, sl][ts[i]])
                    total = total + lt
                    denom = denom + lm
                return total / jnp.maximum(denom, 1.0)

            loss, grads = jax.value_and_grad(loss_fn)(params[g])
            updates, opt_g = tx.update(grads, opt_states[g], params[g])
            new_params.append(optax.apply_updates(params[g], updates))
            new_opts.append(opt_g)
            losses.append(loss)

        metrics = dict(
            loss=jnp.stack(losses),
            mean_reward=jnp.stack(
                [jnp.mean(traj["rewards"][:, :, offs[g] : offs[g] + caps[g]])
                 for g in range(G)]),
        )
        return tuple(new_params), tuple(new_opts), env_state, metrics

    return train_step


def make_a2c_train_step(
    venv: VecGridWorld,
    nets,
    tx: optax.GradientTransformation,
    gamma: float = 0.99,
    rollout_len: int = 16,
    value_coef: float = 0.1,
    ent_coef: float = 0.08,
):
    """Fused advantage actor-critic: sample ``rollout_len`` steps with the
    current policies, then one policy-gradient step per group on n-step
    returns bootstrapped from V(s_T) (the reference flattens whole episodes
    and bootstraps the tail the same way, reference:
    builtin/tf_model/a2c.py:253-283).

    ``nets[g]`` are :class:`magent_tpu.builtin.jax_model.a2c.A2CNet`
    modules.  Returns ``train_step(params, opt_states, env_state, key) ->
    (params, opt_states, env_state, metrics)``.
    """
    spec = venv.spec
    G = spec.n_groups
    B = venv.n_envs
    A = spec.n_agents_cap
    offs = [g.offset for g in spec.groups]
    caps = [g.cap for g in spec.groups]

    def apply_net(g, p, view, feat, mask):
        """[B, cap, ...] -> (policy [B, cap, n], value [B, cap])."""
        n_act = spec.groups[g].type.n_action
        if nets[g].use_comm:
            # CommNet pools messages within one env's group
            def one(v, f, m):
                return nets[g].apply({"params": p}, v, f, m)
            pol, val = jax.vmap(one)(view, feat, mask)
        else:
            pol, val = nets[g].apply(
                {"params": p},
                view.reshape((-1,) + view.shape[2:]),
                feat.reshape((-1,) + feat.shape[2:]),
            )
            pol = pol.reshape(B, caps[g], n_act)
            val = val.reshape(B, caps[g])
        return pol, val

    def rollout(params, env_state, key):
        def body(carry, t):
            state, key = carry
            key, akey = jax.random.split(key)
            alive_now = state.active & ~state.dead
            actions = jnp.zeros((B, A), jnp.int32)
            out_views, out_feats, out_acts = [], [], []
            all_obs = venv.observe_all(state)
            for g in range(G):
                view, feat = all_obs[g]
                m = alive_now[:, offs[g] : offs[g] + caps[g]].astype(
                    jnp.float32)
                pol, _ = apply_net(g, params[g], view, feat, m)
                act = jax.random.categorical(
                    jax.random.fold_in(akey, g), jnp.log(pol), axis=-1
                ).astype(jnp.int32)
                actions = actions.at[:, offs[g] : offs[g] + caps[g]].set(act)
                out_views.append(view)
                out_feats.append(feat)
                out_acts.append(act)
            next_state, rewards, alive, done = venv.transition(state, actions)
            out = dict(
                views=tuple(out_views),
                feats=tuple(out_feats),
                actions=tuple(out_acts),
                rewards=tuple(
                    rewards[:, offs[g] : offs[g] + caps[g]] for g in range(G)
                ),
                alive=tuple(
                    alive[:, offs[g] : offs[g] + caps[g]] for g in range(G)
                ),
                alive_in=tuple(
                    alive_now[:, offs[g] : offs[g] + caps[g]]
                    for g in range(G)
                ),
                done=done,
            )
            return (next_state, key), out

        (env_state, _), traj = jax.lax.scan(
            body, (env_state, key), jnp.arange(rollout_len)
        )
        return env_state, traj

    def group_loss(p, g, traj, boot_v):
        """pg + value + entropy loss over the rollout window."""
        view = traj["views"][g]  # [T, B, cap, ...]
        feat = traj["feats"][g]
        act = traj["actions"][g]
        rew = traj["rewards"][g]
        alive = traj["alive"][g]
        done_b = traj["done"][:, :, None]  # [T, B, 1]
        T = view.shape[0]

        # the same start-of-step mask the sampling pass used (recorded
        # in-rollout: fresh-episode-correct across auto-resets, and for
        # CommNet the loss re-evaluates the policy under the SAME pooling
        # mask that sampled the action)
        prev_alive = traj["alive_in"][g]
        terminal = (~alive) | done_b

        # backward n-step returns, cut at terminals, bootstrapped from the
        # post-rollout value (reference a2c.py:253-265)
        def scan_back(R_next, xs):
            r, term = xs
            R = r + gamma * jnp.where(term, 0.0, R_next)
            return R, R

        _, rets = jax.lax.scan(
            scan_back, jax.lax.stop_gradient(boot_v),
            (rew, terminal), reverse=True,
        )

        mask3 = prev_alive.astype(jnp.float32)  # [T, B, cap]
        pol, val = jax.vmap(lambda v, f, m: apply_net(g, p, v, f, m))(
            view, feat, mask3)
        logp = jnp.log(pol + 1e-6)
        lp_a = jnp.take_along_axis(logp, act[..., None], axis=-1)[..., 0]
        adv = jax.lax.stop_gradient(rets - val)
        msum = jnp.maximum(jnp.sum(mask3), 1.0)
        pg = -jnp.sum(adv * lp_a * mask3) / msum
        vf = value_coef * jnp.sum(jnp.square(rets - val) * mask3) / msum
        neg_ent = ent_coef * jnp.sum(
            jnp.sum(pol * logp, axis=-1) * mask3) / msum
        return pg + vf + neg_ent, jnp.sum(val * mask3) / msum

    def train_step(params, opt_states, env_state, key):
        key, rkey = jax.random.split(key)
        env_state, traj = rollout(params, env_state, rkey)

        # bootstrap values of the post-rollout state
        final_obs = venv.observe_all(env_state)
        alive_fin = env_state.active & ~env_state.dead

        new_params, new_opts, losses, values = [], [], [], []
        for g in range(G):
            sl = slice(offs[g], offs[g] + caps[g])
            m_fin = alive_fin[:, sl].astype(jnp.float32)
            _, boot_v = apply_net(
                g, params[g], final_obs[g][0], final_obs[g][1], m_fin)
            boot_v = boot_v * m_fin  # dead agents bootstrap 0
            (loss, mean_v), grads = jax.value_and_grad(group_loss, has_aux=True)(
                params[g], g, traj, boot_v
            )
            updates, opt_g = tx.update(grads, opt_states[g], params[g])
            new_params.append(optax.apply_updates(params[g], updates))
            new_opts.append(opt_g)
            losses.append(loss)
            values.append(mean_v)

        metrics = dict(
            loss=jnp.stack(losses),
            mean_value=jnp.stack(values),
            mean_reward=jnp.stack(
                [jnp.mean(traj["rewards"][g]) for g in range(G)]),
        )
        return tuple(new_params), tuple(new_opts), env_state, metrics

    return train_step


def make_drqn_train_step(
    venv: VecGridWorld,
    nets,
    tx: optax.GradientTransformation,
    gamma: float = 0.99,
    rollout_len: int = 8,
    use_double: bool = True,
    unroll_remat="all",
    share_acting: bool = True,
):
    """Fused recurrent-Q training: the GRU hidden state is carried per agent
    slot across calls ([B, cap, H] per group, reset on death/episode end),
    and each call BPTTs through the ``rollout_len`` window from the window's
    true initial hidden state (the reference unrolls stored windows from
    zeros, reference: builtin/tf_model/drqn.py:128-137, 301+; carrying the
    real state is the natural fused equivalent).

    ``unroll_remat`` (default "all") checkpoints the BPTT scan body so the
    backward recomputes the bf16-cheap gate matmuls instead of storing
    ~[B*cap, H] residual arrays per step — measured ~5% faster end to end
    at battle scale and bit-identical math (scripts/profile_drqn.py
    ladder; tests/test_train_fused.py::test_drqn_remat_step_matches_plain).

    ``share_acting`` (default True): differentiate THROUGH the acting
    rollout so its per-step GRU forward doubles as the online BPTT unroll —
    the loss then runs only the TARGET unroll over the stored window
    instead of two (the round-4 floor ladder identified the duplicated
    online forward as the last ~2 ms at battle scale,
    scripts/profile_drqn.py).  Semantics are unchanged: observations, the
    env transition and the TD target are stop_gradient'd, so the only
    differentiable path is the same params -> trunk/GRU/heads -> q chain
    the plain loss re-derives with split_unroll (pinned equal by
    tests/test_train_fused.py::test_drqn_split_unroll_matches_cell), and
    the acting hidden chain (death/episode-end resets after each emitted q)
    is exactly the unroll's keep chain.  The per-step net apply is
    jax.checkpoint'd so the BPTT backward recomputes the gates from the
    carried hidden + stored frame, matching ``unroll_remat="all"``.
    ``share_acting=False`` keeps the two-unroll loss for comparison.

    Returns ``train_step(params, target_params, opt_states, env_state,
    hiddens, key, eps) -> (params, opt_states, env_state, hiddens,
    metrics)``.
    """
    spec = venv.spec
    G = spec.n_groups
    B = venv.n_envs
    A = spec.n_agents_cap
    offs = [g.offset for g in spec.groups]
    caps = [g.cap for g in spec.groups]
    H = [nets[g].state_size for g in range(G)]

    def net_step(g, p, h, view, feat):
        """One GRU step over [B, cap, ...]."""
        n_act = spec.groups[g].type.n_action
        h2, q = nets[g].apply(
            {"params": p},
            h.reshape(-1, H[g]),
            view.reshape((-1,) + view.shape[2:]),
            feat.reshape((-1,) + feat.shape[2:]),
        )
        return h2.reshape(B, caps[g], H[g]), q.reshape(B, caps[g], n_act)

    sg = jax.lax.stop_gradient
    # checkpointed per-step apply for the differentiate-through-acting path:
    # the BPTT backward recomputes trunk+gates from (h_t, frame_t) instead of
    # storing per-step activation residuals (= unroll_remat="all" behavior)
    ckpt_net = [
        jax.checkpoint(lambda p, h, v, f, g=g: net_step(g, p, h, v, f))
        for g in range(G)
    ]

    def rollout(params, env_state, hiddens, key, eps, emit_q=False):
        """``emit_q=False``: plain acting rollout (no grad flows).
        ``emit_q=True``: the rollout is the online BPTT forward — the
        emitted per-step q is differentiable wrt params through the carried
        hidden chain; everything else (observations, env transition,
        rewards) is stop_gradient'd."""
        def body(carry, t):
            state, hiddens, key = carry
            key, akey = jax.random.split(key)
            actions = jnp.zeros((B, A), jnp.int32)
            out_views, out_feats, out_acts, out_qs = [], [], [], []
            all_obs = venv.observe_all(state)
            new_h = []
            for g in range(G):
                view, feat = all_obs[g]
                if emit_q:
                    view, feat = sg(view), sg(feat)
                    h2, q = ckpt_net[g](params[g], hiddens[g], view, feat)
                else:
                    h2, q = net_step(g, params[g], hiddens[g], view, feat)
                n_act = spec.groups[g].type.n_action
                kg, kr = jax.random.split(jax.random.fold_in(akey, g))
                greedy = jnp.argmax(sg(q), axis=-1).astype(jnp.int32)
                rand = jax.random.randint(kg, greedy.shape, 0, n_act, jnp.int32)
                act = jnp.where(
                    jax.random.uniform(kr, greedy.shape) < eps, rand, greedy)
                actions = actions.at[:, offs[g] : offs[g] + caps[g]].set(act)
                out_views.append(view)
                out_feats.append(feat)
                out_acts.append(act)
                out_qs.append(q)
                new_h.append(h2)
            next_state, rewards, alive, done = venv.transition(state, actions)
            if emit_q:
                next_state = sg(next_state)
                rewards = sg(rewards)
            # hidden resets on death and on episode end (auto-reset); the
            # kept chain stays differentiable — it IS the BPTT path
            kept = []
            for g in range(G):
                keep = (alive[:, offs[g] : offs[g] + caps[g]]
                        & ~done[:, None])[..., None]
                kept.append(jnp.where(keep, new_h[g], 0.0))
            alive_in = state.active & ~state.dead
            out = dict(
                views=tuple(out_views),
                feats=tuple(out_feats),
                actions=tuple(out_acts),
                rewards=tuple(
                    rewards[:, offs[g] : offs[g] + caps[g]] for g in range(G)
                ),
                alive=tuple(
                    alive[:, offs[g] : offs[g] + caps[g]] for g in range(G)
                ),
                alive_in=tuple(
                    alive_in[:, offs[g] : offs[g] + caps[g]] for g in range(G)
                ),
                done=done,
            )
            if emit_q:
                out["qs"] = tuple(out_qs)
            return (next_state, tuple(kept), key), out

        (env_state, hiddens, _), traj = jax.lax.scan(
            body, (env_state, hiddens, key), jnp.arange(rollout_len)
        )
        return env_state, hiddens, traj

    def unroll_q(g, p, h0, traj):
        """Re-run the GRU over the stored window (resetting at boundaries)
        -> q [T, B, cap, n_act].  Uses the batched-projection split
        (:func:`magent_tpu.builtin.jax_model.drqn.split_unroll`): only the
        carry-side half of the GRU cell scans over T."""
        from magent_tpu.builtin.jax_model.drqn import split_unroll

        views, feats = traj["views"][g], traj["feats"][g]
        T = views.shape[0]
        keep_t = (traj["alive"][g] & ~traj["done"][:, :, None]).reshape(
            T, -1, 1)
        q = split_unroll(
            nets[g], p,
            views.reshape((T, -1) + views.shape[3:]),
            feats.reshape((T, -1) + feats.shape[3:]),
            h0.reshape(-1, H[g]), keep=keep_t, remat=unroll_remat,
        )
        return q.reshape(T, B, caps[g], -1)

    def td_loss(g, qs, tqs, traj):
        """Masked double-DQN TD error over the window, given online q
        [T, B, cap, n_act] (differentiable) and target q (stopped)."""
        act = traj["actions"][g]
        rew = traj["rewards"][g]
        alive = traj["alive"][g]
        done_b = traj["done"][:, :, None]

        q_t = jnp.take_along_axis(qs[:-1], act[:-1][..., None], axis=-1)[..., 0]
        if use_double:
            sel = jnp.argmax(jax.lax.stop_gradient(qs[1:]), axis=-1,
                             keepdims=True)
            next_v = jnp.take_along_axis(tqs[1:], sel, axis=-1)[..., 0]
        else:
            next_v = jnp.max(tqs[1:], axis=-1)

        terminal = (~alive[:-1]) | done_b[:-1]
        target = jnp.where(terminal, rew[:-1], rew[:-1] + gamma * next_v)
        # start-of-step liveness recorded in-rollout (fresh across resets)
        mask = traj["alive_in"][g][:-1].astype(jnp.float32)
        td = jnp.square(jax.lax.stop_gradient(target) - q_t)
        return jnp.sum(td * mask) / jnp.maximum(jnp.sum(mask), 1.0)

    def group_loss(p, tp, g, h0, traj):
        qs = unroll_q(g, p, h0, traj)
        tqs = jax.lax.stop_gradient(unroll_q(g, tp, h0, traj))
        return td_loss(g, qs, tqs, traj)

    def shared_loss(params, target_params, env_state, hiddens, key, eps):
        """Rollout + loss in one differentiable program: the acting forward
        IS the online unroll (its q chain is emitted by the scan); only the
        target net re-unrolls over the stored window.  Per-group losses are
        separable (cross-group influence flows only through the
        stop_gradient'd env transition), so grads of the sum equal the
        plain path's per-group grads."""
        h0 = hiddens
        env_state, hiddens, traj = rollout(
            params, env_state, hiddens, key, eps, emit_q=True)
        losses = []
        for g in range(G):
            tqs = jax.lax.stop_gradient(
                unroll_q(g, target_params[g], h0[g], traj))
            losses.append(td_loss(g, traj["qs"][g], tqs, traj))
        aux = (env_state, hiddens, traj["rewards"], jnp.stack(losses))
        return sum(losses), aux

    def train_step_shared(params, target_params, opt_states, env_state,
                          hiddens, key, eps):
        key, rkey = jax.random.split(key)
        (_, aux), grads = jax.value_and_grad(shared_loss, has_aux=True)(
            tuple(params), target_params, env_state, hiddens, rkey, eps)
        env_state, hiddens, rewards, losses = aux
        new_params, new_opts = [], []
        for g in range(G):
            updates, opt_g = tx.update(grads[g], opt_states[g], params[g])
            new_params.append(optax.apply_updates(params[g], updates))
            new_opts.append(opt_g)
        metrics = dict(
            loss=losses,
            mean_reward=jnp.stack([jnp.mean(rewards[g]) for g in range(G)]),
        )
        return (tuple(new_params), tuple(new_opts), env_state, hiddens,
                metrics)

    def train_step(params, target_params, opt_states, env_state, hiddens,
                   key, eps):
        key, rkey = jax.random.split(key)
        h0 = hiddens
        env_state, hiddens, traj = rollout(params, env_state, hiddens, rkey, eps)

        new_params, new_opts, losses = [], [], []
        for g in range(G):
            loss, grads = jax.value_and_grad(group_loss)(
                params[g], target_params[g], g, h0[g], traj
            )
            updates, opt_g = tx.update(grads, opt_states[g], params[g])
            new_params.append(optax.apply_updates(params[g], updates))
            new_opts.append(opt_g)
            losses.append(loss)

        metrics = dict(
            loss=jnp.stack(losses),
            mean_reward=jnp.stack(
                [jnp.mean(traj["rewards"][g]) for g in range(G)]),
        )
        return (tuple(new_params), tuple(new_opts), env_state, hiddens,
                metrics)

    return train_step_shared if share_acting else train_step


def init_drqn_hiddens(venv: VecGridWorld, nets):
    """Zero per-agent GRU states, one [B, cap, H] array per group."""
    spec = venv.spec
    return tuple(
        jnp.zeros((venv.n_envs, spec.groups[g].cap, nets[g].state_size),
                  jnp.float32)
        for g in range(spec.n_groups)
    )


def make_a2c_train_loop(venv, nets, tx, steps_per_call: int, **kwargs):
    """``steps_per_call`` fused A2C steps under one ``lax.scan``."""
    train_step = make_a2c_train_step(venv, nets, tx, **kwargs)

    def loop(params, opt_states, env_state, key):
        def body(carry, t):
            params, opt_states, env_state, key = carry
            key, skey = jax.random.split(key)
            params, opt_states, env_state, metrics = train_step(
                params, opt_states, env_state, skey)
            return (params, opt_states, env_state, key), metrics

        (params, opt_states, env_state, _), metrics = jax.lax.scan(
            body, (params, opt_states, env_state, key),
            jnp.arange(steps_per_call))
        return params, opt_states, env_state, metrics

    return loop


def make_drqn_train_loop(venv, nets, tx, steps_per_call: int,
                         target_update: int, **kwargs):
    """``steps_per_call`` fused DRQN steps under one ``lax.scan`` with
    in-scan target refresh (cf. :func:`make_dqn_train_loop`)."""
    train_step = make_drqn_train_step(venv, nets, tx, **kwargs)

    def loop(params, target_params, opt_states, env_state, hiddens, key,
             eps, step0):
        def body(carry, t):
            params, target_params, opt_states, env_state, hiddens, key = carry
            key, skey = jax.random.split(key)
            params, opt_states, env_state, hiddens, metrics = train_step(
                params, target_params, opt_states, env_state, hiddens, skey,
                eps)
            refresh = (step0 + t + 1) % target_update == 0
            target_params = jax.tree.map(
                lambda tp, p: jnp.where(refresh, p, tp), target_params, params
            )
            return (params, target_params, opt_states, env_state, hiddens,
                    key), metrics

        (params, target_params, opt_states, env_state, hiddens, _), metrics = (
            jax.lax.scan(
                body,
                (params, target_params, opt_states, env_state, hiddens, key),
                jnp.arange(steps_per_call)))
        return params, target_params, opt_states, env_state, hiddens, metrics

    return loop


def make_dqn_train_loop(
    venv: VecGridWorld,
    nets,
    tx: optax.GradientTransformation,
    steps_per_call: int,
    target_update: int,
    **kwargs,
):
    """``steps_per_call`` train steps fused into one ``lax.scan`` program.

    Per-step host dispatch costs dozens of device round-trips for the
    parameter/optimizer pytrees; scanning keeps everything resident on the
    device mesh and refreshes the target network inside the scan every
    ``target_update`` steps (replacing the host-side copy the reference does
    between training batches, reference: builtin/tf_model/dqn.py:361-365).

    Returns ``loop(params, target_params, opt_states, env_state, key, eps,
    step0) -> (params, target_params, opt_states, env_state, metrics)`` where
    metrics are stacked over the call's steps and ``step0`` is the global
    step count (drives the target-update phase).
    """
    train_step = make_dqn_train_step(venv, nets, tx, **kwargs)
    return _scan_q_loop(train_step, steps_per_call, target_update)


def make_dqn_remat_train_loop(
    venv: VecGridWorld,
    nets,
    tx: optax.GradientTransformation,
    steps_per_call: int,
    target_update: int,
    **kwargs,
):
    """Scanned loop around :func:`make_dqn_train_step_remat` — same
    in-scan target refresh as :func:`make_dqn_train_loop` (this is the
    headline fused trainer; see RESULTS.md)."""
    train_step = make_dqn_train_step_remat(venv, nets, tx, **kwargs)
    return _scan_q_loop(train_step, steps_per_call, target_update)


def _scan_q_loop(train_step, steps_per_call: int, target_update: int):
    def loop(params, target_params, opt_states, env_state, key, eps, step0):
        def body(carry, t):
            params, target_params, opt_states, env_state, key = carry
            key, skey = jax.random.split(key)
            params, opt_states, env_state, metrics = train_step(
                params, target_params, opt_states, env_state, skey, eps
            )
            refresh = (step0 + t + 1) % target_update == 0
            target_params = jax.tree.map(
                lambda tp, p: jnp.where(refresh, p, tp), target_params, params
            )
            return (params, target_params, opt_states, env_state, key), metrics

        (params, target_params, opt_states, env_state, _), metrics = jax.lax.scan(
            body,
            (params, target_params, opt_states, env_state, key),
            jnp.arange(steps_per_call),
        )
        return params, target_params, opt_states, env_state, metrics

    return loop
