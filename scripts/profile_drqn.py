"""Fused-DRQN cost ladder (the round-3 verdict asked why DRQN trains at
2.05M agent-steps/s vs DQN-remat's 4.5-5M).  Times the pieces of
parallel.train.make_drqn_train_step at the bench configuration (battle
2x1000, B=16, rollout 8, BPTT window 8) as in-`lax.scan` variants:

  env_only      rollout transitions, no nets (the env-loop floor)
  rollout       env + per-step GRU inference (epsilon-greedy acting)
  rollout+unr   rollout + BOTH BPTT unrolls (online + target), no grad
  full          the complete train step (adds backward + adam)

Usage: python scripts/profile_drqn.py [--rollout_len 8] [--dtype bf16]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/magent_tpu_jax_cache")

import jax
import jax.numpy as jnp
import numpy as np
import optax

from magent_tpu.builtin.config import battle
from magent_tpu.builtin.jax_model.drqn import DRQNNet
from magent_tpu.parallel import (VecGridWorld, init_drqn_hiddens,
                                 make_drqn_train_step)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n_per_group", type=int, default=1000)
    ap.add_argument("--map_size", type=int, default=200)
    ap.add_argument("--n_envs", type=int, default=16)
    ap.add_argument("--rollout_len", type=int, default=8)
    ap.add_argument("--calls", type=int, default=4)
    ap.add_argument("--inner", type=int, default=4,
                    help="train steps fused per timed call")
    ap.add_argument("--dtype", default="bf16", choices=["f32", "bf16"])
    ap.add_argument("--state_size", type=int, default=128)
    args = ap.parse_args()

    dt = {"f32": None, "bf16": jnp.bfloat16}[args.dtype]
    venv = VecGridWorld(battle.get_config(args.map_size),
                        [args.n_per_group, args.n_per_group],
                        n_envs=args.n_envs, obs_dtype=dt)
    spec = venv.spec
    G = spec.n_groups
    nets = [DRQNNet(num_actions=spec.groups[g].type.n_action,
                    state_size=args.state_size, dtype=dt or jnp.float32)
            for g in range(G)]
    key = jax.random.PRNGKey(0)
    params = []
    for g in range(G):
        vh, vw, C = spec.view_space(g)
        F = spec.feature_size(g)
        p = nets[g].init(
            jax.random.fold_in(key, g),
            jnp.zeros((1, args.state_size), jnp.float32),
            jnp.zeros((1, vh, vw, C), jnp.float32),
            jnp.zeros((1, F), jnp.float32))["params"]
        params.append(p)
    params = tuple(params)
    tx = optax.chain(optax.clip_by_global_norm(5.0), optax.adam(1e-4))
    opt_states = tuple(tx.init(p) for p in params)
    target_params = jax.tree.map(lambda x: x, params)
    hiddens = init_drqn_hiddens(venv, nets)
    env_state = jax.jit(venv.reset)(jax.random.PRNGKey(1))

    step = make_drqn_train_step(venv, nets, tx, rollout_len=args.rollout_len)
    # reach into the closure pieces through a second instance built the same
    # way the train step builds them (same code path, same shapes)
    B, A = args.n_envs, spec.n_agents_cap
    total_agents = 2 * args.n_per_group * args.n_envs

    def timed(name, fn, *fargs):
        # operands must be real arguments: a closure would bake them into
        # the HLO as constants (the env state / trajectory are hundreds of
        # MB — the tunnel's compile RPC rejects the request)
        @jax.jit
        def run(key, *xs):
            def body(carry, t):
                key, *xs = carry
                key, sk = jax.random.split(key)
                out = fn(sk, *xs)
                return (key, *out[0]), out[1]
            (key, *_), sink = jax.lax.scan(
                body, (key, *xs), jnp.arange(args.inner))
            return jnp.sum(sink)

        s = run(jax.random.PRNGKey(2), *fargs)
        float(s)
        t0 = time.perf_counter()
        for c in range(args.calls):
            s = run(jax.random.fold_in(jax.random.PRNGKey(3), c), *fargs)
        float(s)
        dtm = time.perf_counter() - t0
        per_env_step = dtm / (args.calls * args.inner * args.rollout_len)
        rate = total_agents / per_env_step
        print("%-13s %8.3f ms/env-step  %7.2fM trained agent-steps/s"
              % (name, per_env_step * 1e3, rate / 1e6), flush=True)

    # ---- env_only ----
    def env_only(sk, state=None):
        state = env_state if state is None else state
        def body(carry, t):
            st, k = carry
            k, ak = jax.random.split(k)
            st, rew, alive, done = venv.transition(st, venv.random_actions(ak))
            return (st, k), jnp.sum(rew[:, 0])
        (st, _), r = jax.lax.scan(body, (state, sk),
                                  jnp.arange(args.rollout_len))
        return (st,), jnp.sum(r)

    timed("env_only", lambda sk, st: env_only(sk, st), env_state)

    # ---- rollout (env + GRU inference), reconstructed exactly as the
    # train-step factory builds it (the factory keeps it private) ----
    from magent_tpu.builtin.jax_model.drqn import split_unroll
    offs = [g.offset for g in spec.groups]
    caps = [g.cap for g in spec.groups]
    Hs = [nets[g].state_size for g in range(G)]

    def net_step(g, p, h, view, feat):
        n_act = spec.groups[g].type.n_action
        h2, q = nets[g].apply(
            {"params": p}, h.reshape(-1, Hs[g]),
            view.reshape((-1,) + view.shape[2:]),
            feat.reshape((-1,) + feat.shape[2:]))
        return h2.reshape(B, caps[g], Hs[g]), q.reshape(B, caps[g], n_act)

    def do_rollout(sk, state, hid):
        def body(carry, t):
            st, hs, k = carry
            k, ak = jax.random.split(k)
            actions = jnp.zeros((B, A), jnp.int32)
            all_obs = venv.observe_all(st)
            new_h = []
            outs = 0.0
            views, feats, acts = [], [], []
            for g in range(G):
                view, feat = all_obs[g]
                h2, q = net_step(g, params[g], hs[g], view, feat)
                n_act = spec.groups[g].type.n_action
                kg, kr = jax.random.split(jax.random.fold_in(ak, g))
                greedy = jnp.argmax(q, axis=-1).astype(jnp.int32)
                rand = jax.random.randint(kg, greedy.shape, 0, n_act, jnp.int32)
                act = jnp.where(jax.random.uniform(kr, greedy.shape) < 0.3,
                                rand, greedy)
                actions = actions.at[:, offs[g]:offs[g] + caps[g]].set(act)
                new_h.append(h2)
                views.append(view); feats.append(feat); acts.append(act)
            st, rew, alive, done = venv.transition(st, actions)
            hs = tuple(
                jnp.where((alive[:, offs[g]:offs[g] + caps[g]]
                           & ~done[:, None])[..., None], new_h[g], 0.0)
                for g in range(G))
            out = dict(views=tuple(views), feats=tuple(feats),
                       acts=tuple(acts), done=done,
                       alive=tuple(alive[:, offs[g]:offs[g] + caps[g]]
                                   for g in range(G)))
            return (st, hs, k), out
        (st, hid, _), traj = jax.lax.scan(
            body, (state, hid, sk), jnp.arange(args.rollout_len))
        return st, hid, traj

    def rollout_only(sk, state, hid):
        st, hid, traj = do_rollout(sk, state, hid)
        return (st, hid), jnp.sum(traj["acts"][0][..., ::64])

    timed("rollout", rollout_only, env_state, hiddens)

    # rollout with the stacked trajectory FORCED to materialize (the plain
    # rollout sink only reads actions, so XLA dead-code-eliminates the
    # [T, B, cap, vh, vw, C] view stacks that the real train step must
    # write to HBM and read back in the loss)
    def rollout_store(sk, state, hid):
        st, hid, traj = do_rollout(sk, state, hid)
        s = jnp.sum(traj["acts"][0][..., ::64]).astype(jnp.float32)
        for g in range(G):
            s = s + jnp.sum(traj["views"][g][:, :, :, 0, 0, 0]
                            .astype(jnp.float32))
            s = s + jnp.sum(traj["feats"][g][:, :, :, 0])
        return (st, hid), s

    timed("rollout_st", rollout_store, env_state, hiddens)

    # ---- rollout + both unrolls (no grad) ----
    def unroll_q(g, p, h0, traj):
        views, feats = traj["views"][g], traj["feats"][g]
        T = views.shape[0]
        keep_t = (traj["alive"][g] & ~traj["done"][:, :, None]).reshape(
            T, -1, 1)
        q = split_unroll(
            nets[g], p,
            views.reshape((T, -1) + views.shape[3:]),
            feats.reshape((T, -1) + feats.shape[3:]),
            h0.reshape(-1, Hs[g]), keep=keep_t)
        return q

    def rollout_unroll(sk, state, hid):
        h0 = hid
        st, hid, traj = do_rollout(sk, state, hid)
        s = 0.0
        for g in range(G):
            s = s + jnp.sum(unroll_q(g, params[g], h0[g], traj)[..., 0, 0])
            s = s + jnp.sum(unroll_q(g, target_params[g], h0[g],
                                     traj)[..., 0, 0])
        return (st, hid), s

    timed("rollout+unr", rollout_unroll, env_state, hiddens)

    # ---- loss forward / pure grad (no rollout, fixed trajectory) ----
    # isolates the backward: rollout once OUTSIDE the timed region, then
    # time group_loss forward vs value_and_grad on that fixed window
    # NOTE: every variant body must DEPEND on the per-iteration key, or
    # XLA hoists it out of the timing scan as loop-invariant and the
    # reading comes out ~inner× too fast.  The fixed-trajectory variants
    # jitter h0 by a key-derived epsilon to break the invariance.
    def make_group_loss(remat):
        def group_loss(p, tp, g, h0, traj):
            act, rew = traj["acts"][g], traj["rewards"][g]
            alive, done_b = traj["alive"][g], traj["done"][:, :, None]
            qs = unroll_q(g, p, h0, traj, remat=remat)
            tqs = jax.lax.stop_gradient(unroll_q(g, tp, h0, traj,
                                                 remat=remat))
            q_t = jnp.take_along_axis(qs[:-1], act[:-1][..., None],
                                      axis=-1)[..., 0]
            sel = jnp.argmax(jax.lax.stop_gradient(qs[1:]), axis=-1,
                             keepdims=True)
            next_v = jnp.take_along_axis(tqs[1:], sel, axis=-1)[..., 0]
            terminal = (~alive[:-1]) | done_b[:-1]
            target = jnp.where(terminal, rew[:-1], rew[:-1] + 0.99 * next_v)
            mask = alive[:-1].astype(jnp.float32)
            td = jnp.square(jax.lax.stop_gradient(target) - q_t)
            return jnp.sum(td * mask) / jnp.maximum(jnp.sum(mask), 1.0)
        return group_loss

    def unroll_q_r(g, p, h0, traj, remat=False):
        views, feats = traj["views"][g], traj["feats"][g]
        T = views.shape[0]
        keep_t = (traj["alive"][g] & ~traj["done"][:, :, None]).reshape(
            T, -1, 1)
        q = split_unroll(
            nets[g], p,
            views.reshape((T, -1) + views.shape[3:]),
            feats.reshape((T, -1) + feats.shape[3:]),
            h0.reshape(-1, Hs[g]), keep=keep_t, remat=remat)
        return q.reshape(T, B, caps[g], -1)

    unroll_q = unroll_q_r  # the granular variants take the remat knob

    st_fix, hid_fix, traj_fix = jax.jit(do_rollout)(
        jax.random.PRNGKey(7), env_state, hiddens)
    traj_fix = dict(traj_fix, rewards=tuple(
        jnp.zeros(traj_fix["acts"][g].shape, jnp.float32) for g in range(G)))
    jax.block_until_ready(traj_fix["acts"][0])

    def grad_sink(grads):
        return sum(jnp.sum(l.reshape(-1)[:8]) for l in jax.tree.leaves(grads))

    # traj_fix rides the scan carry (a closure would bake the trajectory
    # into the HLO as constants — hundreds of MB through the compile RPC)
    for name, remat in (("loss_fwd", False), ("grad", False),
                        ("grad_remat", True)):
        gl = make_group_loss(remat)
        if name == "loss_fwd":
            def fn(sk, p, hid, traj, sem=gl):
                jit = jax.random.uniform(sk, (), minval=1e-12, maxval=2e-12)
                s = sum(sem(p[g], target_params[g], g, hid[g] + jit, traj)
                        for g in range(G))
                return (p, hid, traj), s
        else:
            def fn(sk, p, hid, traj, sem=gl):
                jit = jax.random.uniform(sk, (), minval=1e-12, maxval=2e-12)
                s = 0.0
                for g in range(G):
                    loss, grads = jax.value_and_grad(sem)(
                        p[g], target_params[g], g, hid[g] + jit, traj)
                    s = s + loss + grad_sink(grads)
                return (p, hid, traj), s
        timed(name, fn, params, hiddens, traj_fix)

    # ---- rollout + grad composed, no optimizer ----
    def train_noopt(sk, p, state, hid):
        gl = make_group_loss(False)
        h0 = hid
        st, hid, traj = do_rollout(sk, state, hid)
        traj = dict(traj, rewards=tuple(
            jnp.zeros(traj["acts"][g].shape, jnp.float32)
            for g in range(G)))
        s = 0.0
        for g in range(G):
            loss, grads = jax.value_and_grad(gl)(
                p[g], target_params[g], g, h0[g], traj)
            s = s + loss + grad_sink(grads)
        return (p, st, hid), s

    timed("train_noopt", train_noopt, params, env_state, hiddens)

    # acting rollout + grad on a FIXED trajectory: same per-part work as
    # train_noopt but the loss does not consume the in-program trajectory
    # (isolates dataflow/layout cost from compute cost)
    def act_gradfix(sk, p, state, hid, traj):
        gl = make_group_loss(False)
        st, hid2, traj_live = do_rollout(sk, state, hid)
        jit = jax.random.uniform(sk, (), minval=1e-12, maxval=2e-12)
        s = jnp.sum(traj_live["acts"][0][..., ::64]).astype(jnp.float32)
        for g in range(G):
            loss, grads = jax.value_and_grad(gl)(
                p[g], target_params[g], g, hiddens[g] + jit, traj)
            s = s + loss + grad_sink(grads)
        return (p, st, hid2, traj), s

    timed("act_gradfix", act_gradfix, params, env_state, hiddens, traj_fix)

    # random-action rollout (obs still rendered+stored) + grad on its own
    # trajectory: drops the per-step acting GRU from the composition
    def rand_rollout_grad(sk, p, state, hid):
        gl = make_group_loss(False)

        def body(carry, t):
            st, k = carry
            k, ak = jax.random.split(k)
            all_obs = venv.observe_all(st)
            acts = venv.random_actions(ak)
            st, rew, alive, done = venv.transition(st, acts)
            out = dict(
                views=tuple(all_obs[g][0] for g in range(G)),
                feats=tuple(all_obs[g][1] for g in range(G)),
                acts=tuple(acts[:, offs[g]:offs[g] + caps[g]]
                           for g in range(G)),
                done=done,
                alive=tuple(alive[:, offs[g]:offs[g] + caps[g]]
                            for g in range(G)))
            return (st, k), out

        (st, _), traj = jax.lax.scan(body, (state, sk),
                                     jnp.arange(args.rollout_len))
        traj = dict(traj, rewards=tuple(
            jnp.zeros(traj["acts"][g].shape, jnp.float32)
            for g in range(G)))
        s = 0.0
        for g in range(G):
            loss, grads = jax.value_and_grad(gl)(
                p[g], target_params[g], g, hid[g], traj)
            s = s + loss + grad_sink(grads)
        return (p, st, hid), s

    timed("rand_grad", rand_rollout_grad, params, env_state, hiddens)

    # ---- full train step ----
    def full(sk, p, tp, opt, state, hid):
        p, opt, state, hid, metrics = step(p, tp, opt, state, hid, sk,
                                           jnp.float32(0.3))
        return (p, tp, opt, state, hid), jnp.sum(metrics["loss"])

    timed("full", full, params, target_params, opt_states, env_state,
          hiddens)

    # ---- full train step, BPTT bodies rematerialized ----
    for mode in ("dots", "all"):
        step_r = make_drqn_train_step(venv, nets, tx,
                                      rollout_len=args.rollout_len,
                                      unroll_remat=mode)

        def full_remat(sk, p, tp, opt, state, hid, _s=step_r):
            p, opt, state, hid, metrics = _s(p, tp, opt, state, hid, sk,
                                             jnp.float32(0.3))
            return (p, tp, opt, state, hid), jnp.sum(metrics["loss"])

        timed("full_remat_" + mode, full_remat, params, target_params,
              opt_states, env_state, hiddens)


if __name__ == "__main__":
    main()
