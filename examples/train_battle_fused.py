"""Battle training on the TPU-native fused path: env stepping, observation
rendering, policy inference and the double-DQN update co-compile into ONE
XLA program over a batch of lockstep envs, sharded over all devices.

This is the throughput-oriented counterpart of examples/train_battle.py
(which mirrors the reference's host-driven loop): no host round-trips inside
a round, transitions never leave device memory, gradients data-parallel
reduce over ICI. Orders of magnitude more env-steps/s than the hosted loop.
"""

import argparse
import logging as log
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax
import jax.numpy as jnp
import optax

import magent_tpu as magent
from magent_tpu.builtin.config import battle
from magent_tpu.builtin.jax_model.a2c import A2CNet
from magent_tpu.builtin.jax_model.dqn import DQNNet
from magent_tpu.builtin.jax_model.drqn import DRQNNet
from magent_tpu.parallel import (VecGridWorld, init_drqn_hiddens,
                                 make_a2c_train_loop, make_dqn_train_loop,
                                 make_dqn_remat_train_loop,
                                 make_drqn_train_loop, make_eval_q,
                                 make_mesh, param_sharding,
                                 sample_eval_set, state_sharding)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--n_round", type=int, default=200,
                        help="train-step calls (each = rollout_len env steps)")
    parser.add_argument("--alg", default="dqn", choices=["dqn", "dqn_remat", "drqn", "a2c"])
    parser.add_argument("--map_size", type=int, default=64)
    parser.add_argument("--agents_per_side", type=int, default=64)
    parser.add_argument("--n_envs", type=int, default=16)
    parser.add_argument("--rollout_len", type=int, default=8)
    parser.add_argument("--train_minibatch", type=int, default=16384,
                        help="sampled transitions per gradient step "
                             "(0 = train on the full rollout; dqn only)")
    parser.add_argument("--target_update", type=int, default=40)
    parser.add_argument("--steps_per_call", type=int, default=10,
                        help="train steps fused per device call (lax.scan)")
    parser.add_argument("--name", type=str, default="battle-fused")
    parser.add_argument("--save_every", type=int, default=0,
                        help="checkpoint both groups every N rounds "
                             "(tfdqn_<round>.npz generations, the inputs "
                             "to scripts/tournament.py)")
    parser.add_argument("--dtype", default="f32", choices=["f32", "bf16"],
                        help="obs + net-trunk compute dtype (bf16 = the "
                             "bench configuration; params stay f32)")
    parser.add_argument("--eval_q_every", type=int, default=0,
                        help="log group-0 mean max-Q (online AND target "
                             "net) on a fixed eval observation set every N "
                             "rounds — the reference's eval-Q methodology "
                             "(utility.py:115-178, dqn.py:348-356); dqn "
                             "algs only")
    args = parser.parse_args()

    magent.utility.init_logger(args.name)

    dt = {"f32": None, "bf16": jnp.bfloat16}[args.dtype]
    venv = VecGridWorld(battle.get_config(args.map_size),
                        [args.agents_per_side, args.agents_per_side],
                        n_envs=args.n_envs, obs_dtype=dt)
    spec = venv.spec
    G = spec.n_groups

    net_cls = {"dqn": DQNNet, "dqn_remat": DQNNet, "drqn": DRQNNet,
               "a2c": A2CNet}[args.alg]
    nets = [net_cls(num_actions=spec.groups[g].type.n_action,
                    dtype=dt or jnp.float32)
            for g in range(G)]
    key = jax.random.PRNGKey(0)
    params = []
    for g in range(G):
        vh, vw, C = spec.view_space(g)
        F = spec.feature_size(g)
        dummy = [jnp.zeros((1, vh, vw, C), jnp.float32),
                 jnp.zeros((1, F), jnp.float32)]
        if args.alg == "drqn":
            dummy.insert(0, jnp.zeros((1, nets[g].state_size), jnp.float32))
        p = nets[g].init(jax.random.fold_in(key, g), *dummy)["params"]
        params.append(p)
    params = tuple(params)
    lr = 1e-3 if args.alg == "a2c" else 1e-4
    tx = optax.chain(optax.clip_by_global_norm(5.0), optax.adam(lr))
    opt_states = tuple(tx.init(p) for p in params)
    target_params = jax.tree.map(lambda x: x, params)

    if args.alg == "dqn":
        train_loop = make_dqn_train_loop(
            venv, nets, tx,
            steps_per_call=args.steps_per_call,
            target_update=args.target_update,
            rollout_len=args.rollout_len,
            train_minibatch=args.train_minibatch or None)
    elif args.alg == "dqn_remat":
        # the headline trainer (RESULTS.md): stores compact states, re-renders
        # observations inside the loss instead of carrying them in HBM
        train_loop = make_dqn_remat_train_loop(
            venv, nets, tx,
            steps_per_call=args.steps_per_call,
            target_update=args.target_update,
            rollout_len=args.rollout_len)
    elif args.alg == "drqn":
        train_loop = make_drqn_train_loop(
            venv, nets, tx,
            steps_per_call=args.steps_per_call,
            target_update=args.target_update,
            rollout_len=args.rollout_len)
    else:
        train_loop = make_a2c_train_loop(
            venv, nets, tx,
            steps_per_call=args.steps_per_call,
            rollout_len=args.rollout_len)

    mesh = make_mesh()
    env_state = jax.jit(venv.reset)(jax.random.PRNGKey(1))
    env_state = jax.device_put(env_state, state_sharding(mesh, env_state))
    params = jax.device_put(params, param_sharding(mesh, params))
    target_params = jax.device_put(target_params,
                                   param_sharding(mesh, target_params))
    opt_states = jax.device_put(opt_states, param_sharding(mesh, opt_states))
    hiddens = init_drqn_hiddens(venv, nets) if args.alg == "drqn" else None

    jitted = jax.jit(train_loop)
    step_key = jax.random.PRNGKey(2)

    from magent_tpu.builtin.jax_model.base import _flatten_pytree

    subclass = {"dqn": "tfdqn", "dqn_remat": "tfdqn", "drqn": "tfdrqn",
                "a2c": "tfa2c"}[args.alg]

    def save(epoch):
        for g, suffix in enumerate(["l", "r"]):
            savedir = os.path.join("save_model",
                                   "%s-%s" % (args.name, suffix))
            os.makedirs(savedir, exist_ok=True)
            path = os.path.join(savedir, "%s_%d.npz" % (subclass, epoch))
            np.savez(path, **_flatten_pytree(jax.device_get(params[g])))
        print("saved generation", epoch)

    print("alg:", args.alg, " devices:", len(jax.devices()),
          " envs:", args.n_envs, " agents/env:", 2 * args.agents_per_side)
    if args.save_every and args.save_every % args.steps_per_call:
        # saves fire on call boundaries; align rather than silently skip
        args.save_every = -(-args.save_every
                            // args.steps_per_call) * args.steps_per_call
        print("save_every rounded up to %d (steps_per_call boundary)"
              % args.save_every)
    if args.save_every:
        save(0)  # the untrained generation anchors the tournament
    evq = ev_views = ev_feats = None
    if args.eval_q_every and args.alg in ("dqn", "dqn_remat"):
        if args.eval_q_every % args.steps_per_call:
            args.eval_q_every = -(-args.eval_q_every
                                  // args.steps_per_call) * args.steps_per_call
            print("eval_q_every rounded up to %d" % args.eval_q_every)
        ev_views, ev_feats = sample_eval_set(venv, 0)
        evq = make_eval_q(venv, nets, 0)
    start = time.time()
    env_steps = 0
    n_calls = -(-args.n_round // args.steps_per_call)
    for c in range(n_calls):
        k = c * args.steps_per_call
        eps = magent.utility.piecewise_decay(
            k, [0, args.n_round // 3, args.n_round], [1, 0.2, 0.05])
        ck = jax.random.fold_in(step_key, c)
        if args.alg in ("dqn", "dqn_remat"):
            params, target_params, opt_states, env_state, metrics = jitted(
                params, target_params, opt_states, env_state, ck, eps,
                jnp.asarray(k))
        elif args.alg == "drqn":
            (params, target_params, opt_states, env_state, hiddens,
             metrics) = jitted(params, target_params, opt_states, env_state,
                               hiddens, ck, eps, jnp.asarray(k))
        else:
            params, opt_states, env_state, metrics = jitted(
                params, opt_states, env_state, ck)
        env_steps += args.rollout_len * args.n_envs * args.steps_per_call
        if (args.save_every
                and (k + args.steps_per_call) % args.save_every == 0):
            save(k + args.steps_per_call)
        if evq is not None and (k + args.steps_per_call) % args.eval_q_every == 0:
            q_on = float(evq(params, ev_views, ev_feats))
            q_tg = float(evq(target_params, ev_views, ev_feats))
            log.info("round %d\t evalq: %.4f\t targetq: %.4f"
                     % (k + args.steps_per_call, q_on, q_tg))
        if c % 2 == 0 or c == n_calls - 1:
            loss = np.asarray(metrics["loss"])[-1]
            rew = np.asarray(metrics["mean_reward"])[-1]
            dt = time.time() - start
            log.info("round %d\t loss: %s\t reward: %s\t env_steps/s: %.1f"
                     % (k, np.round(loss, 4).tolist(),
                        np.round(rew, 4).tolist(), env_steps / dt))

    dt = time.time() - start
    total_agents = 2 * args.agents_per_side
    print("trained %d env-steps (%.1fM agent-steps) in %.1fs -> %.1f "
          "agent-steps/s" % (env_steps, env_steps * total_agents / 1e6, dt,
                             env_steps * total_agents / dt))

    # final checkpoint, compatible with the hosted model loaders (labelled
    # with the ROUNDS ACTUALLY TRAINED — n_calls * steps_per_call — and
    # skipped when the in-loop save already wrote that generation)
    trained = n_calls * args.steps_per_call
    if not args.save_every:
        save(0)
    elif trained % args.save_every:
        save(trained)


if __name__ == "__main__":
    main()
