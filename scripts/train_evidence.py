"""Learning evidence for pursuit / gather / tiger on the fused trainer
(reference claim: README.md:57 trains pursuit, gathering and battle; battle
evidence lives in RESULTS.md already).

One fused double-DQN program per scenario (parallel/train.py) with scripted
(random-acting, untrained) groups where the reference uses RandomActor or
inert agents: pursuit trains BOTH groups (predators 2x2, prey faster),
gather trains the agent group against static food, tiger trains tigers
against randomly wandering deer (double-attack coordination rule).

After training, an eval phase runs greedy (eps=0.05) rollouts with the
TRAINED params and with the UNTRAINED init from the same seed, printing the
mean per-step trained-group reward for both — the trained/untrained gap is
the evidence.  Reward curves stream to the usual ``round k\t ...`` log.

Usage: python scripts/train_evidence.py --game pursuit --n_round 600
"""

import argparse
import logging as log
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def pursuit_setup(map_size):
    from magent_tpu.builtin.config import pursuit

    cfg = pursuit.get_config(map_size)
    n_pred = int(map_size * map_size * 0.0125)
    n_prey = int(map_size * map_size * 0.025)
    rng = np.random.RandomState(11)
    taken = set()
    preds, prey = [], []
    while len(preds) < n_pred:
        x = int(rng.randint(1, map_size - 3))
        y = int(rng.randint(1, map_size - 3))
        block = [(x + dx, y + dy) for dx in range(2) for dy in range(2)]
        if not any(c in taken for c in block):
            taken.update(block)
            preds.append([x, y, 0])
    while len(prey) < n_prey:
        x = int(rng.randint(1, map_size - 2))
        y = int(rng.randint(1, map_size - 2))
        if (x, y) not in taken:
            taken.add((x, y))
            prey.append([x, y, 0])
    # reference trains both groups (examples/train_pursuit.py:131-137)
    return cfg, [n_pred, n_prey], [preds, prey], (0, 1), 0


def gather_setup(map_size):
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "examples"))
    from train_gather import load_config

    cfg = load_config(map_size)
    cx = cy = map_size // 2

    def ring(out, frac, gap):
        half = int(map_size * frac) // 2
        for x in range(cx - half, cx + half + 1, gap):
            out += [[x, cy - half], [x, cy + half]]
        for y in range(cy - half, cy + half + 1, gap):
            out += [[cx - half, y], [cx + half, y]]

    players, food = [], []
    for frac, gap in [(0.9, 3), (0.8, 4), (0.7, 6)]:
        ring(players, frac, gap)
    for frac, gap in [(0.65, 10), (0.6, 10), (0.55, 10), (0.5, 4),
                      (0.45, 3), (0.4, 1), (0.3, 1)]:
        ring(food, frac, gap)
    for shrink in (2, 4, 6):
        ring(food, (map_size * 0.3 - shrink) / map_size, 1)
    food = [p for i, p in enumerate(dict.fromkeys(map(tuple, food)))]
    players = [p for p in dict.fromkeys(map(tuple, players))
               if p not in set(map(tuple, food))]
    # group 0 = food (inert, scripted), group 1 = agents (trained)
    return (cfg, [len(food), len(players)],
            [[list(p) for p in food], [list(p) for p in players]], (1,), 1)


def tiger_setup(map_size):
    from magent_tpu.builtin.config import double_attack

    cfg = double_attack.get_config(map_size)
    n_deer = int(map_size * map_size * 0.05)
    n_tiger = int(map_size * map_size * 0.01)
    # 1x1 bodies: device-side random placement (walls are border-only in
    # the lockstep reset; the reference also sprinkles interior walls,
    # which are obstacles only)
    return cfg, [n_deer, n_tiger], None, (1,), 1


SETUPS = {"pursuit": pursuit_setup, "gather": gather_setup,
          "tiger": tiger_setup}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--game", choices=sorted(SETUPS), required=True)
    ap.add_argument("--map_size", type=int, default=64)
    ap.add_argument("--n_envs", type=int, default=16)
    ap.add_argument("--n_round", type=int, default=600,
                    help="train-step calls (each = rollout_len env steps)")
    ap.add_argument("--rollout_len", type=int, default=8)
    ap.add_argument("--steps_per_call", type=int, default=10)
    ap.add_argument("--target_update", type=int, default=40)
    ap.add_argument("--eval_steps", type=int, default=200)
    ap.add_argument("--eval_every", type=int, default=0,
                    help="greedy-eval the live params every N rounds: a "
                         "per-generation strength curve (the non-battle "
                         "analog of scripts/tournament.py)")
    ap.add_argument("--save_every", type=int, default=0,
                    help="save each trained group's params every N rounds "
                         "to save_model/<name>-g<g>/tfdqn_<round>.npz — the "
                         "generations scripts/tournament_pursuit.py "
                         "cross-plays")
    ap.add_argument("--name", default=None,
                    help="checkpoint name prefix (default: evidence-<game>)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    import magent_tpu as magent
    from magent_tpu.builtin.jax_model.dqn import DQNNet
    from magent_tpu.parallel import (VecGridWorld, make_dqn_train_loop,
                                     make_eval_q, make_mesh, param_sharding,
                                     sample_eval_set, state_sharding)
    from magent_tpu.parallel.train import _egreedy_actions

    magent.utility.init_logger("evidence-%s" % args.game)
    cfg, caps, placements, train_groups, hero = SETUPS[args.game](
        args.map_size)
    venv = VecGridWorld(cfg, caps, n_envs=args.n_envs, placements=placements)
    spec = venv.spec
    G = spec.n_groups

    nets = [DQNNet(num_actions=spec.groups[g].type.n_action)
            for g in range(G)]
    key = jax.random.PRNGKey(0)
    params = []
    for g in range(G):
        if g not in train_groups:  # scripted: net never applied
            params.append({})
            continue
        vh, vw, C = spec.view_space(g)
        F = spec.feature_size(g)
        p = nets[g].init(jax.random.fold_in(key, g),
                         jnp.zeros((1, vh, vw, C), jnp.float32),
                         jnp.zeros((1, F), jnp.float32))["params"]
        params.append(p)
    params = tuple(params)
    init_params = jax.tree.map(lambda x: x, params)
    tx = optax.chain(optax.clip_by_global_norm(5.0), optax.adam(1e-4))
    opt_states = tuple(tx.init(p) for p in params)
    target_params = jax.tree.map(lambda x: x, params)

    train_loop = make_dqn_train_loop(
        venv, nets, tx, steps_per_call=args.steps_per_call,
        target_update=args.target_update, rollout_len=args.rollout_len,
        train_groups=train_groups)

    mesh = make_mesh()
    env_state = jax.jit(venv.reset)(jax.random.PRNGKey(1))
    env_state = jax.device_put(env_state, state_sharding(mesh, env_state))
    params = jax.device_put(params, param_sharding(mesh, params))
    target_params = jax.device_put(target_params,
                                   param_sharding(mesh, target_params))
    opt_states = jax.device_put(opt_states, param_sharding(mesh, opt_states))

    jitted = jax.jit(train_loop)
    step_key = jax.random.PRNGKey(2)
    print("game:", args.game, "caps:", caps, "train_groups:", train_groups)

    # ---- eval: greedy rollouts of a params snapshot (jitted once) ----
    def eval_reward(p):
        def body(carry, t):
            state, key = carry
            key, akey = jax.random.split(key)
            actions = _egreedy_actions(venv, nets, p, state, akey, 0.05,
                                       train_groups=train_groups)
            state, rewards, alive, done = venv.transition(state, actions)
            sl = slice(spec.groups[hero].offset,
                       spec.groups[hero].offset + spec.groups[hero].cap)
            return (state, key), jnp.mean(rewards[:, sl])

        state0 = venv.reset(jax.random.PRNGKey(9))
        (_, _), rews = jax.lax.scan(
            body, (state0, jax.random.PRNGKey(10)), None,
            length=args.eval_steps)
        return jnp.mean(rews)

    ev = jax.jit(eval_reward)
    # fixed eval observation set + mean max-Q on it (the reference's
    # sample_observation / eval-Q methodology, utility.py:115-178,
    # tf_model/dqn.py:348-356): online vs target Q on the SAME set
    # separates learning from replay-driven Q inflation.  Built only when
    # the eval loop will actually fire (the 10-step sampling rollout is a
    # real compile + device cost).
    if args.eval_every:
        ev_views, ev_feats = sample_eval_set(venv, hero)
        evq = make_eval_q(venv, nets, hero)
    curve = []
    for attr in ("eval_every", "save_every"):
        v = getattr(args, attr)
        if v and v % args.steps_per_call:
            # fires on call boundaries; align rather than silently skip
            v = -(-v // args.steps_per_call) * args.steps_per_call
            setattr(args, attr, v)
            print("%s rounded up to %d (steps_per_call boundary)"
                  % (attr, v))

    from magent_tpu.builtin.jax_model.base import _flatten_pytree
    ckpt_name = args.name or ("evidence-%s" % args.game)

    def save_generation(round_k, p):
        for g in train_groups:
            savedir = os.path.join("save_model", "%s-g%d" % (ckpt_name, g))
            os.makedirs(savedir, exist_ok=True)
            np.savez(os.path.join(savedir, "tfdqn_%d.npz" % round_k),
                     **_flatten_pytree(jax.device_get(p[g])))
        print("saved generation", round_k)

    if args.save_every:
        save_generation(0, params)  # the untrained anchor generation

    start = time.time()
    n_calls = -(-args.n_round // args.steps_per_call)
    for c in range(n_calls):
        k = c * args.steps_per_call
        eps = magent.utility.piecewise_decay(
            k, [0, args.n_round // 3, args.n_round], [1, 0.2, 0.05])
        params, target_params, opt_states, env_state, metrics = jitted(
            params, target_params, opt_states, env_state,
            jax.random.fold_in(step_key, c), eps, jnp.asarray(k))
        if c % 5 == 0 or c == n_calls - 1:
            loss = np.asarray(metrics["loss"])[-1]
            rew = np.asarray(metrics["mean_reward"])[-1]
            log.info("round %d\t loss: %s\t reward: %s\t elapsed: %.1fs"
                     % (k, np.round(loss, 4).tolist(),
                        np.round(rew, 4).tolist(), time.time() - start))
        gen = k + args.steps_per_call
        if args.save_every and gen % args.save_every == 0:
            save_generation(gen, params)
        if args.eval_every and gen % args.eval_every == 0:
            g_ev = float(ev(params))
            q_on = float(evq(params, ev_views, ev_feats))
            q_tg = float(evq(target_params, ev_views, ev_feats))
            curve.append((gen, g_ev))
            print("GEN %s round %d: eval=%.5f evalq=%.4f targetq=%.4f"
                  % (args.game, gen, g_ev, q_on, q_tg))
            log.info("generation %d\t eval: %.5f\t evalq: %.4f\t "
                     "targetq: %.4f" % (gen, g_ev, q_on, q_tg))

    if curve:
        print("GENERATION CURVE %s: %s"
              % (args.game, " ".join("%d:%.4f" % g for g in curve)))

    # ---- trained vs untrained init, same seeds ----
    trained = float(ev(params))
    untrained = float(ev(jax.device_put(init_params,
                                        param_sharding(mesh, init_params))))
    print("EVAL %s: trained=%.5f untrained=%.5f (mean per-agent per-step "
          "reward of group %d over %d greedy steps)"
          % (args.game, trained, untrained, hero, args.eval_steps))
    log.info("eval\t trained: %.5f\t untrained: %.5f" % (trained, untrained))


if __name__ == "__main__":
    main()
