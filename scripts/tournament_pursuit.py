"""Cross-play tournament between pursuit generations — the non-battle
analog of scripts/tournament.py (reference methodology:
scripts/tournament.py:15-66, adapted to an asymmetric game).

Pursuit trains BOTH groups (predators and prey, train_evidence.py), so a
"pairing" here is predators of generation i hunting prey of generation j:
the full i x j cross-play matrix is scored by the mean per-step predator
reward (catch shaping) over ``--eval_steps`` near-greedy steps of
``--n_envs`` lockstep games.  Standings rank predator generations by mean
catch across every prey generation, and prey generations by mean evasion
(negative catch against them).

Inputs are the generations train_evidence.py saves with --save_every:
save_model/<name>-g0/tfdqn_<k>.npz (predators) and <name>-g1 (prey).

Usage:
  python scripts/train_evidence.py --game pursuit --n_round 2000 \
      --save_every 250 --name pursuit-gen
  python scripts/tournament_pursuit.py --name pursuit-gen
"""

import argparse
import os
import re
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/magent_tpu_jax_cache")

import numpy as np


def list_generations(savedir, name):
    pat = re.compile(r"tfdqn_(\d+)\.npz")
    gens = sorted(int(m.group(1))
                  for f in os.listdir(os.path.join(savedir, name))
                  if (m := pat.match(f)))
    return gens


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--name", default="pursuit-gen")
    ap.add_argument("--savedir", default="save_model")
    ap.add_argument("--map_size", type=int, default=64)
    ap.add_argument("--n_envs", type=int, default=16)
    ap.add_argument("--eval_steps", type=int, default=200)
    ap.add_argument("--eps", type=float, default=0.05)
    ap.add_argument("--pick_every", type=int, default=1)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from magent_tpu.builtin.jax_model.base import _unflatten_pytree
    from magent_tpu.builtin.jax_model.dqn import DQNNet
    from magent_tpu.parallel import VecGridWorld
    from magent_tpu.parallel.train import _egreedy_actions
    from train_evidence import pursuit_setup

    cfg, caps, placements, train_groups, hero = pursuit_setup(args.map_size)
    venv = VecGridWorld(cfg, caps, n_envs=args.n_envs, placements=placements)
    spec = venv.spec
    nets = [DQNNet(num_actions=spec.groups[g].type.n_action)
            for g in range(spec.n_groups)]

    def load_gen(g, k):
        path = os.path.join(args.savedir, "%s-g%d" % (args.name, g),
                            "tfdqn_%d.npz" % k)
        with np.load(path) as z:
            return _unflatten_pytree(dict(z))

    gens = [list_generations(args.savedir, "%s-g%d" % (args.name, g))
            for g in train_groups]
    common = sorted(set(gens[0]) & set(gens[1]))[:: args.pick_every]
    print("generations:", common)
    if len(common) < 2:
        print("need at least two saved generations (train_evidence.py "
              "--save_every)")
        return

    hero_sl = slice(spec.groups[hero].offset,
                    spec.groups[hero].offset + spec.groups[hero].cap)

    def catch_rate(params, key):
        """Mean per-step predator reward over a near-greedy rollout."""
        def body(carry, t):
            state, k = carry
            k, akey = jax.random.split(k)
            actions = _egreedy_actions(venv, nets, params, state, akey,
                                       args.eps, train_groups=train_groups)
            state, rewards, alive, done = venv.transition(state, actions)
            return (state, k), jnp.mean(rewards[:, hero_sl])

        state0 = venv.reset(jax.random.PRNGKey(9))
        (_, _), rews = jax.lax.scan(body, (state0, key), None,
                                    length=args.eval_steps)
        return jnp.mean(rews)

    jitted = jax.jit(catch_rate)
    matrix = np.zeros((len(common), len(common)))
    for i, kp in enumerate(common):
        pred = load_gen(0, kp)
        for j, ky in enumerate(common):
            prey = load_gen(1, ky)
            score = float(jitted((pred, prey), jax.random.PRNGKey(3)))
            matrix[i, j] = score
            print("pred gen %6d vs prey gen %6d -> catch %.4f"
                  % (kp, ky, score), flush=True)

    print("\ncatch matrix (rows: predator gen, cols: prey gen):")
    header = "          " + "  ".join("%8d" % k for k in common)
    print(header)
    for i, kp in enumerate(common):
        print("%8d  " % kp + "  ".join("%8.4f" % v for v in matrix[i]))

    print("\n===== predator standings (mean catch across prey gens) =====")
    for i in np.argsort(-matrix.mean(axis=1)):
        print("gen %6d : %.4f" % (common[i], matrix[i].mean()))
    print("\n===== prey standings (mean evasion = -catch against) =====")
    for j in np.argsort(matrix.mean(axis=0)):
        print("gen %6d : %.4f" % (common[j], -matrix[:, j].mean()))


if __name__ == "__main__":
    main()
