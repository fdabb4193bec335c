"""Pursuit throughput (reference scale: examples/train_pursuit.py:18-20,109 —
one map-1000 world, predators = 1.25% of cells as 2x2 bodies, prey = 2.5%).

Modes:
- default: the shipped pursuit config (turn_mode off -> NORTH-only Pallas
  obs + gridless rect engine);
- ``--turn``: same geometry with turn_mode=True -> the stacked-rotations
  window-kernel path (core/observe._make_observe_rotating_kernel); compare
  against ``MAGENT_OBS_KERNEL=xla`` (the legacy per-direction gather) for
  the kernel-vs-XLA ratio.

Prints agent-steps/s over a jitted obs->act->step loop (one lax.scan).
"""

import argparse
import math
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def pursuit_config(map_size, turn):
    import magent_tpu as magent

    gw = magent.gridworld
    cfg = gw.Config()
    cfg.set({"map_width": map_size, "map_height": map_size})
    if turn:
        cfg.set({"turn_mode": True})
    predator = cfg.register_agent_type(
        "predator",
        {'width': 2, 'length': 2, 'hp': 1, 'speed': 1,
         'view_range': gw.CircleRange(5), 'attack_range': gw.CircleRange(2),
         'attack_penalty': -0.2})
    prey = cfg.register_agent_type(
        "prey",
        {'width': 1, 'length': 1, 'hp': 1, 'speed': 1.5,
         'view_range': gw.CircleRange(4), 'attack_range': gw.CircleRange(0)})
    g0 = cfg.add_group(predator)
    g1 = cfg.add_group(prey)
    a = gw.AgentSymbol(g0, index='any')
    b = gw.AgentSymbol(g1, index='any')
    cfg.add_reward_rule(gw.Event(a, 'attack', b), receiver=[a, b],
                        value=[1, -1])
    return cfg


def placements(map_size, n_pred, n_prey, turn, seed=5):
    import numpy as np

    rng = np.random.RandomState(seed)
    taken = set()
    preds, prey = [], []
    while len(preds) < n_pred:
        x = int(rng.randint(1, map_size - 3))
        y = int(rng.randint(1, map_size - 3))
        block = [(x + dx, y + dy) for dx in range(2) for dy in range(2)]
        if not any(c in taken for c in block):
            taken.update(block)
            preds.append([x, y, rng.randint(4) if turn else 0])
    while len(prey) < n_prey:
        x = int(rng.randint(1, map_size - 2))
        y = int(rng.randint(1, map_size - 2))
        if (x, y) not in taken:
            taken.add((x, y))
            prey.append([x, y, 0])
    return [preds, prey]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--map_size", type=int, default=1000)
    ap.add_argument("--n_envs", type=int, default=1)
    ap.add_argument("--n_step", type=int, default=20)
    ap.add_argument("--turn", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from magent_tpu.parallel import VecGridWorld

    m = args.map_size
    n_pred = int(m * m * 0.0125)
    n_prey = int(m * m * 0.025)
    cfg = pursuit_config(m, args.turn)
    venv = VecGridWorld(cfg, [n_pred, n_prey], n_envs=args.n_envs,
                        placements=placements(m, n_pred, n_prey, args.turn))

    def body(carry, _):
        state, key = carry
        key, akey = jax.random.split(key)
        s = 0.0
        for view, feat in venv.observe_all(state):
            s = s + jnp.sum(view[:, 0, 0, 0, 0])
        actions = venv.random_actions(akey)
        state, rewards, alive, done = venv.transition(state, actions)
        return (state, key), s + jnp.sum(rewards[:, 0])

    @jax.jit
    def run(state, key):
        (state, key), sink = jax.lax.scan(body, (state, key), None,
                                          length=args.n_step)
        return state, key, jnp.sum(sink)

    state = jax.jit(venv.reset)(jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(1)
    state, key, sink = run(state, key)
    float(sink)  # compile + warm up

    start = time.time()
    state, key, sink = run(state, key)
    float(sink)
    dt = time.time() - start
    per_env = n_pred + n_prey
    steps = args.n_step * args.n_envs
    print("pursuit%s map %d, %d envs x %d agents (obs_kernel=%s)"
          % (" TURN" if args.turn else "", m, args.n_envs, per_env,
             os.environ.get("MAGENT_OBS_KERNEL", "auto")))
    print("agent-steps/s %.1f" % (steps * per_env / dt))


if __name__ == "__main__":
    main()
