"""Throughput test with random agents, up to one million
(parity with reference scripts/test/test_1m.py: forest config sized
sqrt(20*n), random/DQN actors, per-phase timing, FPS after 20 warm-up
steps).

Two modes:
- default: the reference-style host loop over the stateful API (each phase
  is a separate device call — dominated by per-call latency on the tunneled
  TPU backend, comparable to the reference's ctypes loop on CPU);
- ``--vectorized``: the TPU-native path — the whole
  obs→act→step→reward→clear loop fused in one jitted program over an env
  batch (this is the number that matters on TPU).
"""

import argparse
import math
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
import magent_tpu as magent
from magent_tpu.builtin.rule_model import RandomActor


def load_forest(map_size):
    gw = magent.gridworld
    cfg = gw.Config()

    cfg.set({"map_width": map_size, "map_height": map_size})

    predator = cfg.register_agent_type(
        "predator",
        {'width': 2, 'length': 2, 'hp': 1, 'speed': 1,
         'view_range': gw.CircleRange(5), 'attack_range': gw.CircleRange(2),
         'attack_penalty': -0.2})

    prey = cfg.register_agent_type(
        "prey",
        {'width': 1, 'length': 1, 'hp': 1, 'speed': 1.5,
         'view_range': gw.CircleRange(4), 'attack_range': gw.CircleRange(0)})

    predator_group = cfg.add_group(predator)
    prey_group = cfg.add_group(prey)

    a = gw.AgentSymbol(predator_group, index='any')
    b = gw.AgentSymbol(prey_group, index='any')

    cfg.add_reward_rule(gw.Event(a, 'attack', b), receiver=[a, b], value=[1, -1])
    return cfg


class PhaseClock:
    """Accumulates wall time per named phase and prints a one-line summary
    per step (protocol contract: the reference harness times each phase of
    the host loop individually, reference scripts/test/test_1m.py:45-49)."""

    def __init__(self):
        self.totals = {}
        self.current = {}

    def __call__(self, phase, fn, *a):
        t0 = time.time()
        out = fn(*a)
        dt = time.time() - t0
        self.current[phase] = self.current.get(phase, 0.0) + dt
        self.totals[phase] = self.totals.get(phase, 0.0) + dt
        return out

    def flush(self):
        line = "  ".join("%s=%.4f" % kv for kv in self.current.items())
        self.current = {}
        return line


# protocol constants (reference scripts/test/test_1m.py): 20 warm-up steps
# before measurement; DQN mode uses one 100000-wide inference batch
WARMUP_STEPS = 20
DQN_INFER_BATCH = 100000


def run_host_loop(args):
    """Reference-style stateful-API loop: every phase is a separate device
    call, so on the tunneled TPU backend this measures per-call dispatch
    latency plus compute — comparable to the reference's ctypes loop."""
    n = args.agent_number
    env = magent.GridWorld(load_forest(int(math.sqrt(n * 20))))
    env.reset()
    groups = env.get_handles()
    env.add_walls(method="random", n=n // 10)
    for h in groups:
        env.add_agents(h, method="random", n=n // 2)

    names = ("deer", "tiger")
    if args.num_gpu == 0:
        actors = [RandomActor(env, h, nm) for h, nm in zip(groups, names)]
    else:
        from magent_tpu.builtin.jax_model import DeepQNetwork
        actors = [DeepQNetwork(env, h, nm, infer_batch_size=DQN_INFER_BATCH,
                               num_gpu=args.num_gpu)
                  for h, nm in zip(groups, names)]

    for h in groups:
        print("view_space", env.get_view_space(h))

    clock = PhaseClock()
    reward_sum = 0.0
    measured = 0.0
    measured_steps = 0
    done = False

    for i in range(args.n_step + WARMUP_STEPS):
        t0 = time.time()
        for h, actor, nm in zip(groups, actors, names):
            obs = clock("obs:" + nm, env.get_observation, h)
            acts = clock("act:" + nm, actor.infer_action, obs, None)
            clock("set:" + nm, env.set_action, h, acts)
        done = clock("step", env.step)
        rewards = clock("reward", env.get_reward, groups[1])
        reward_sum += float(sum(rewards))
        clock("clear", env.clear_dead)

        dt = time.time() - t0
        if i >= WARMUP_STEPS:
            measured += dt
            measured_steps += 1
        alive = [env.get_num(h) for h in groups]
        print("step %d  %.3fs  alive=%s  reward_sum=%.0f" %
              (i, dt, alive, reward_sum))
        print("  " + clock.flush())
        if done:
            print("episode ended")
            break

    print("phase totals: " +
          "  ".join("%s=%.3f" % kv for kv in sorted(clock.totals.items())))
    if measured_steps:
        print("FPS", measured_steps * n / measured)
    else:
        print("episode ended during warm-up; no FPS measured")


def run_vectorized(args):
    import jax
    import jax.numpy as jnp
    from magent_tpu.parallel import VecGridWorld

    import numpy as np

    agent_number = args.agent_number
    n_envs = args.n_envs
    per_env = max(agent_number // n_envs, 4)
    map_size = int(math.sqrt(per_env * 20))
    cfg = load_forest(map_size)
    # host-side placements matching the reference protocol's population mix
    # (test_1m.py:70-74: n/10 random interior walls first, then n/2
    # predators + n/2 prey, both placed at random): walls rejection-sampled
    # on free cells, 2x2 predators as free 2x2 blocks, 1x1 prey on free
    # cells (identical layout per lockstep env instance; walls become a
    # compile-time constant of the step — engine._wall_rect_code).
    # ``--no_walls`` reproduces the wall-free layouts of rounds 2-4.
    n_pred = per_env // 2
    n_prey = per_env - n_pred
    n_wall = 0 if args.no_walls else per_env // 10
    rng = np.random.RandomState(7)
    taken = set()
    walls = []
    while len(walls) < n_wall:
        x = int(rng.randint(1, map_size - 1))
        y = int(rng.randint(1, map_size - 1))
        if (x, y) not in taken:
            taken.add((x, y))
            walls.append([x, y])
    preds = []
    while len(preds) < n_pred:
        x = int(rng.randint(1, map_size - 3))
        y = int(rng.randint(1, map_size - 3))
        block = [(x + dx, y + dy) for dx in range(2) for dy in range(2)]
        if not any(c in taken for c in block):
            taken.update(block)
            preds.append([x, y, 0])
    prey = []
    while len(prey) < n_prey:
        x = int(rng.randint(1, map_size - 2))
        y = int(rng.randint(1, map_size - 2))
        if (x, y) not in taken:
            taken.add((x, y))
            prey.append([x, y, 0])
    venv = VecGridWorld(cfg, [n_pred, n_prey], n_envs=n_envs,
                        placements=[preds, prey],
                        walls=walls if walls else None)

    # banded-path views must be consumed in full: their slot-order restore
    # is plain XLA (not an opaque Pallas output), so a one-element sink
    # lets DCE skip the unsort + epilogue and overstate FPS
    full_sink = any(getattr(o, "uses_banded", False) for o in venv._observe1)

    def body(carry, _):
        state, key = carry
        key, akey = jax.random.split(key)
        s = 0.0
        for view, feat in venv.observe_all(state):
            if full_sink:
                s = s + jnp.sum(view.astype(jnp.float32))
            else:
                s = s + jnp.sum(view[:, 0, 0, 0, 0])
        actions = venv.random_actions(akey, fast=args.fast_rand)
        state, rewards, alive, done = venv.transition(state, actions)
        return (state, key), s + jnp.sum(rewards[:, 0])

    @jax.jit
    def run(state, key):
        # --unroll amortizes per-iteration scan overhead at tiny scales
        # (CLAUDE.md: ~50% loop overhead on small bodies)
        (state, key), sink = jax.lax.scan(body, (state, key), None,
                                          length=args.n_step,
                                          unroll=args.unroll)
        return state, key, jnp.sum(sink)

    state = jax.jit(venv.reset)(jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(1)
    state, key, sink = run(state, key)
    float(sink)  # compile + warm up

    start = time.time()
    state, key, sink = run(state, key)
    float(sink)
    dt = time.time() - start
    steps = args.n_step * n_envs
    print("map %dx%d, %d envs x %d agents" % (map_size, map_size, n_envs, per_env))
    print("env-steps/s %.1f" % (steps / dt))
    print("FPS %.1f" % (steps * per_env / dt))


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--n_step", type=int, default=20)
    parser.add_argument("--agent_number", type=int, default=1000)
    parser.add_argument("--num_gpu", type=int, default=0)
    parser.add_argument("--n_envs", type=int, default=16)
    parser.add_argument("--unroll", type=int, default=1)
    parser.add_argument("--vectorized", action="store_true")
    parser.add_argument("--fast_rand", action="store_true",
                        help="counter-based uniform actions instead of "
                             "threefry (vec_env.random_actions fast=True); "
                             "the threefry bits are a fixed cost small "
                             "programs cannot overlap")
    parser.add_argument("--no_walls", action="store_true",
                        help="omit the protocol's n/10 interior walls "
                             "(rounds 2-4 measured this layout)")
    parser.add_argument("--frame", default="jax", choices=["jax", "tf", "mx"])
    args = parser.parse_args()

    if args.vectorized:
        run_vectorized(args)
    else:
        run_host_loop(args)
