"""Mega-battle: one million agents stepping in lockstep on one chip.

The aggregate population is sharded over env instances (each env's channel
image must fit VMEM for the fast observation kernel; density matches the
reference's FPS sweep sizing map = sqrt(20*n), scripts/test/test_1m.py:66).
Over a device mesh the env batch additionally shards over ``dp``
(scripts/test/test_scaling.py).
"""

import argparse
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax
import jax.numpy as jnp

import magent_tpu as magent
from magent_tpu.parallel import VecGridWorld


def battle_cfg(map_size):
    gw = magent.gridworld
    cfg = gw.Config()
    cfg.set({"map_width": map_size, "map_height": map_size})
    cfg.set({"embedding_size": 10})
    small = cfg.register_agent_type(
        "small",
        {'width': 1, 'length': 1, 'hp': 10, 'speed': 2,
         'view_range': gw.CircleRange(6), 'attack_range': gw.CircleRange(1.5),
         'damage': 2, 'step_recover': 0.1,
         'step_reward': -0.005, 'kill_reward': 5, 'dead_penalty': -0.1,
         'attack_penalty': -0.1})
    g0 = cfg.add_group(small)
    g1 = cfg.add_group(small)
    a = gw.AgentSymbol(g0, index='any')
    b = gw.AgentSymbol(g1, index='any')
    cfg.add_reward_rule(gw.Event(a, 'attack', b), receiver=a, value=0.2)
    cfg.add_reward_rule(gw.Event(b, 'attack', a), receiver=b, value=0.2)
    return cfg


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--agents", type=int, default=1000000)
    parser.add_argument("--n_envs", type=int, default=64)
    parser.add_argument("--steps", type=int, default=16)
    parser.add_argument("--observe", action="store_true",
                        help="include observation rendering in the loop")
    parser.add_argument("--obs_dtype", default="f32", choices=["f32", "bf16"],
                        help="window store dtype (bf16 halves the ~3.4GB of "
                             "window writes per 1M-agent obs pass)")
    args = parser.parse_args()

    per_env = args.agents // args.n_envs
    map_size = int(math.sqrt(per_env * 20))
    print("%d envs x %d agents on %dx%d maps (%.2fM total)" %
          (args.n_envs, per_env, map_size, map_size,
           args.n_envs * per_env / 1e6))

    venv = VecGridWorld(battle_cfg(map_size), [per_env // 2, per_env // 2],
                        n_envs=args.n_envs,
                        obs_dtype={"f32": None, "bf16": jnp.bfloat16}[
                            args.obs_dtype])
    full_sink = any(getattr(o, "uses_banded", False)
                    for o in venv._observe1)

    def body(carry, _):
        state, key = carry
        key, akey = jax.random.split(key)
        s = 0.0
        if args.observe:
            for view, feat in venv.observe_all(state):
                # banded-path views MUST be consumed in full: their
                # slot-order restore is plain XLA (not an opaque Pallas
                # output), so a one-element sink lets DCE skip the unsort +
                # epilogue and overstate FPS (round-5 finding: the old
                # 2.21M 1x1M number was ~15% thinned)
                if full_sink:
                    s = s + jnp.sum(view.astype(jnp.float32))
                else:
                    s = s + jnp.sum(view[:, 0, 0, 0, 0])
        acts = venv.random_actions(akey)
        state, rew, alive, done = venv.transition(state, acts)
        return (state, key), s + jnp.sum(rew[:, 0])

    @jax.jit
    def run(state, key):
        (state, key), sink = jax.lax.scan(body, (state, key), None,
                                          length=args.steps)
        return state, key, jnp.sum(sink)

    state = jax.jit(venv.reset)(jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(1)
    t0 = time.perf_counter()
    state, key, sink = run(state, key)
    float(sink)
    print("compile+first run: %.1f s" % (time.perf_counter() - t0))

    t0 = time.perf_counter()
    state, key, sink = run(state, key)
    float(sink)
    dt = time.perf_counter() - t0

    agent_steps = args.steps * args.n_envs * (per_env // 2) * 2
    print(json.dumps({
        "metric": "mega_battle_agent_steps_per_s",
        "value": round(agent_steps / dt, 1),
        "unit": "agent-steps/s",
        "vs_baseline": round(agent_steps / dt / 1e7, 4),
    }))


if __name__ == "__main__":
    main()
