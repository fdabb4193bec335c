"""Throughput benchmark: battle, 2x1000 agents (the BASELINE.json headline).

Measures agent-steps/s of the full environment loop — observation rendering
for both groups + random policy + step + reward extraction — fused into one
jitted ``lax.scan`` over a batch of lockstep envs on one chip (the reference
protocol steps random actors and counts agent-steps/total_time, reference:
scripts/test/test_1m.py:95-129).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
``vs_baseline`` is value / 10M agent-steps/s — the multi-host north-star
target from BASELINE.md (the reference publishes no single-chip number).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/magent_tpu_jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

from magent_tpu.builtin.config import battle
from magent_tpu.parallel import VecGridWorld

N_PER_GROUP = 1000
MAP_SIZE = 200  # reference sweep sizing: side = sqrt(20 * n_agents)
N_ENVS = int(os.environ.get("BENCH_N_ENVS", "16"))
STEPS_PER_CALL = int(os.environ.get("BENCH_STEPS", "64"))
TIMED_CALLS = int(os.environ.get("BENCH_CALLS", "3"))


def main():
    cfg = battle.get_config(MAP_SIZE)
    # obs stay f32 (the parity dtype): a bf16 window store is ~19% faster
    # standalone but buys nothing here — the store DMA already overlaps the
    # engine-step compute that follows (measured 11.07M vs 11.02M).  bf16
    # obs pay off where view TRAJECTORIES hit HBM (scripts/bench_train.py)
    venv = VecGridWorld(cfg, [N_PER_GROUP, N_PER_GROUP], n_envs=N_ENVS)
    spec = venv.spec

    def body(carry, _):
        state, key = carry
        key, akey = jax.random.split(key)
        # observation rendering for both groups is part of the measured loop
        # per-agent slice: depends on every agent's window without imposing
        # a pathological layout on the kernel output (a full-view consumer
        # like the DQN reads it once; a scalar slice makes XLA copy 75MB
        # into the slice fusion's preferred layout)
        obs_sum = 0.0
        for view, feat in venv.observe_all(state):
            obs_sum = obs_sum + jnp.sum(view[:, :, 0, 0, 0]) + jnp.sum(feat[:, 0, 0])
        actions = venv.random_actions(akey)
        state, rewards, alive, done = venv.transition(state, actions)
        return (state, key), obs_sum + jnp.sum(rewards[:, 0])

    @jax.jit
    def run(state, key):
        (state, key), sink = jax.lax.scan(
            body, (state, key), None, length=STEPS_PER_CALL
        )
        return state, key, jnp.sum(sink)

    # jit the reset: run eagerly it dispatches every primitive through the
    # device tunnel (~minutes of round-trips); jitted it is one program
    state = jax.jit(venv.reset)(jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(1)

    # warm-up (compile); fetch the value to force real completion — through
    # the axon tunnel block_until_ready returns before remote execution ends
    state, key, sink = run(state, key)
    float(sink)

    t0 = time.perf_counter()
    for _ in range(TIMED_CALLS):
        state, key, sink = run(state, key)
    float(sink)
    dt = time.perf_counter() - t0

    agent_steps = 2 * N_PER_GROUP * N_ENVS * STEPS_PER_CALL * TIMED_CALLS
    value = agent_steps / dt
    print(json.dumps({
        "metric": "battle_2x1000_agent_steps_per_s",
        "value": round(value, 1),
        "unit": "agent-steps/s",
        "vs_baseline": round(value / 1e7, 4),
    }))


if __name__ == "__main__":
    main()
