"""Per-phase cost ladder at the FPS-sweep geometries (forest config,
reference protocol: map side sqrt(20*per_env), n/2 2x2 predators + n/2 prey
— scripts/test/test_1m.py).  The round-3 verdict asked which phase owns the
1e5 cliff (quad attack sweep vs sort fallback vs banded obs): this script
answers it with in-`lax.scan` timings on the real chip, the only reliable
method on the tunneled backend (CLAUDE.md).

Usage:
  python scripts/profile_sweep.py --agent_number 100000 --n_envs 16 \
      [variants ...]
Variants default to: full obs_only step_only attack_only move_only
grids_only.
"""

from __future__ import annotations

import argparse
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "test"))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/magent_tpu_jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

from test_1m import load_forest  # the sweep's config loader


def build_venv(agent_number, n_envs, no_walls=False):
    from magent_tpu.parallel import VecGridWorld

    per_env = max(agent_number // n_envs, 4)
    map_size = int(math.sqrt(per_env * 20))
    cfg = load_forest(map_size)
    n_pred = per_env // 2
    n_prey = per_env - n_pred
    n_wall = 0 if no_walls else per_env // 10
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
    print(f"map {map_size}x{map_size}, {n_envs} envs x {per_env} agents "
          f"(cap {venv.spec.n_agents_cap}), {n_wall} interior walls",
          flush=True)
    return venv, per_env, walls


def main():
    ap_ = argparse.ArgumentParser()
    ap_.add_argument("--agent_number", type=int, default=100000)
    ap_.add_argument("--n_envs", type=int, default=16)
    ap_.add_argument("--steps", type=int, default=16)
    ap_.add_argument("--calls", type=int, default=3)
    ap_.add_argument("--no_walls", action="store_true")
    ap_.add_argument("variants", nargs="*",
                     default=["full", "obs_only", "step_only", "attack_only",
                              "move_only", "grids_only"])
    args = ap_.parse_args()

    from magent_tpu.core import engine

    venv, per_env, walls = build_venv(args.agent_number, args.n_envs,
                                      args.no_walls)
    spec = venv.spec
    n_envs = args.n_envs
    state = jax.jit(venv.reset)(jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(1)
    total = per_env * n_envs

    def timed(name, body):
        @jax.jit
        def run(state, key):
            (state, key), sink = jax.lax.scan(
                body, (state, key), None, length=args.steps)
            return state, key, jnp.sum(sink)

        print(f"[{time.strftime('%H:%M:%S')}] compiling {name}...", flush=True)
        s, k, sink = run(state, key)
        float(sink)
        t0 = time.perf_counter()
        for _ in range(args.calls):
            s, k, sink = run(state, key)
        float(sink)
        dt = time.perf_counter() - t0
        ms = dt / (args.steps * args.calls) * 1e3
        rate = total * args.steps * args.calls / dt
        print(f"{name:14s} {ms:8.3f} ms/step   {rate/1e6:7.2f}M agent-steps/s",
              flush=True)
        return ms

    def sink_state(st):
        return (jnp.sum(st.hp[:, ::64]) + jnp.sum(st.x[:, ::64])
                + jnp.sum(st.next_reward[:, ::64]))

    which = args.variants

    # banded-path views must be consumed in full or DCE thins the XLA
    # unsort/epilogue and overstates obs throughput (same gating as
    # test_1m/test_mega)
    full_sink = any(getattr(o, "uses_banded", False) for o in venv._observe1)

    def view_sink(view, feat):
        if full_sink:
            return jnp.sum(view.astype(jnp.float32)) + jnp.sum(feat[:, 0, 0])
        return jnp.sum(view[:, :, 0, 0, 0]) + jnp.sum(feat[:, 0, 0])

    if "full" in which:
        def body(carry, _):
            state, key = carry
            key, akey = jax.random.split(key)
            s = 0.0
            for view, feat in venv.observe_all(state):
                s = s + view_sink(view, feat)
            actions = venv.random_actions(akey)
            state, rewards, alive, done = venv.transition(state, actions)
            return (state, key), s + jnp.sum(rewards[:, 0])
        timed("full", body)

    if "obs_only" in which:
        def body(carry, _):
            state, key = carry
            s = 0.0
            for view, feat in venv.observe_all(state):
                s = s + view_sink(view, feat)
            state = state.replace(hp=state.hp + 1e-6)
            return (state, key), s
        timed("obs_only", body)

    if "step_only" in which:
        def body(carry, _):
            state, key = carry
            key, akey = jax.random.split(key)
            actions = venv.random_actions(akey)
            state, rewards, alive, done = venv.transition(state, actions)
            return (state, key), jnp.sum(rewards[:, 0])
        timed("step_only", body)

    gridless = engine._gridless_capable(spec) and engine._use_quad(
        spec.n_agents_cap)
    print(f"engine path: gridless={gridless} "
          f"use_quad={engine._use_quad(spec.n_agents_cap)}", flush=True)

    if "attack_only" in which:
        def body(carry, _):
            state, key = carry
            key, akey, rkey = jax.random.split(key, 3)
            actions = venv.random_actions(akey)
            st = state.replace(last_action=actions)
            rank = jax.vmap(
                lambda k: jax.random.bits(k, (spec.n_agents_cap,))
            )(jax.random.split(rkey, n_envs))
            st = jax.vmap(lambda s, r: engine._attack_phase(
                spec, s, r, gridless=gridless))(st, rank)
            state = state.replace(hp=st.hp * 0.0 + state.hp,
                                  next_reward=st.next_reward)
            return (state, key), sink_state(st)
        timed("attack_only", body)

    wall_ctx = None
    if walls and gridless:
        # same packed wall-overlap grid the venv's own step uses
        wm = np.zeros((spec.height, spec.width), bool)
        wm[0, :] = wm[-1, :] = wm[:, 0] = wm[:, -1] = True
        wxy = np.asarray(walls, np.int32)
        wm[wxy[:, 1], wxy[:, 0]] = True
        code, s_bit = engine._wall_rect_code(spec, wm)
        wall_ctx = (jnp.asarray(code), jnp.asarray(s_bit))

    if "move_only" in which:
        def body(carry, _):
            state, key = carry
            key, akey = jax.random.split(key)
            actions = venv.random_actions(akey)
            st = state.replace(last_action=actions)
            st = jax.vmap(lambda s: engine._move_phase(
                spec, s, gridless=gridless, wall_ctx=wall_ctx))(st)
            state = state.replace(hp=st.hp * 0.0 + state.hp,
                                  next_reward=st.next_reward)
            return (state, key), sink_state(st)
        timed("move_only", body)

    grids_fn = getattr(venv._observe1[0], "grids_fn", None)
    if grids_fn is not None and "grids_only" in which:
        def body(carry, _):
            state, key = carry
            g = grids_fn(state)
            state = state.replace(hp=state.hp + 1e-6)
            return (state, key), jnp.sum(g[:, ::32, ::32].astype(jnp.float32))
        timed("grids_only", body)
    elif "grids_only" in which:
        print("grids_only: no grids_fn on this obs path", flush=True)


if __name__ == "__main__":
    main()
