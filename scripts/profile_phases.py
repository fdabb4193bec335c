"""Per-phase cost breakdown on the real chip (battle 2x1000, B=16).

Times scanned variants of the bench loop so each number reflects in-loop
compute (single dispatches cost ~25-30ms through the tunnel and mislead).
Usage: python scripts/profile_phases.py [variant ...]
Variants default to all of: full obs_only step_only attack_only move_only
grids_only render_only kernel_only rules_only.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/magent_tpu_jax_cache")

import jax
import jax.numpy as jnp

from magent_tpu.builtin.config import battle
from magent_tpu.core import engine, observe
from magent_tpu.parallel import VecGridWorld

N_PER_GROUP = 1000
MAP_SIZE = 200
N_ENVS = int(os.environ.get("BENCH_N_ENVS", "16"))
STEPS = int(os.environ.get("BENCH_STEPS", "64"))
CALLS = int(os.environ.get("BENCH_CALLS", "3"))


def timed(name, body, state, key):
    @jax.jit
    def run(state, key):
        (state, key), sink = jax.lax.scan(body, (state, key), None, length=STEPS)
        return state, key, jnp.sum(sink)

    print(f"[{time.strftime('%H:%M:%S')}] compiling {name}...", flush=True)
    s, k, sink = run(state, key)
    float(sink)
    print(f"[{time.strftime('%H:%M:%S')}] compiled {name}", flush=True)
    t0 = time.perf_counter()
    for _ in range(CALLS):
        s, k, sink = run(state, key)
    float(sink)
    dt = time.perf_counter() - t0
    ms = dt / (STEPS * CALLS) * 1e3
    rate = 2 * N_PER_GROUP * N_ENVS * STEPS * CALLS / dt
    print(f"{name:14s} {ms:7.3f} ms/step   {rate/1e6:7.2f}M agent-steps/s",
          flush=True)
    return ms


def main():
    which = sys.argv[1:] or [
        "full", "obs_only", "step_only", "attack_only", "move_only",
        "grids_only", "render_only", "kernel_only", "rules_only",
    ]
    cfg = battle.get_config(MAP_SIZE)
    venv = VecGridWorld(cfg, [N_PER_GROUP, N_PER_GROUP], n_envs=N_ENVS)
    spec = venv.spec
    state = jax.jit(venv.reset)(jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(1)

    def sink_state(state):
        return (
            jnp.sum(state.hp[:, ::64]) + jnp.sum(state.x[:, ::64])
            + jnp.sum(state.next_reward[:, ::64])
        )

    if "full" in which:
        def body(carry, _):
            state, key = carry
            key, akey = jax.random.split(key)
            obs_sum = 0.0
            for view, feat in venv.observe_all(state):
                obs_sum = obs_sum + jnp.sum(view[:, :, 0, 0, 0]) + jnp.sum(feat[:, 0, 0])
            actions = venv.random_actions(akey)
            state, rewards, alive, done = venv.transition(state, actions)
            return (state, key), obs_sum + jnp.sum(rewards[:, 0])
        timed("full", body, state, key)

    if "obs_only" in which:
        def body(carry, _):
            state, key = carry
            key, akey = jax.random.split(key)
            obs_sum = 0.0
            for view, feat in venv.observe_all(state):
                obs_sum = obs_sum + jnp.sum(view[:, :, 0, 0, 0]) + jnp.sum(feat[:, 0, 0])
            # mutate state trivially so scan can't hoist the obs
            state = state.replace(hp=state.hp + 1e-6)
            return (state, key), obs_sum
        timed("obs_only", body, state, key)

    if "step_only" in which:
        def body(carry, _):
            state, key = carry
            key, akey = jax.random.split(key)
            actions = venv.random_actions(akey)
            state, rewards, alive, done = venv.transition(state, actions)
            return (state, key), jnp.sum(rewards[:, 0])
        timed("step_only", body, state, key)

    if "attack_only" in which or "move_only" in which or "rules_only" in which:
        rules = spec.compiled_rules()

        def phase_body(phase):
            def body(carry, _):
                state, key = carry
                key, akey, rkey = jax.random.split(key, 3)
                actions = venv.random_actions(akey)
                st = state.replace(last_action=actions)
                rank = jax.vmap(
                    lambda k: jax.random.bits(k, (spec.n_agents_cap,))
                )(jax.random.split(rkey, N_ENVS))
                if phase == "attack":
                    st = jax.vmap(lambda s, r: engine._attack_phase(spec, s, r))(st, rank)
                elif phase == "move":
                    st = jax.vmap(lambda s: engine._move_phase(spec, s))(st)
                elif phase == "rules":
                    def rule_one(s):
                        nr, gr = s.next_reward, s.group_reward
                        for rule in rules:
                            nr, gr, _ = rule.apply(spec, s, nr, gr)
                        return s.replace(next_reward=nr, group_reward=gr)
                    st = jax.vmap(rule_one)(st)
                # keep positions/hp flowing without full transition
                state = state.replace(
                    hp=st.hp * 0.0 + state.hp, next_reward=st.next_reward
                )
                return (state, key), sink_state(st)
            return body

        if "attack_only" in which:
            timed("attack_only", phase_body("attack"), state, key)
        if "move_only" in which:
            timed("move_only", phase_body("move"), state, key)
        if "rules_only" in which:
            timed("rules_only", phase_body("rules"), state, key)

    grids_fn = getattr(venv._observe1[0], "grids_fn", None)
    if grids_fn is not None and "grids_only" in which:
        def body(carry, _):
            state, key = carry
            g = grids_fn(state)
            state = state.replace(hp=state.hp + 1e-6)
            return (state, key), jnp.sum(g[:, ::32, ::32].astype(jnp.float32))
        timed("grids_only", body, state, key)

    if grids_fn is not None and "render_only" in which:
        Hp, Wp, lanes, pad_y, pad_x = grids_fn.geometry

        def body(carry, _):
            state, key = carry
            g = grids_fn(state)
            s = 0.0
            for grp in range(spec.n_groups):
                img = observe._render_image(spec, grp, g, lanes)
                s = s + jnp.sum(img[:, ::32, ::128])
            state = state.replace(hp=state.hp + 1e-6)
            return (state, key), s
        timed("grids+render", body, state, key)

    if grids_fn is not None and "one_group" in which:
        def body(carry, _):
            state, key = carry
            view, feat = venv._observe1[0](state)
            state = state.replace(hp=state.hp + 1e-6)
            return (state, key), jnp.sum(view[:, :, 0, 0, 0]) + jnp.sum(feat[:, 0, 0])
        timed("one_group", body, state, key)

    if grids_fn is not None and "view_only" in which:
        # grids + render + window kernel (fused epilogue path) for BOTH
        # groups, but no minimap pooling / feature assembly: isolates the
        # kernel's in-loop cost from the rest of observe.  Window math comes
        # from observe.window_layout — the SAME code production uses.
        from magent_tpu.ops import window_gather as wg
        Hp, Wp, lanes, pad_y, pad_x = grids_fn.geometry
        layouts = [observe.window_layout(spec, grp, grids_fn.geometry)
                   for grp in range(spec.n_groups)]
        if all(lo["replica_ok"] for lo in layouts):
            def body(carry, _):
                state, key = carry
                g = grids_fn(state)
                s = 0.0
                for grp, lo in enumerate(layouts):
                    img = observe._render_image(spec, grp, g, lanes)
                    pos = lo["pos_fn"](state)
                    view = wg.window_gather4(
                        img, pos * 1024, lo["mask"], vh=lo["vh"], vw=lo["vw"],
                        C=spec.n_channel, Wp=Wp, chunk=lo["chunk"])
                    s = s + jnp.sum(view[:, :, 0, 0])
                state = state.replace(hp=state.hp + 1e-6)
                return (state, key), s
            timed("view_only", body, state, key)
        else:
            print("view_only: skipped (window_gather4 size constraints "
                  "not met for this geometry)")

    if grids_fn is not None and "kernel_only" in which:
        # full observe minus minimap work: compare spec with minimap off
        cfg2 = battle.get_config(MAP_SIZE)
        cfg2.set({"minimap_mode": False})
        venv2 = VecGridWorld(cfg2, [N_PER_GROUP, N_PER_GROUP], n_envs=N_ENVS)
        state2 = jax.jit(venv2.reset)(jax.random.PRNGKey(0))

        def body(carry, _):
            state, key = carry
            obs_sum = 0.0
            for view, feat in venv2.observe_all(state):
                obs_sum = obs_sum + jnp.sum(view[:, :, 0, 0, 0]) + jnp.sum(feat[:, 0, 0])
            state = state.replace(hp=state.hp + 1e-6)
            return (state, key), obs_sum
        timed("obs_nominimap", body, state2, key)


if __name__ == "__main__":
    main()
