"""Scaling-efficiency harness: env-steps/s of the fused env loop at
1..N devices with the env batch sharded over the ``dp`` mesh axis.

On a real multi-chip TPU slice this measures the 1->N scaling efficiency
(north-star target: >= 80%).  On a single-chip or CPU host it runs against
virtual devices (JAX_PLATFORMS=cpu + jax_num_cpu_devices), which validates
the sharded program end-to-end; the printed efficiency is then only
indicative (virtual devices share the same cores).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--map_size", type=int, default=200)
    parser.add_argument("--agents_per_env", type=int, default=2000)
    parser.add_argument("--envs_per_device", type=int, default=8)
    parser.add_argument("--steps", type=int, default=32)
    parser.add_argument("--max_devices", type=int, default=0,
                        help="0 = all available")
    parser.add_argument("--virtual", type=int, default=0,
                        help="force N virtual CPU devices")
    args = parser.parse_args()

    import jax

    if args.virtual:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", args.virtual)

    import jax.numpy as jnp

    from magent_tpu.builtin.config import battle
    from magent_tpu.parallel import VecGridWorld, make_mesh, state_sharding

    n_dev_all = len(jax.devices())
    max_dev = args.max_devices or n_dev_all
    per_group = args.agents_per_env // 2

    results = []
    n = 1
    while n <= max_dev:
        venv = VecGridWorld(
            battle.get_config(args.map_size), [per_group, per_group],
            n_envs=args.envs_per_device * n,
        )

        def body(carry, _):
            state, key = carry
            key, akey = jax.random.split(key)
            s = 0.0
            for view, feat in venv.observe_all(state):
                s = s + jnp.sum(view[:, 0, 0, 0, 0])
            acts = venv.random_actions(akey)
            state, rew, alive, done = venv.transition(state, acts)
            return (state, key), s + jnp.sum(rew[:, 0])

        @jax.jit
        def run(state, key):
            (state, key), sink = jax.lax.scan(body, (state, key), None,
                                              length=args.steps)
            return state, key, jnp.sum(sink)

        mesh = make_mesh(n, tp=1)
        state = venv.reset(jax.random.PRNGKey(0))
        state = jax.device_put(state, state_sharding(mesh, state))
        key = jax.random.PRNGKey(1)

        state, key, sink = run(state, key)
        float(sink)  # compile+warm
        t0 = time.perf_counter()
        state, key, sink = run(state, key)
        float(sink)
        dt = time.perf_counter() - t0

        env_steps = args.steps * venv.n_envs
        agent_steps = env_steps * args.agents_per_env
        results.append(dict(devices=n, env_steps_per_s=env_steps / dt,
                            agent_steps_per_s=agent_steps / dt))
        print(json.dumps(results[-1]))
        n *= 2

    if len(results) > 1:
        base = results[0]["env_steps_per_s"]
        last = results[-1]
        eff = last["env_steps_per_s"] / (base * last["devices"])
        print(json.dumps({
            "metric": "scaling_efficiency_1_to_%d" % last["devices"],
            "value": round(eff, 4),
            "unit": "fraction",
            "vs_baseline": round(eff / 0.8, 4),
        }))


if __name__ == "__main__":
    main()
