"""Multi-host / multi-process launcher: the whole sim(+train) program as one
SPMD jit over a global device mesh coordinated by ``jax.distributed``.

The reference documents deploying its model subprocesses to other machines by
swapping a named pipe for a socket (reference: doc/get_started.md:89) but
ships no launcher and no test.  Here scale-out is the JAX-native story:

- every host runs THIS script with the same arguments plus its
  ``--proc_id``; ``jax.distributed.initialize`` wires the cluster;
- the global mesh spans every host's devices; the env batch is sharded over
  the mesh's ``dp`` axis, so each device steps its own env slice and XLA
  inserts the cross-host collectives (gradient psums ride ICI within a
  slice, DCN between slices);
- with no ``--proc_id``, the script *launches* ``--nproc`` local worker
  processes (virtual CPU devices via ``--cpu_devices_per_proc``) — the
  one-machine test rig for the multi-host path, also used by
  tests/test_multihost.py.

Throughput methodology (for the >= 80% scaling-efficiency target): run with
``--nproc 1`` then ``--nproc N`` at the same per-process env count
(weak scaling); efficiency = agg_throughput(N) / (N * agg_throughput(1)).
Process 0 prints one JSON line with the aggregate agent-steps/s.
"""

from __future__ import annotations

import argparse
import json
import os
import socket
import subprocess
import sys
import time


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--nproc", type=int, default=2)
    p.add_argument("--proc_id", type=int, default=None,
                   help="worker rank; omit to run the local launcher")
    p.add_argument("--coordinator", type=str, default=None,
                   help="host:port of rank 0 (auto for local launches)")
    p.add_argument("--cpu_devices_per_proc", type=int, default=0,
                   help="force N virtual CPU devices per process (test rig); "
                        "0 = use the real platform devices")
    p.add_argument("--mode", choices=["env", "train"], default="env")
    p.add_argument("--map_size", type=int, default=64)
    p.add_argument("--agents_per_side", type=int, default=64)
    p.add_argument("--envs_per_device", type=int, default=2)
    p.add_argument("--steps", type=int, default=64)
    p.add_argument("--calls", type=int, default=3)
    p.add_argument("--rollout_len", type=int, default=8)
    return p.parse_args(argv)


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def launch_local(args):
    """Spawn --nproc worker copies of this script on this machine."""
    coord = "127.0.0.1:%d" % _free_port()
    procs = []
    for rank in range(args.nproc):
        cmd = [sys.executable, os.path.abspath(__file__),
               "--proc_id", str(rank), "--coordinator", coord]
        for flag in ("nproc", "cpu_devices_per_proc", "map_size",
                     "agents_per_side", "envs_per_device", "steps", "calls",
                     "rollout_len"):
            cmd += ["--" + flag, str(getattr(args, flag))]
        cmd += ["--mode", args.mode]
        procs.append(subprocess.Popen(cmd))
    # poll rather than wait in launch order: a crashed worker leaves the
    # survivors blocked in a cross-process collective, so the first nonzero
    # exit must kill the rest instead of hanging the launcher
    rc = [None] * len(procs)
    while any(r is None for r in rc):
        time.sleep(0.2)
        for i, p in enumerate(procs):
            if rc[i] is None:
                rc[i] = p.poll()
        if any(r not in (None, 0) for r in rc):
            for i, p in enumerate(procs):
                if rc[i] is None:
                    p.kill()
                    rc[i] = p.wait()
            break
    if any(rc):
        raise SystemExit("worker failed: rcs=%s" % rc)


def worker(args):
    if args.cpu_devices_per_proc:
        # strip any inherited device-count flag (the LAST occurrence wins)
        kept = [f for f in os.environ.get("XLA_FLAGS", "").split()
                if not f.startswith("--xla_force_host_platform_device_count")]
        kept.append("--xla_force_host_platform_device_count=%d"
                    % args.cpu_devices_per_proc)
        os.environ["XLA_FLAGS"] = " ".join(kept)
        os.environ["JAX_PLATFORMS"] = "cpu"

    import jax

    jax.distributed.initialize(
        coordinator_address=args.coordinator,
        num_processes=args.nproc,
        process_id=args.proc_id,
    )
    import jax.numpy as jnp

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from magent_tpu.builtin.config import battle
    from magent_tpu.parallel import (VecGridWorld, make_mesh, state_sharding)

    n_devices = len(jax.devices())
    n_envs = args.envs_per_device * n_devices
    venv = VecGridWorld(
        battle.get_config(args.map_size),
        [args.agents_per_side, args.agents_per_side],
        n_envs=n_envs,
    )
    mesh = make_mesh()  # over ALL global devices

    key = jax.random.PRNGKey(0)
    shapes = jax.eval_shape(venv.reset, key)
    out_sh = state_sharding(mesh, shapes)
    state = jax.jit(venv.reset, out_shardings=out_sh)(key)

    if args.mode == "env":
        def body(carry, _):
            state, key = carry
            key, akey = jax.random.split(key)
            actions = venv.random_actions(akey)
            state, rewards, alive, done = venv.transition(state, actions)
            return (state, key), jnp.sum(rewards)

        @jax.jit
        def run(state, key):
            (state, key), sink = jax.lax.scan(
                body, (state, key), None, length=args.steps)
            return state, key, jnp.sum(sink)

        loop_key = jax.random.PRNGKey(1)
        state, loop_key, sink = run(state, loop_key)
        float(sink)  # force completion
        t0 = time.perf_counter()
        for _ in range(args.calls):
            state, loop_key, sink = run(state, loop_key)
        float(sink)
        dt = time.perf_counter() - t0
        steps_done = args.steps * args.calls
    else:  # fused DQN training over the global mesh
        import optax
        from magent_tpu.builtin.jax_model.dqn import DQNNet
        from magent_tpu.parallel import (make_dqn_train_loop, param_sharding)

        spec = venv.spec
        nets = [DQNNet(num_actions=spec.groups[g].type.n_action)
                for g in range(2)]
        params = []
        for g in range(2):
            vh, vw, C = spec.view_space(g)
            F = spec.feature_size(g)
            params.append(nets[g].init(
                jax.random.fold_in(key, g),
                jnp.zeros((1, vh, vw, C), jnp.float32),
                jnp.zeros((1, F), jnp.float32))["params"])
        params = tuple(params)
        tx = optax.adam(1e-4)
        opts = tuple(tx.init(p) for p in params)
        tgt = jax.tree.map(lambda x: x, params)
        params = jax.device_put(params, param_sharding(mesh, params))
        tgt = jax.device_put(tgt, param_sharding(mesh, tgt))
        opts = jax.device_put(opts, param_sharding(mesh, opts))

        loop = jax.jit(make_dqn_train_loop(
            venv, nets, tx, steps_per_call=2, target_update=40,
            rollout_len=args.rollout_len))
        lk = jax.random.PRNGKey(2)
        params, tgt, opts, state, metrics = loop(
            params, tgt, opts, state, lk, 0.5, jnp.asarray(0))
        float(jnp.sum(metrics["loss"]))
        t0 = time.perf_counter()
        for c in range(args.calls):
            params, tgt, opts, state, metrics = loop(
                params, tgt, opts, state, jax.random.fold_in(lk, c), 0.5,
                jnp.asarray(2 * (c + 1)))
        float(jnp.sum(metrics["loss"]))
        dt = time.perf_counter() - t0
        steps_done = 2 * args.rollout_len * args.calls

    agents = 2 * args.agents_per_side
    agg = n_envs * agents * steps_done / dt
    if args.proc_id == 0:
        print(json.dumps({
            "mode": args.mode,
            "nproc": args.nproc,
            "n_devices": n_devices,
            "n_envs": n_envs,
            "agent_steps_per_s": round(agg, 1),
        }), flush=True)


def main():
    args = parse_args()
    if args.proc_id is None:
        launch_local(args)
    else:
        assert args.coordinator, "--coordinator required with --proc_id"
        worker(args)


if __name__ == "__main__":
    main()
