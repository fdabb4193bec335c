"""Fused-training throughput: trained agent-steps/s for dqn / a2c / drqn.

Battle 2x1000 (the bench.py geometry) with rollout + gradient step fused
into one scanned program (parallel/train.py).  Usage:
    python scripts/bench_train.py [dqn a2c drqn]
Prints one JSON line per algorithm.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/magent_tpu_jax_cache")

import jax
import jax.numpy as jnp
import numpy as np
import optax

from magent_tpu.builtin.config import battle
from magent_tpu.builtin.jax_model.a2c import A2CNet
from magent_tpu.builtin.jax_model.dqn import DQNNet
from magent_tpu.builtin.jax_model.drqn import DRQNNet
from magent_tpu.parallel import (VecGridWorld, init_drqn_hiddens,
                                 make_a2c_train_loop, make_dqn_train_loop,
                                 make_dqn_remat_train_loop,
                                 make_drqn_train_loop)

N_PER_GROUP = 1000
MAP_SIZE = 200
N_ENVS = int(os.environ.get("BENCH_N_ENVS", "16"))
ROLLOUT = int(os.environ.get("BENCH_ROLLOUT", "8"))
STEPS_PER_CALL = int(os.environ.get("BENCH_SPC", "4"))
CALLS = 3


def bench_alg(alg: str):
    # bf16 views halve the rollout trajectory's HBM traffic (~865MB/call at
    # rollout 16); the TD math still runs in f32 (casts at the conv input)
    obs_dtype = {"f32": None, "bf16": jnp.bfloat16}[
        os.environ.get("BENCH_OBS_DTYPE", "bf16")]
    venv = VecGridWorld(battle.get_config(MAP_SIZE),
                        [N_PER_GROUP, N_PER_GROUP], n_envs=N_ENVS,
                        obs_dtype=obs_dtype)
    spec = venv.spec
    net_cls = {"dqn": DQNNet, "dqn_remat": DQNNet, "drqn": DRQNNet,
               "a2c": A2CNet}[alg]
    # bf16 trunk compute doubles MXU throughput (params/heads stay f32)
    net_dtype = {"f32": jnp.float32, "bf16": jnp.bfloat16}[
        os.environ.get("BENCH_NET_DTYPE", "bf16")]
    nets = [net_cls(num_actions=spec.groups[g].type.n_action, dtype=net_dtype)
            for g in range(2)]
    key = jax.random.PRNGKey(0)
    params = []
    for g in range(2):
        vh, vw, C = spec.view_space(g)
        F = spec.feature_size(g)
        dummy = [jnp.zeros((1, vh, vw, C), jnp.float32),
                 jnp.zeros((1, F), jnp.float32)]
        if alg == "drqn":
            dummy.insert(0, jnp.zeros((1, nets[g].state_size), jnp.float32))
        params.append(nets[g].init(jax.random.fold_in(key, g),
                                   *dummy)["params"])
    params = tuple(params)
    tx = optax.chain(optax.clip_by_global_norm(5.0), optax.adam(1e-4))
    opts = tuple(tx.init(p) for p in params)
    tgt = jax.tree.map(lambda x: x, params)

    if alg == "dqn_remat":
        loop = jax.jit(make_dqn_remat_train_loop(
            venv, nets, tx, steps_per_call=STEPS_PER_CALL, target_update=40,
            rollout_len=ROLLOUT,
            sample_steps=int(os.environ.get("BENCH_SAMPLE_STEPS", "2"))))
    elif alg == "dqn":
        loop = jax.jit(make_dqn_train_loop(
            venv, nets, tx, steps_per_call=STEPS_PER_CALL, target_update=40,
            rollout_len=ROLLOUT, train_minibatch=16384))
    elif alg == "drqn":
        # BENCH_DRQN_REMAT: none | dots | all (default = the factory's "all")
        remat = os.environ.get("BENCH_DRQN_REMAT", "")
        kw = {} if not remat else {
            "unroll_remat": False if remat == "none" else remat}
        # BENCH_DRQN_SHARE=0 keeps the two-unroll loss (round-4 behavior)
        kw["share_acting"] = os.environ.get("BENCH_DRQN_SHARE", "1") != "0"
        loop = jax.jit(make_drqn_train_loop(
            venv, nets, tx, steps_per_call=STEPS_PER_CALL, target_update=40,
            rollout_len=ROLLOUT, **kw))
    else:
        loop = jax.jit(make_a2c_train_loop(
            venv, nets, tx, steps_per_call=STEPS_PER_CALL,
            rollout_len=ROLLOUT))

    state = jax.jit(venv.reset)(jax.random.PRNGKey(1))
    hid = init_drqn_hiddens(venv, nets) if alg == "drqn" else None
    lk = jax.random.PRNGKey(2)

    def call(c):
        ck = jax.random.fold_in(lk, c)
        nonlocal params, tgt, opts, state, hid
        if alg in ("dqn", "dqn_remat"):
            params, tgt, opts, state, metrics = loop(
                params, tgt, opts, state, ck, 0.3,
                jnp.asarray(c * STEPS_PER_CALL))
        elif alg == "drqn":
            params, tgt, opts, state, hid, metrics = loop(
                params, tgt, opts, state, hid, ck, 0.3,
                jnp.asarray(c * STEPS_PER_CALL))
        else:
            params, opts, state, metrics = loop(params, opts, state, ck)
        return metrics

    m = call(0)
    float(jnp.sum(m["loss"]))  # force completion through the tunnel
    t0 = time.perf_counter()
    for c in range(1, CALLS + 1):
        m = call(c)
    float(jnp.sum(m["loss"]))
    dt = time.perf_counter() - t0

    agent_steps = 2 * N_PER_GROUP * N_ENVS * ROLLOUT * STEPS_PER_CALL * CALLS
    print(json.dumps({
        "metric": "battle_2x1000_trained_agent_steps_per_s",
        "alg": alg,
        "value": round(agent_steps / dt, 1),
        "unit": "agent-steps/s",
    }), flush=True)


if __name__ == "__main__":
    for alg in (sys.argv[1:] or ["dqn", "a2c", "drqn"]):
        bench_alg(alg)
