"""Mesh-sharded execution tests on the virtual 8-device CPU mesh
(conftest forces 8 XLA host devices): env batches sharded over ``dp`` must
produce exactly the same trajectories as unsharded execution, and the fused
train step must run under sharding with finite losses."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

import magent_tpu as magent
from magent_tpu.builtin.config import battle
from magent_tpu.builtin.jax_model.dqn import DQNNet
from magent_tpu.parallel import (VecGridWorld, make_dqn_train_step, make_mesh,
                                 param_sharding, state_sharding)


@pytest.fixture(scope="module")
def venv():
    return VecGridWorld(battle.get_config(24), [8, 8], n_envs=8)


def _rollout(venv, state, steps=6):
    outs = []

    def body(carry, _):
        st, key = carry
        key, akey = jax.random.split(key)
        acts = venv.random_actions(akey)
        st, rew, alive, done = venv.transition(st, acts)
        return (st, key), (rew, alive)

    (state, _), (rews, alives) = jax.lax.scan(
        body, (state, jax.random.PRNGKey(7)), None, length=steps
    )
    return state, rews, alives


def test_dp_sharded_matches_unsharded(venv):
    state = venv.reset(jax.random.PRNGKey(0))
    run = jax.jit(lambda s: _rollout(venv, s))
    _, rews_ref, alives_ref = run(state)

    mesh = make_mesh(8, tp=1)
    state_sh = jax.device_put(state, state_sharding(mesh, state))
    _, rews_sh, alives_sh = jax.jit(lambda s: _rollout(venv, s))(state_sh)

    np.testing.assert_allclose(np.asarray(rews_sh), np.asarray(rews_ref),
                               atol=1e-6)
    np.testing.assert_array_equal(np.asarray(alives_sh), np.asarray(alives_ref))


def test_sharded_train_step(venv):
    spec = venv.spec
    mesh = make_mesh(8, tp=2)
    nets = [DQNNet(num_actions=spec.groups[g].type.n_action) for g in range(2)]
    params = []
    for g in range(2):
        vh, vw, C = spec.view_space(g)
        F = spec.feature_size(g)
        p = nets[g].init(
            jax.random.PRNGKey(g),
            jnp.zeros((1, vh, vw, C), jnp.float32),
            jnp.zeros((1, F), jnp.float32),
        )["params"]
        params.append(p)
    params = tuple(params)
    tx = optax.adam(1e-4)
    opts = tuple(tx.init(p) for p in params)
    tgt = jax.tree.map(lambda x: x, params)

    train_step = make_dqn_train_step(venv, nets, tx, rollout_len=2)
    env_state = venv.reset(jax.random.PRNGKey(1))
    env_state = jax.device_put(env_state, state_sharding(mesh, env_state))
    params = jax.device_put(params, param_sharding(mesh, params))
    tgt = jax.device_put(tgt, param_sharding(mesh, tgt))
    opts = jax.device_put(opts, param_sharding(mesh, opts))
    key = jax.device_put(jax.random.PRNGKey(2), NamedSharding(mesh, P()))

    params, opts, env_state, metrics = jax.jit(train_step)(
        params, tgt, opts, env_state, key, 0.5
    )
    loss = np.asarray(metrics["loss"])
    assert loss.shape == (2,) and np.all(np.isfinite(loss))
    # params stayed tp-sharded
    kernel = params[0]["dense_view"]["kernel"]
    assert not kernel.sharding.is_fully_replicated
