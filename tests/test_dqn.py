"""DQN model: inference shapes, e-greedy, training step, save/load."""

import numpy as np
import pytest

import magent_tpu as magent
from magent_tpu.builtin.jax_model import DeepQNetwork
from magent_tpu.utility import EpisodesBuffer
from tests.test_engine_basic import battle_env


def make_model(env, handle, **kw):
    args = dict(batch_size=32, memory_size=1024, target_update=4,
                train_freq=1, infer_batch_size=256)
    args.update(kw)
    return DeepQNetwork(env, handle, "test-dqn", **args)


def test_infer_shapes_and_greedy():
    env = battle_env()
    h0, h1 = env.get_handles()
    env.add_agents(h0, method="custom", pos=[[3, 3], [5, 3], [7, 7]])
    env.add_agents(h1, method="custom", pos=[[10, 10]])
    model = make_model(env, h0)

    obs = env.get_observation(h0)
    ids = env.get_agent_id(h0)
    acts = model.infer_action(obs, ids, policy="greedy", eps=0)
    assert acts.shape == (3,)
    assert acts.dtype == np.int32
    assert (acts >= 0).all() and (acts < 21).all()
    # greedy is deterministic
    acts2 = model.infer_action(obs, ids, policy="greedy", eps=0)
    assert np.array_equal(acts, acts2)
    # eps=1 explores uniformly: with 64 samples nearly surely not all equal
    many = np.concatenate([
        model.infer_action(obs, ids, policy="e_greedy", eps=1.0) for _ in range(20)
    ])
    assert len(np.unique(many)) > 3


def test_train_reduces_and_checkpoint(tmp_path):
    env = battle_env()
    h0, h1 = env.get_handles()
    env.add_agents(h0, method="custom", pos=[[3, 3], [5, 3]])
    env.add_agents(h1, method="custom", pos=[[10, 10]])
    model = make_model(env, h0)

    # build a tiny fake episode buffer
    buf = EpisodesBuffer(capacity=100)
    obs = env.get_observation(h0)
    ids = env.get_agent_id(h0)
    for t in range(40):
        acts = np.random.randint(0, 21, size=2).astype(np.int32)
        rewards = np.random.randn(2).astype(np.float32) * 0.1
        alives = np.array([True, True])
        buf.record_step(ids, obs, acts, rewards, alives)

    loss, value = model.train(buf, print_every=10**9)
    assert np.isfinite(loss)
    assert np.isfinite(value)

    # save/load roundtrip preserves q-values
    q_before = model.infer_action(obs, ids, policy="greedy")
    model.save(str(tmp_path), 7)
    model2 = make_model(env, h0)
    model2.load(str(tmp_path), 7, name="test-dqn")
    q_after = model2.infer_action(obs, ids, policy="greedy")
    assert np.array_equal(q_before, q_after)
