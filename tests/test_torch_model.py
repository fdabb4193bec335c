"""The torch backend (builtin/torch_model) — the independent second NN
backend (reference ships TF + MXNet with the same model surface,
python/magent/builtin/mx_model).  Same BaseModel contract as the JAX
models: infer -> sample -> train -> save/load, plus the mx_model
import-path alias."""

import numpy as np

import magent_tpu as magent
from magent_tpu.builtin.torch_model import (AdvantageActorCritic,
                                            DeepQNetwork)


def _small_battle():
    env = magent.GridWorld("battle", map_size=16)
    h0, h1 = env.get_handles()
    env.reset()
    env.add_agents(h0, method="custom", pos=[[3, 3], [5, 5], [3, 7]])
    env.add_agents(h1, method="custom", pos=[[10, 10], [12, 12], [10, 8]])
    return env, (h0, h1)


def _run_rounds(env, handles, models, rounds=2, steps=6):
    for _ in range(rounds):
        env.reset()
        h0, h1 = handles
        env.add_agents(h0, method="custom", pos=[[3, 3], [5, 5], [3, 7]])
        env.add_agents(h1, method="custom", pos=[[10, 10], [12, 12], [10, 8]])
        buffers = [magent.utility.EpisodesBuffer(100) for _ in handles]
        done = False
        for _ in range(steps):
            if done:
                break
            all_obs = [env.get_observation(h) for h in handles]
            all_ids = [env.get_agent_id(h) for h in handles]
            acts = []
            for i, h in enumerate(handles):
                a = models[i].infer_action(all_obs[i], all_ids[i], eps=0.5)
                assert a.shape == (env.get_num(h),)
                assert a.dtype == np.int32
                assert np.all((a >= 0)
                              & (a < env.get_action_space(h)[0]))
                acts.append(a)
                env.set_action(h, a)
            done = env.step()
            for i, h in enumerate(handles):
                buffers[i].record_step(all_ids[i], all_obs[i], acts[i],
                                       env.get_reward(h), env.get_alive(h))
            env.clear_dead()
        for i in range(len(handles)):
            models[i].train(buffers[i])


def test_torch_dqn_train_and_checkpoint(tmp_path):
    env, handles = _small_battle()
    models = [DeepQNetwork(env, h, "thdqn-%d" % i, batch_size=8,
                           memory_size=512, train_freq=4, seed=i)
              for i, h in enumerate(handles)]
    _run_rounds(env, handles, models)
    assert models[0].train_ct > 0

    models[0].save(str(tmp_path), 3)
    obs = env.get_observation(handles[0])
    ids = env.get_agent_id(handles[0])
    before = models[0].infer_action(obs, ids, policy="greedy")
    models[1].load(str(tmp_path), 3, name="thdqn-0")
    after = models[1].infer_action(obs, ids, policy="greedy")
    np.testing.assert_array_equal(before, after)


def test_torch_a2c_train_and_checkpoint(tmp_path):
    env, handles = _small_battle()
    models = [AdvantageActorCritic(env, h, "tha2c-%d" % i, seed=i)
              for i, h in enumerate(handles)]
    _run_rounds(env, handles, models)
    assert models[0].train_ct > 0
    models[0].save(str(tmp_path), 0)
    models[1].load(str(tmp_path), 0, name="tha2c-0")


def test_torch_dqn_learns_reward_preference():
    """Independent-backend sanity: a torch DQN trained on a synthetic
    buffer where one action always pays must come to prefer it."""
    # EpisodesBuffer.record_step randomizes admission order with the GLOBAL
    # numpy RNG, so episode (and hence replay) ordering depends on whatever
    # ran before in the suite — pin it so this learning assertion is
    # order-independent (torch RNG is pinned by the model's seed kwarg).
    np.random.seed(0)
    env, handles = _small_battle()
    model = DeepQNetwork(env, handles[0], "pref", batch_size=32,
                         memory_size=4096, train_freq=16, target_update=8,
                         learning_rate=1e-3, seed=0)
    n_act = env.get_action_space(handles[0])[0]
    good = n_act // 2
    rng = np.random.RandomState(0)
    vs = tuple(model.view_space)
    fs = tuple(model.feature_space)

    buf = magent.utility.EpisodesBuffer(4000)
    for _ in range(40):
        ids = np.arange(3)
        view = rng.rand(3, *vs).astype(np.float32)
        feat = rng.rand(3, *fs).astype(np.float32)
        acts = rng.randint(0, n_act, 3).astype(np.int32)
        rew = np.where(acts == good, 1.0, 0.0).astype(np.float32)
        buf.record_step(ids, (view, feat), acts, rew, np.ones(3, bool))
    model.train(buf, print_every=10 ** 9)

    probe_v = rng.rand(16, *vs).astype(np.float32)
    probe_f = rng.rand(16, *fs).astype(np.float32)
    acts = model.infer_action((probe_v, probe_f), np.arange(16),
                              policy="greedy")
    assert np.mean(acts == good) > 0.8, acts


def test_mx_model_alias_is_torch_backend():
    """magent.builtin.mx_model (the reference's second-backend import path)
    resolves to the torch models, not re-exported JAX ones."""
    from magent_tpu.builtin import mx_model, torch_model

    assert mx_model.DeepQNetwork is torch_model.DeepQNetwork
    assert mx_model.AdvantageActorCritic is torch_model.AdvantageActorCritic
