"""End-to-end smoke tests for the RL baselines (DQN is covered in
test_dqn.py): infer -> sample -> train -> save/load for DRQN and A2C,
mirroring the reference's script-driven integration tests
(reference: scripts/test/test_examples.py)."""

import numpy as np
import pytest

import magent_tpu as magent
from magent_tpu.builtin.jax_model import AdvantageActorCritic, DeepRecurrentQNetwork


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
        sample_buffers = [magent.utility.EpisodesBuffer(100) for _ in handles]
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
                acts.append(a)
                env.set_action(h, a)
            done = env.step()
            for i, h in enumerate(handles):
                rewards = env.get_reward(h)
                alives = env.get_alive(h)
                sample_buffers[i].record_step(
                    all_ids[i], all_obs[i], acts[i], rewards, alives
                )
            env.clear_dead()
        for i in range(len(handles)):
            models[i].train(sample_buffers[i])


def test_drqn_train_and_checkpoint(tmp_path):
    env, handles = _small_battle()
    models = [
        DeepRecurrentQNetwork(env, h, "drqn-%d" % i, batch_size=4,
                              unroll_step=4, memory_size=500, seed=i)
        for i, h in enumerate(handles)
    ]
    _run_rounds(env, handles, models)
    # hidden state persists per agent id
    assert len(models[0].agent_states) > 0
    models[0].save(str(tmp_path), 7)
    # snapshot hidden states BEFORE inference (infer_action advances them)
    snapshot = {k: v.copy() for k, v in models[0].agent_states.items()}
    obs = env.get_observation(handles[0])
    ids = env.get_agent_id(handles[0])
    before = models[0].infer_action(obs, ids, policy="greedy")
    models[1].load(str(tmp_path), 7, name="drqn-0")
    models[1].agent_states = snapshot
    after = models[1].infer_action(obs, ids, policy="greedy")
    np.testing.assert_array_equal(before, after)


@pytest.mark.parametrize("use_comm", [False, True])
def test_a2c_train(use_comm, tmp_path):
    env, handles = _small_battle()
    models = [
        AdvantageActorCritic(env, h, "a2c-%d" % i, use_comm=use_comm, seed=i)
        for i, h in enumerate(handles)
    ]
    _run_rounds(env, handles, models)
    models[0].save(str(tmp_path), 0)
    models[1].load(str(tmp_path), 0, name="a2c-0")


def test_subprocess_model_roundtrip(tmp_path):
    """Cross-process model hosting over a real pipe (reference:
    python/magent/model.py:115-347): non-blocking act/sample/train/save."""
    import magent_tpu as magent
    from magent_tpu.builtin.jax_model import DeepQNetwork

    env = magent.GridWorld("battle", map_size=16)
    h0, _ = env.get_handles()
    env.reset()
    env.add_agents(h0, method="custom", pos=[[4, 4], [6, 6], [8, 8]])

    model = magent.SubprocessModel(
        env, h0, "subproc-test", 0, 100, DeepQNetwork,
        batch_size=4, memory_size=256, target_update=10, train_freq=1)
    try:
        view, feat = env.get_observation(h0)
        ids = env.get_agent_id(h0)
        model.infer_action((view, feat), ids, "e_greedy", 0.5, block=False)
        acts = model.fetch_action()
        assert acts.shape == (3,) and acts.dtype == np.int32

        env.set_action(h0, acts.astype(np.int32))
        env.step()
        rewards = env.get_reward(h0)
        alives = env.get_alive(h0)
        model.sample_step(rewards, alives, block=False)
        assert model.check_done() == "done"

        model.train(print_every=1000, block=False)
        loss, value = model.fetch_train()
        assert np.isfinite(loss) and np.isfinite(value)

        model.save(str(tmp_path), 0)
        model.load(str(tmp_path), 0)
    finally:
        model.quit()


def test_bf16_model_dtype():
    """dtype="bf16" runs the net trunk in bfloat16 (params/heads stay f32;
    builtin/jax_model/{dqn,drqn,a2c}.py) — infer + train stay finite."""
    from magent_tpu.builtin.jax_model import DeepQNetwork

    env, handles = _small_battle()
    models = [
        cls(env, h, "bf16-%d" % i, dtype="bf16", seed=i, **kw)
        for i, (h, (cls, kw)) in enumerate(zip(handles, [
            (DeepQNetwork, dict(batch_size=4, memory_size=256)),
            (AdvantageActorCritic, dict(batch_size=4)),
        ]))
    ]
    _run_rounds(env, handles, models)
    # params remain f32 (mixed precision: bf16 compute, f32 master weights)
    import jax
    for m in models:
        assert all(p.dtype == np.float32
                   for p in jax.tree.leaves(m.params))


def test_bf16_drqn_dtype():
    env, handles = _small_battle()
    models = [
        DeepRecurrentQNetwork(env, h, "bf16drqn-%d" % i, dtype="bf16",
                              batch_size=4, unroll_step=4, memory_size=400,
                              seed=i)
        for i, h in enumerate(handles)
    ]
    _run_rounds(env, handles, models)


def test_episode_runner_with_subprocess_model():
    """EpisodeRunner's deferred-ack overlap (non-blocking act + sample
    against a real pipe-hosted worker, examples/rollout.py) stays in
    protocol sync over several steps and a train call."""
    import sys, pathlib
    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent
                           / "examples"))
    from rollout import Side, EpisodeRunner
    from magent_tpu.builtin.jax_model import DeepQNetwork
    from magent_tpu.builtin.rule_model import RandomActor

    env, (h0, h1) = _small_battle()
    hosted = magent.SubprocessModel(
        env, h0, "runner-subproc", 0, 100, DeepQNetwork,
        batch_size=4, memory_size=256, target_update=10, train_freq=1)
    try:
        sides = [Side(h0, hosted, train=True),
                 Side(h1, RandomActor(env, h1), observe=False)]
        runner = EpisodeRunner(env, sides, max_steps=4, print_every=100)
        runner.sample(eps=1.0)
        losses, values = runner.train()
        assert np.isfinite(losses[0]) and np.isfinite(values[0])
    finally:
        hosted.quit()


def test_commnet_zero_mask_is_solitary():
    """The A2C bootstrap evaluates each episode's last obs ALONE (reference
    a2c.py:259-263 feeds num_agent=1, whose (1,1) comm mask is zero).  The
    batched equivalent passes an all-zero mask: every row's CommNet message
    must be exactly zero, so its value must equal its own single-row
    evaluation — independent of what else is in the batch."""
    import jax.numpy as jnp
    env, handles = _small_battle()
    m = AdvantageActorCritic(env, handles[0], "a2c-comm", use_comm=True,
                             seed=3)
    rng = np.random.RandomState(0)
    v = rng.rand(4, *m.view_space).astype(np.float32)
    f = rng.rand(4, *m.feature_space).astype(np.float32)
    batched = np.asarray(
        m._value_fn(m.params, v, f, jnp.zeros(4, jnp.float32)))
    for i in range(4):
        solo = np.asarray(
            m._value_fn(m.params, v[i : i + 1], f[i : i + 1],
                        jnp.zeros(1, jnp.float32)))[0]
        np.testing.assert_allclose(batched[i], solo, rtol=1e-6)
    # and a NON-zero mask must actually mix rows (sanity: comm is live)
    mixed = np.asarray(
        m._value_fn(m.params, v, f, jnp.ones(4, jnp.float32)))
    assert not np.allclose(mixed, batched)


def test_drqn_eval_obs_used():
    """DRQN's eval metric with an eval set = mean TARGET-net q over the set
    (zero initial state, one-step unroll — reference drqn.py:567-575), not
    the training-batch fallback."""
    env, handles = _small_battle()
    rng = np.random.RandomState(1)
    m = DeepRecurrentQNetwork(env, handles[0], "drqn-eval", seed=2)
    ev = rng.rand(5, *m.view_space).astype(np.float32)
    ef = rng.rand(5, *m.feature_space).astype(np.float32)
    m.eval_obs = (ev, ef)
    got = m._eval(123.0)
    q = np.asarray(m._eval_q_fn(
        m.target_params,
        np.concatenate([ev, np.zeros((3,) + tuple(m.view_space), np.float32)]),
        np.concatenate([ef, np.zeros((3,) + tuple(m.feature_space), np.float32)]),
    ))[:5]
    np.testing.assert_allclose(got, float(np.mean(q)), rtol=1e-6)
    m.eval_obs = None
    assert m._eval(123.0) == 123.0


def test_check_model(tmp_path, monkeypatch):
    """check_model passes when the named checkpoints exist locally and
    raises a clear error otherwise (reference: utility.py:242-270; this
    environment has no egress, so the download path must fail loudly)."""
    from magent_tpu.utility import check_model

    monkeypatch.chdir(tmp_path)
    with pytest.raises(RuntimeError, match="Unknown model name"):
        check_model("bogus")

    p = tmp_path / "save_model" / "arrange"
    p.mkdir(parents=True)
    (p / "dqn_10.npz").write_bytes(b"")
    check_model("arrange")  # present -> no download, no raise

    with pytest.raises(RuntimeError):
        check_model("battle-game")  # absent -> download attempt fails
