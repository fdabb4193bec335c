"""Classic-path data-parallel inference: ``DeepQNetwork.shard_inference``
splits large ``infer_action`` batches over the device mesh — the TPU-native
analog of the reference DQN's per-GPU eval-net round-robin
(reference: tf_model/dqn.py:368-393).  Actions must be identical to the
single-device path (conftest provides the 8-device virtual CPU mesh)."""

import numpy as np

import magent_tpu as magent
from magent_tpu.builtin.jax_model import DeepQNetwork


def _model_and_obs(n=300, **kwargs):
    env = magent.GridWorld("battle", map_size=16)
    h0, _ = env.get_handles()
    model = DeepQNetwork(env, h0, "shinf", memory_size=512, **kwargs)
    rng = np.random.RandomState(0)
    view = rng.rand(n, *model.view_space).astype(np.float32)
    feat = rng.rand(n, *model.feature_space).astype(np.float32)
    return model, view, feat


def test_sharded_inference_matches_unsharded():
    # infer_batch_size=256 forces chunking (300 rows -> 256 + 44) so the
    # round-robin path is exercised, not just one call
    model, view, feat = _model_and_obs(infer_batch_size=256)
    ids = np.arange(len(view))
    key0 = model.key

    ref_greedy = model.infer_action((view, feat), ids, policy="greedy")
    model.key = key0
    ref_eps = model.infer_action((view, feat), ids, eps=0.3)

    model.shard_inference(8)
    assert model._infer_devices == 8 and model._sharded_act_fn is not None

    sh_greedy = model.infer_action((view, feat), ids, policy="greedy")
    model.key = key0
    # re-run the e-greedy call from the same key state: same per-row
    # randomness, so exploration choices must match exactly too
    model.key = key0
    sh_eps = model.infer_action((view, feat), ids, eps=0.3)

    np.testing.assert_array_equal(ref_greedy, sh_greedy)
    np.testing.assert_array_equal(ref_eps, sh_eps)


def test_num_gpu_kwarg_enables_sharding():
    """The reference's ``num_gpu`` constructor knob maps to mesh sharding."""
    model, view, feat = _model_and_obs(n=64, num_gpu=4)
    assert model._infer_devices == 4
    acts = model.infer_action((view, feat), np.arange(64), policy="greedy")
    model.shard_inference(1)  # back to single-device
    assert model._sharded_act_fn is None
    np.testing.assert_array_equal(
        acts, model.infer_action((view, feat), np.arange(64),
                                 policy="greedy"))


def test_shard_inference_caps_at_available_devices():
    model, view, feat = _model_and_obs(n=40)
    model.shard_inference(999)
    assert model._infer_devices == 8  # the virtual CPU mesh size
    acts = model.infer_action((view, feat), np.arange(40), policy="greedy")
    assert acts.shape == (40,)
