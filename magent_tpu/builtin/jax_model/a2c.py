"""Advantage actor-critic (+ optional CommNet) in flax/optax.

Capability parity with the reference A2C (reference:
python/magent/builtin/tf_model/a2c.py): shared dense trunk (flattened view
stream ⊕ feature stream), softmax policy + value head, loss = policy
gradient + ``value_coef``·value MSE + ``ent_coef``·negative entropy, Adam
with global-norm-5 gradient clipping, n-step discounted returns bootstrapped
from V of each episode's last observation (a2c.py:253-265), and the CommNet
mean-message communication blocks (a2c.py:80-126).

TPU-first details: agent batches pad to power-of-two buckets; the CommNet
mean-message uses an explicit validity mask so padded rows don't pollute the
mean; sampling happens in-graph with a categorical draw.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn
import optax

from .base import JaxBaseModel, round_up_pow2


class CommNet(nn.Module):
    """Mean-message communication (S. Sukhbaatar et al., NIPS 2016;
    reference: a2c.py:80-126)."""

    hidden_size: int
    n_step: int = 2

    @nn.compact
    def __call__(self, h, mask):
        skip = h
        m = mask[:, None]
        for i in range(self.n_step):
            count = jnp.sum(mask)
            # mean over the *other* agents (zero when alone)
            total = jnp.sum(h * m, axis=0, keepdims=True)
            denom = jnp.where(count > 1.0, count - 1.0, jnp.inf)
            message = (total - h * m) / denom
            C = self.param(
                "step_%d_C" % i,
                nn.initializers.lecun_normal(),
                (self.hidden_size, self.hidden_size),
            )
            H = self.param(
                "step_%d_H" % i,
                nn.initializers.lecun_normal(),
                (self.hidden_size, self.hidden_size),
            )
            h = jnp.tanh(message @ C + h @ H + skip)
        return h


class A2CNet(nn.Module):
    """``dtype`` is the COMPUTE dtype of the trunk (params stay f32; bf16
    doubles MXU throughput on v5e); policy/value heads always run in f32."""

    num_actions: int
    use_comm: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, view, feature, mask=None):
        dt = self.dtype
        flat = view.reshape((view.shape[0], -1)).astype(dt)
        h_view = nn.relu(nn.Dense(256, name="dense_view", dtype=dt)(flat))
        h_emb = nn.relu(nn.Dense(256, name="dense_emb",
                                 dtype=dt)(feature.astype(dt)))
        dense = jnp.concatenate([h_view, h_emb], axis=1)
        dense = nn.relu(nn.Dense(512, name="dense_joint", dtype=dt)(dense))
        dense = dense.astype(jnp.float32)
        if self.use_comm:
            if mask is None:
                mask = jnp.ones((dense.shape[0],), jnp.float32)
            dense = CommNet(512, name="comm")(dense, mask)
        logits = nn.Dense(self.num_actions, name="policy")(dense)
        policy = jnp.clip(jax.nn.softmax(logits), 1e-10, 1.0 - 1e-10)
        value = nn.Dense(1, name="value")(dense)[:, 0]
        return policy, value


class AdvantageActorCritic(JaxBaseModel):
    def __init__(self, env, handle, name, learning_rate=1e-3,
                 batch_size=64, reward_decay=0.99, eval_obs=None,
                 train_freq=1, value_coef=0.1, ent_coef=0.08, use_comm=False,
                 custom_view_space=None, custom_feature_space=None, seed=0,
                 dtype="f32", **kwargs):
        JaxBaseModel.__init__(self, env, handle, name, "tfa2c")

        self.view_space = custom_view_space or env.get_view_space(handle)
        self.feature_space = custom_feature_space or env.get_feature_space(handle)
        self.num_actions = env.get_action_space(handle)[0]
        self.gamma = reward_decay
        self.value_coef = value_coef
        self.ent_coef = ent_coef
        self.train_ct = 0

        net_dt = jnp.bfloat16 if dtype in ("bf16", jnp.bfloat16) else jnp.float32
        self.net = A2CNet(self.num_actions, use_comm, dtype=net_dt)
        key = jax.random.PRNGKey(seed)
        self.key, init_key = jax.random.split(key)
        dummy_v = jnp.zeros((1,) + tuple(self.view_space), jnp.float32)
        dummy_f = jnp.zeros((1,) + tuple(self.feature_space), jnp.float32)
        self.params = self.net.init(init_key, dummy_v, dummy_f)["params"]

        self.tx = optax.chain(
            optax.clip_by_global_norm(5.0), optax.adam(learning_rate)
        )
        self.opt_state = self.tx.init(self.params)

        net = self.net
        vc, ec = self.value_coef, self.ent_coef

        def sample_fn(params, view, feature, mask, key):
            policy, value = net.apply({"params": params}, view, feature, mask)
            acts = jax.random.categorical(key, jnp.log(policy), axis=1)
            return acts.astype(jnp.int32), value

        def value_fn(params, view, feature, mask):
            _, value = net.apply({"params": params}, view, feature, mask)
            return value

        def loss_fn(params, view, feature, action, ret, mask):
            policy, value = net.apply({"params": params}, view, feature, mask)
            advantage = jax.lax.stop_gradient(ret - value)
            log_policy = jnp.log(policy + 1e-6)
            log_prob = jnp.take_along_axis(log_policy, action[:, None], axis=1)[:, 0]
            msum = jnp.maximum(jnp.sum(mask), 1.0)
            pg_loss = -jnp.sum(advantage * log_prob * mask) / msum
            vf_loss = vc * jnp.sum(jnp.square(ret - value) * mask) / msum
            neg_entropy = ec * jnp.sum(
                jnp.sum(policy * log_policy, axis=1) * mask
            ) / msum
            total = pg_loss + vf_loss + neg_entropy
            return total, (pg_loss, vf_loss, neg_entropy, value)

        def train_step(params, opt_state, view, feature, action, ret, mask):
            (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params, view, feature, action, ret, mask
            )
            updates, opt_state = self.tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, aux

        self._sample_fn = jax.jit(sample_fn)
        self._value_fn = jax.jit(value_fn)
        self._train_step = jax.jit(train_step)

    # -------------------------------------------------------------- params
    def get_params(self):
        return self.params

    def set_params(self, tree):
        self.params = jax.tree.map(jnp.asarray, tree)
        self.opt_state = self.tx.init(self.params)

    # ------------------------------------------------------------ inference
    def infer_action(self, raw_obs, ids, *args, **kwargs):
        view, feature = raw_obs[0], raw_obs[1]
        n = len(view)
        if n == 0:
            return np.empty(0, np.int32)
        padded = round_up_pow2(n)
        pv = np.zeros((padded,) + tuple(self.view_space), np.float32)
        pf = np.zeros((padded,) + tuple(self.feature_space), np.float32)
        pm = np.zeros(padded, np.float32)
        pv[:n], pf[:n], pm[:n] = view, feature, 1.0
        self.key, sub = jax.random.split(self.key)
        acts, _ = self._sample_fn(self.params, pv, pf, pm, sub)
        return np.asarray(acts[:n], np.int32)

    # ------------------------------------------------------------- training
    def train(self, sample_buffer, print_every=1000, **kwargs):
        episodes = list(sample_buffer.episodes())
        n = sum(len(e.rewards) for e in episodes)
        if n == 0:
            return [0, 0, 0], 0

        view = np.empty((n,) + tuple(self.view_space), np.float32)
        feature = np.empty((n,) + tuple(self.feature_space), np.float32)
        action = np.empty(n, np.int32)
        ret = np.empty(n, np.float32)

        # bootstrap each episode's return from V(last obs) (a2c.py:253-265)
        last_v = np.stack([np.asarray(e.views[-1]) for e in episodes])
        last_f = np.stack([np.asarray(e.features[-1]) for e in episodes])
        pad = round_up_pow2(len(episodes))
        pv = np.zeros((pad,) + tuple(self.view_space), np.float32)
        pf = np.zeros((pad,) + tuple(self.feature_space), np.float32)
        pv[: len(episodes)], pf[: len(episodes)] = last_v, last_f
        # the reference bootstraps each episode alone (num_agent=1 → CommNet
        # message ≡ 0, a2c.py:259-263); an all-zero mask reproduces that
        # solitary semantics for every row in one batched call
        pm = np.zeros(pad, np.float32)
        keeps = np.asarray(self._value_fn(self.params, pv, pf, pm))[: len(episodes)]

        ct = 0
        for e, keep in zip(episodes, keeps):
            m = len(e.rewards)
            r = np.asarray(e.rewards, np.float32).copy()
            acc = float(keep)
            for i in reversed(range(m)):
                acc = acc * self.gamma + r[i]
                r[i] = acc
            view[ct : ct + m] = e.views
            feature[ct : ct + m] = e.features
            action[ct : ct + m] = e.actions
            ret[ct : ct + m] = r
            ct += m

        padded = round_up_pow2(n)
        pvb = np.zeros((padded,) + tuple(self.view_space), np.float32)
        pfb = np.zeros((padded,) + tuple(self.feature_space), np.float32)
        pab = np.zeros(padded, np.int32)
        prb = np.zeros(padded, np.float32)
        pmb = np.zeros(padded, np.float32)
        pvb[:n], pfb[:n], pab[:n], prb[:n], pmb[:n] = view, feature, action, ret, 1.0

        self.params, self.opt_state, aux = self._train_step(
            self.params, self.opt_state, pvb, pfb, pab, prb, pmb
        )
        pg, vf, ent, value = (float(aux[0]), float(aux[1]), float(aux[2]),
                              float(jnp.sum(aux[3] * pmb) / max(n, 1)))
        self.train_ct += 1
        print("sample", n, pg, vf, ent)
        return [pg, vf, ent], value

    def get_info(self):
        return "a2c train_time: %d" % self.train_ct
