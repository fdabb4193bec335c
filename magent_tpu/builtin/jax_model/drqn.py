"""Deep recurrent Q network (GRU) in flax/optax.

Capability parity with the reference DRQN (reference:
python/magent/builtin/tf_model/drqn.py): dense trunk (view ⊕ feature) into a
GRU whose hidden state persists per agent id across steps at inference
(drqn.py:188-243), dueling + double Q heads, an episode-list replay buffer
sampled proportionally to episode length, and truncated-BPTT training over
``unroll_step`` windows with zero initial state (drqn.py:301-399).

TPU-first details: inference pads agent batches to power-of-two buckets and
runs a single jitted GRU step; training unrolls a [batch, unroll, ...]
window with ``lax.scan`` in one jitted program.
"""

from __future__ import annotations

import time

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn
import optax

from .base import JaxBaseModel, round_up_pow2


class DRQNTrunk(nn.Module):
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, view, feature):
        dt = self.dtype
        flat = view.reshape((view.shape[0], -1)).astype(dt)
        h_view = nn.relu(nn.Dense(256, name="dense_view", dtype=dt)(flat))
        h_emb = nn.relu(nn.Dense(256, name="dense_emb",
                                 dtype=dt)(feature.astype(dt)))
        # the GRU carry and Q heads stay f32
        return jnp.concatenate([h_view, h_emb], axis=1).astype(jnp.float32)


class DRQNNet(nn.Module):
    """One GRU step: (state, view, feature) -> (new_state, q).

    ``dtype`` is the COMPUTE dtype of the trunk AND the GRU gate matmuls
    (params and the carried hidden state stay f32; the Q heads always run
    in f32).  At the reference's state size (512 = hidden_size[0]*2,
    reference drqn.py:150-168) the six H×H gate matmuls are ~2/3 of the
    trainer's FLOPs, so bf16 here doubles the fused DRQN's MXU
    throughput."""

    num_actions: int
    use_dueling: bool = True
    state_size: int = 512
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, state, view, feature):
        h = DRQNTrunk(name="trunk", dtype=self.dtype)(view, feature)
        new_state, rnn_out = nn.GRUCell(
            self.state_size, name="gru", dtype=self.dtype,
            param_dtype=jnp.float32)(state.astype(self.dtype),
                                     h.astype(self.dtype))
        new_state = new_state.astype(jnp.float32)
        rnn_out = rnn_out.astype(jnp.float32)
        if self.use_dueling:
            value = nn.Dense(1, name="value")(rnn_out)
            adv = nn.Dense(self.num_actions, use_bias=False, name="advantage")(rnn_out)
            q = value + adv - jnp.mean(adv, axis=1, keepdims=True)
        else:
            q = nn.Dense(self.num_actions, name="value")(rnn_out)
        return new_state, q


def split_unroll(net: DRQNNet, params, views, features, h0, keep=None,
                 remat=False):
    """Unrolled DRQN evaluation -> q [T, B, n_actions].

    Equivalent to scanning ``net.apply`` over T frames (same param pytree,
    gate math mirrors flax.linen.GRUCell), but the trunk, the GRU's
    input-side projections, and the Q heads — everything that does not
    depend on the carry — run as ONE batched matmul over the whole
    [T, B] window (MXU-sized, trunk in the net's compute dtype); only the
    carry-side half of the cell scans over T.

    ``keep`` [T, B, 1] bool optionally zeroes the carry after a frame
    (death/episode-end resets in the fused trainer); the emitted q for
    that frame still comes from the pre-reset state.

    ``remat`` checkpoints the scan body so the backward stores fewer
    residuals (the BPTT backward is HBM-residual bound at battle scale):
    ``"dots"`` (or True) keeps the gate matmul outputs and re-derives the
    elementwise activations; ``"all"`` recomputes the whole body from the
    carried hidden (the gate matmuls are bf16-cheap, the [B, H] residual
    stores are not).
    """
    T, B = views.shape[:2]
    H = net.state_size
    dt = net.dtype
    f32 = jnp.float32
    x = DRQNTrunk(dtype=dt).apply(
        {"params": params["trunk"]},
        views.reshape((-1,) + views.shape[2:]),
        features.reshape((-1,) + features.shape[2:]),
    )
    pg = params["gru"]
    # all matmuls in the net's compute dtype (f32 accumulate on the MXU);
    # gate nonlinearities and the carried hidden stay f32
    xd = x.astype(dt)
    # the [T, B, H] gate pre-activation stacks are scan inputs AND backward
    # residuals — in bf16 mode storing them in dt halves that traffic
    xr, xz, xn = (
        ((xd @ pg[k]["kernel"].astype(dt))
         + pg[k]["bias"].astype(dt)).reshape(T, B, H)
        for k in ("ir", "iz", "in")
    )
    khr, khz, khn = (pg[k]["kernel"].astype(dt) for k in ("hr", "hz", "hn"))
    hn_bias = pg["hn"]["bias"]
    if keep is None:
        keep = jnp.ones((T, B, 1), bool)

    def body(h, xs):
        xr, xz, xn, k = xs
        hd = h.astype(dt)
        r = jax.nn.sigmoid(xr.astype(f32) + (hd @ khr).astype(f32))
        z = jax.nn.sigmoid(xz.astype(f32) + (hd @ khz).astype(f32))
        n = jnp.tanh(xn.astype(f32)
                     + r * ((hd @ khn).astype(f32) + hn_bias))
        h2 = (1.0 - z) * n + z * h
        return jnp.where(k, h2, 0.0), h2

    if remat:
        if remat == "all":
            body = jax.checkpoint(body)
        else:
            body = jax.checkpoint(
                body, policy=jax.checkpoint_policies.dots_saveable)
    _, outs = jax.lax.scan(body, h0, (xr, xz, xn, keep))
    flat = outs.reshape(-1, H)
    if net.use_dueling:
        value = flat @ params["value"]["kernel"] + params["value"]["bias"]
        adv = flat @ params["advantage"]["kernel"]
        q = value + adv - jnp.mean(adv, axis=1, keepdims=True)
    else:
        q = flat @ params["value"]["kernel"] + params["value"]["bias"]
    return q.reshape(T, B, -1)


class DeepRecurrentQNetwork(JaxBaseModel):
    def __init__(self, env, handle, name,
                 batch_size=32, unroll_step=8, reward_decay=0.99,
                 learning_rate=1e-4, train_freq=1, memory_size=20000,
                 target_update=2000, eval_obs=None, use_dueling=True,
                 use_double=True, use_episode_train=False,
                 custom_view_space=None, custom_feature_space=None, seed=0,
                 dtype="f32", **kwargs):
        JaxBaseModel.__init__(self, env, handle, name, "tfdrqn")

        self.view_space = custom_view_space or env.get_view_space(handle)
        self.feature_space = custom_feature_space or env.get_feature_space(handle)
        self.num_actions = env.get_action_space(handle)[0]
        self.batch_size = int(batch_size)
        self.unroll_step = int(unroll_step)
        self.gamma = reward_decay
        self.train_freq = train_freq
        self.memory_size = memory_size
        self.target_update = target_update
        self.eval_obs = eval_obs
        self.use_double = use_double
        self.train_ct = 0

        net_dt = jnp.bfloat16 if dtype in ("bf16", jnp.bfloat16) else jnp.float32
        self.net = DRQNNet(self.num_actions, use_dueling, dtype=net_dt)
        self.state_size = self.net.state_size
        key = jax.random.PRNGKey(seed)
        self.key, init_key = jax.random.split(key)
        dummy_s = jnp.zeros((1, self.state_size), jnp.float32)
        dummy_v = jnp.zeros((1,) + tuple(self.view_space), jnp.float32)
        dummy_f = jnp.zeros((1,) + tuple(self.feature_space), jnp.float32)
        self.params = self.net.init(init_key, dummy_s, dummy_v, dummy_f)["params"]
        self.target_params = jax.tree.map(lambda x: x, self.params)

        self.tx = optax.chain(
            optax.clip_by_global_norm(5.0), optax.adam(learning_rate)
        )
        self.opt_state = self.tx.init(self.params)

        net, gamma, use_double_ = self.net, self.gamma, use_double

        def step_fn(params, state, view, feature, key, eps):
            new_state, q = net.apply({"params": params}, state, view, feature)
            best = jnp.argmax(q, axis=1).astype(jnp.int32)
            k1, k2 = jax.random.split(key)
            rand = jax.random.randint(k1, best.shape, 0, self.num_actions, jnp.int32)
            explore = jax.random.uniform(k2, best.shape) < eps
            return new_state, jnp.where(explore, rand, best)

        def unroll(params, views, features):
            """views [T, B, ...] -> q [T, B, n_actions], zero initial state
            (batched-projection split, :func:`split_unroll`)."""
            B = views.shape[1]
            init = jnp.zeros((B, self.state_size), jnp.float32)
            return split_unroll(net, params, views, features, init)

        def train_step(params, opt_state, target_params, views, features,
                       actions, rewards, terminal, mask):
            # views/features: [T+1, B, ...]; others [T, B]
            t_q = unroll(target_params, views[1:], features[1:])
            if use_double_:
                q_next = unroll(params, views[1:], features[1:])
                sel = jnp.argmax(q_next, axis=-1, keepdims=True)
                next_v = jnp.take_along_axis(t_q, sel, axis=-1)[..., 0]
            else:
                next_v = jnp.max(t_q, axis=-1)
            target = jnp.where(terminal, rewards, rewards + gamma * next_v)
            target = jax.lax.stop_gradient(target)

            def loss_fn(p):
                q = unroll(p, views[:-1], features[:-1])
                q_a = jnp.take_along_axis(q, actions[..., None], axis=-1)[..., 0]
                td = jnp.square(target - q_a)
                return jnp.sum(td * mask) / jnp.maximum(jnp.sum(mask), 1.0)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = self.tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss, jnp.mean(target)

        def eval_q_fn(params, view, feature):
            state = jnp.zeros((view.shape[0], self.state_size), jnp.float32)
            _, q = net.apply({"params": params}, state, view, feature)
            return q

        self._step_fn = jax.jit(step_fn)
        self._train_step = jax.jit(train_step)
        self._eval_q_fn = jax.jit(eval_q_fn)

        # per-agent persistent hidden state (drqn.py:188-203)
        self.agent_states = {}

        # episode-list replay buffer (drqn.py:280-299)
        self.replay_buffer = []
        self.replay_buffer_lens = []

    # -------------------------------------------------------------- params
    def get_params(self):
        return self.params

    def set_params(self, tree):
        self.params = jax.tree.map(jnp.asarray, tree)
        self.target_params = jax.tree.map(lambda x: x, self.params)
        self.opt_state = self.tx.init(self.params)

    # ----------------------------------------------------- hidden state mgmt
    def _get_agent_states(self, ids):
        default = np.zeros(self.state_size, np.float32)
        return np.stack([self.agent_states.get(i, default) for i in ids])

    def _set_agent_states(self, ids, states):
        if len(ids) <= len(self.agent_states) * 0.5:
            self.agent_states = {}
        for i, s in zip(ids, states):
            self.agent_states[i] = s

    # ------------------------------------------------------------ inference
    def infer_action(self, raw_obs, ids, policy="e_greedy", eps=0, block=True):
        view, feature = raw_obs[0], raw_obs[1]
        n = len(ids)
        if n == 0:
            return np.empty(0, np.int32)
        if policy == "greedy":
            eps = 0.0
        states = self._get_agent_states(ids)
        padded = round_up_pow2(n)
        ps = np.zeros((padded, self.state_size), np.float32)
        pv = np.zeros((padded,) + tuple(self.view_space), np.float32)
        pf = np.zeros((padded,) + tuple(self.feature_space), np.float32)
        ps[:n], pv[:n], pf[:n] = states, view, feature
        self.key, sub = jax.random.split(self.key)
        new_state, acts = self._step_fn(self.params, ps, pv, pf, sub,
                                        jnp.float32(eps))
        self._set_agent_states(ids, np.asarray(new_state[:n]))
        return np.asarray(acts[:n], np.int32)

    # ------------------------------------------------------------- training
    def _add_to_replay_buffer(self, sample_buffer):
        n = 0
        for episode in sample_buffer.episodes():
            v, f = np.asarray(episode.views), np.asarray(episode.features)
            a = np.asarray(episode.actions, np.int32)
            r = np.asarray(episode.rewards, np.float32)
            m = len(r)
            mask = np.ones(m, np.float32)
            terminal = np.zeros(m, bool)
            if episode.terminal:
                terminal[-1] = True
            else:
                mask[-1] = 0
            self.replay_buffer.append((v, f, a, r, terminal, mask))
            self.replay_buffer_lens.append(m)
            n += m
        # evict oldest episodes beyond memory_size total steps
        while sum(self.replay_buffer_lens) > self.memory_size and len(
            self.replay_buffer
        ) > 1:
            self.replay_buffer.pop(0)
            self.replay_buffer_lens.pop(0)
        return n

    def train(self, sample_buffer, print_every=500, **kwargs):
        add_num = self._add_to_replay_buffer(sample_buffer)
        B, U = self.batch_size, self.unroll_step
        lens = np.asarray(self.replay_buffer_lens, np.float64)
        weight = lens / lens.sum()

        n_batches = int(self.train_freq * add_num / (B * U))
        if n_batches == 0:
            return 0, 0
        print("batches: %d  add: %d  replay_len: %d/%d" %
              (n_batches, add_num, int(lens.sum()), self.memory_size))

        vs = np.zeros((U + 1, B) + tuple(self.view_space), np.float32)
        fs = np.zeros((U + 1, B) + tuple(self.feature_space), np.float32)
        as_ = np.zeros((U, B), np.int32)
        rs = np.zeros((U, B), np.float32)
        ts = np.zeros((U, B), bool)
        ms = np.zeros((U, B), np.float32)

        total_loss, mean_target, ct = 0.0, 0.0, 0
        losses, last_tgt = [], 0.0
        start_time = time.time()
        for _ in range(n_batches):
            idx = np.random.choice(len(self.replay_buffer), B, p=weight)
            # reset ALL window buffers: rows beyond a short window's `real`
            # are loss-masked but still flow into jnp.mean(target), so stale
            # actions/rewards from the previous batch would corrupt the
            # reported qvalue metric
            vs[:] = 0; fs[:] = 0; as_[:] = 0; rs[:] = 0; ms[:] = 0
            ts[:] = False
            for j, e_i in enumerate(idx):
                v, f, a, r, t, m = self.replay_buffer[e_i]
                length = len(a)
                start = np.random.randint(length)
                real = min(length - start, U)
                # obs window covers [start, start+real]; when the episode
                # ends inside the window the final next-obs is a duplicate
                # of the last obs (its transition is masked below)
                end = min(start + real + 1, length)
                vs[: end - start, j] = v[start:end]
                fs[: end - start, j] = f[start:end]
                if end - start == real:
                    vs[real, j] = v[end - 1]
                    fs[real, j] = f[end - 1]
                as_[:real, j] = a[start : start + real]
                rs[:real, j] = r[start : start + real]
                ts[:real, j] = t[start : start + real]
                ms[:real, j] = m[start : start + real]
                if start + real == length and not t[length - 1]:
                    # truncated episode tail: no valid next obs (drqn.py:362)
                    ms[real - 1, j] = 0.0
            self.params, self.opt_state, loss, tgt = self._train_step(
                self.params, self.opt_state, self.target_params,
                vs, fs, as_, rs, ts, ms,
            )
            # keep metrics on-device between prints: float() costs a
            # ~25-30ms host round-trip per batch on the tunnel backend
            losses.append(loss)
            last_tgt = tgt
            if ct % self.target_update == 0:
                self.target_params = jax.tree.map(lambda x: x, self.params)
            if ct % print_every == 0:
                print("batch %5d, loss %.6f, qvalue %.6f" %
                      (ct, float(loss), float(tgt)))
            ct += 1
            self.train_ct += 1

        total_loss = float(jnp.sum(jnp.stack(losses))) if losses else 0.0
        mean_target = float(last_tgt) if losses else 0.0
        total_time = time.time() - start_time
        print("batches: %d,  total time: %.2f,  1k average: %.2f" %
              (ct, total_time, total_time / max(1.0, ct / 1000.0)))
        return total_loss / max(ct, 1), self._eval(mean_target)

    def _eval(self, fallback):
        """Estimated q on the held-out eval set: TARGET-net q values with a
        zero initial RNN state (one-step unroll), plain mean over actions —
        exactly the reference's eval feed (reference drqn.py:567-575);
        falls back to the mean training target without an eval set."""
        if self.eval_obs is None:
            return float(fallback)
        ev = np.asarray(self.eval_obs[0], np.float32)
        ef = np.asarray(self.eval_obs[1], np.float32)
        n = len(ev)
        padded = round_up_pow2(n)
        pv = np.zeros((padded,) + tuple(self.view_space), np.float32)
        pf = np.zeros((padded,) + tuple(self.feature_space), np.float32)
        pv[:n], pf[:n] = ev, ef
        q = self._eval_q_fn(self.target_params, pv, pf)
        return float(jnp.mean(q[:n]))

    def get_info(self):
        return "drqn train_time: %d" % self.train_ct
