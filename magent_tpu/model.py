"""Model hosting layer.

``BaseModel`` is the reference model contract (reference:
python/magent/model.py:14-66).  ``ProcessingModel`` keeps the reference's
non-blocking ``infer_action``/``sample_step``/``train`` API (reference:
model.py:115-285) but hosts the model **in-process**: the reference needed a
subprocess per group so two TensorFlow sessions could overlap on one GPU,
while here env and policies are JAX programs sharing one device — XLA's async
dispatch already overlaps both groups' inference, so the pipe/pickle transport
is dropped rather than translated.
"""

from __future__ import annotations

from .utility import EpisodesBuffer


class BaseModel:
    def __init__(self, env, handle, *args, **kwargs):
        """Init a model of a group of agents in an environment."""
        self.env = env
        self.handle = handle

    def infer_action(self, raw_obs, ids, *args, **kwargs):
        """Infer actions for the given observations.

        Parameters
        ----------
        raw_obs: tuple(numpy array, numpy array)
            (views, features)
        ids: numpy array of int32
            agent ids

        Returns
        -------
        actions: numpy array of int32
        """
        raise NotImplementedError

    def train(self, sample_buffer, **kwargs):
        """Feed new samples and train; returns loss and estimated mean state value."""
        return 0, 0

    def save(self, *args, **kwargs):
        raise NotImplementedError

    def load(self, *args, **kwargs):
        raise NotImplementedError


class ProcessingModel(BaseModel):
    """Non-blocking facade over an in-process model.

    Signature matches the reference (model.py:115-155): ``ProcessingModel(env,
    handle, name, port, sample_buffer_capacity, RLModel, **kwargs)``; ``port``
    is accepted for compatibility and ignored (no pipe transport).
    """

    def __init__(self, env, handle, name, port=0, sample_buffer_capacity=1000,
                 RLModel=None, **kwargs):
        super().__init__(env, handle)
        assert RLModel is not None
        self.name = name
        self.model = RLModel(env, handle, name, **kwargs)
        self.sample_buffer = EpisodesBuffer(capacity=sample_buffer_capacity)
        self._pending_action = None
        self._pending_train = None
        self._last_obs = None
        self._last_ids = None
        self._last_acts = None

    # ------------------------------------------------------------- inference
    def infer_action(self, raw_obs, ids, policy='e_greedy', eps=0, block=True):
        self._last_obs = raw_obs
        self._last_ids = ids
        self._last_acts = self.model.infer_action(raw_obs, ids, policy=policy, eps=eps)
        self._pending_action = self._last_acts
        if block:
            return self.fetch_action()
        return None

    def fetch_action(self):
        act = self._pending_action
        self._pending_action = None
        return act

    # -------------------------------------------------------------- sampling
    def sample_step(self, rewards, alives, block=True):
        if self._last_acts is None:
            raise RuntimeError("sample_step before infer_action")
        self.sample_buffer.record_step(
            self._last_ids, self._last_obs, self._last_acts, rewards, alives
        )
        self._last_acts = None  # a duplicate sample must not re-record

    def fetch_sample(self):
        return None

    def check_done(self):
        return None

    # -------------------------------------------------------------- training
    def train(self, print_every=5000, block=True, **kwargs):
        self._pending_train = self.model.train(
            self.sample_buffer, print_every=print_every, **kwargs
        )
        self.sample_buffer = EpisodesBuffer(self.sample_buffer.capacity)
        if block:
            return self._pending_train
        return None

    def fetch_train(self):
        res = self._pending_train
        self._pending_train = None
        return res

    # ------------------------------------------------------------ checkpoint
    def save(self, save_dir, epoch):
        self.model.save(save_dir, epoch)

    def load(self, save_dir, epoch, name=None):
        self.model.load(save_dir, epoch, name)

    def quit(self):
        pass


# --------------------------------------------------------- subprocess hosting
_CHUNK_BYTES = 1 << 28  # pipe segments: 256MB of raw bytes per message


def _send_arrays(conn, arrays):
    """Ship numpy arrays over a Connection: one picklable header (shapes +
    dtypes), then each array's raw bytes in fixed-size segments.  Large
    buffers never go through pickle."""
    import numpy as np

    arrays = [np.ascontiguousarray(a) for a in arrays]
    conn.send([(a.shape, a.dtype.str) for a in arrays])
    for a in arrays:
        view = memoryview(a).cast("B")
        if len(view) == 0:
            conn.send_bytes(b"")
            continue
        for off in range(0, len(view), _CHUNK_BYTES):
            conn.send_bytes(view[off : off + _CHUNK_BYTES])


def _recv_arrays(conn):
    import numpy as np

    out = []
    for shape, dtype in conn.recv():
        n_bytes = int(np.prod(shape)) * np.dtype(dtype).itemsize
        buf = bytearray(n_bytes)
        if n_bytes == 0:
            conn.recv_bytes()  # the sender's placeholder segment
        else:
            view = memoryview(buf)
            off = 0
            while off < n_bytes:
                off += conn.recv_bytes_into(view[off:])
        out.append(np.frombuffer(buf, dtype=dtype).reshape(shape))
    return out


class _SpaceStub:
    """Picklable stand-in for the env inside a model worker: models only
    read the group's spaces at construction time."""

    def __init__(self, view_space, feature_space, action_space):
        self._view = view_space
        self._feature = feature_space
        self._action = action_space

    def get_view_space(self, handle):
        return self._view

    def get_feature_space(self, handle):
        return self._feature

    def get_action_space(self, handle):
        return self._action


def _model_worker(conn, buffer_capacity, RLModel, model_args):
    """Subprocess body hosting one model behind the command pipe.

    Commands arrive as ``(name, payload)`` tuples; array operands travel as
    raw byte segments (:func:`_send_arrays`).  Runs JAX on CPU by default so
    the parent keeps the accelerator (``platform`` in model_args overrides).
    """
    import numpy as np

    platform = model_args.pop("platform", "cpu")
    if platform:
        import jax

        jax.config.update("jax_platforms", platform)

    model = RLModel(**model_args)
    buffer = EpisodesBuffer(capacity=buffer_capacity)
    last = {}

    while True:
        cmd, payload = conn.recv()
        if cmd == "act":
            policy, eps = payload
            view, feature, ids = _recv_arrays(conn)
            acts = model.infer_action((view, feature), ids, policy=policy,
                                      eps=eps)
            last = dict(obs=(view, feature), ids=ids, acts=acts)
            _send_arrays(conn, [np.asarray(acts)])
        elif cmd == "sample":
            rewards, alives = _recv_arrays(conn)
            if not last:
                # protocol misuse ('sample' with no 'act' since the last
                # sample): report it instead of KeyError-ing the worker and
                # leaving the parent blocked on a dead pipe
                conn.send(("err", "sample before act"))
            else:
                buffer.record_step(last["ids"], last["obs"], last["acts"],
                                   rewards, alives)
                last = {}  # a second 'sample' must not re-record this step
                conn.send(("ok", None))
        elif cmd == "train":
            print_every, extra = payload
            result = model.train(buffer, print_every=print_every, **extra)
            buffer = EpisodesBuffer(capacity=buffer_capacity)
            conn.send(("ok", result))
        elif cmd == "save":
            model.save(*payload)
            conn.send(("ok", None))
        elif cmd == "load":
            model.load(*payload)
            conn.send(("ok", None))
        elif cmd == "quit":
            conn.close()
            return
        else:
            # reply instead of looping silently: a silent fall-through would
            # deadlock the parent's pending recv
            conn.send(("err", "unknown command %r" % (cmd,)))


class SubprocessModel(BaseModel):
    """Cross-process model hosting with the reference's non-blocking facade
    over a real pipe (capability parity with reference
    python/magent/model.py:115-347, re-designed around a (command, payload)
    protocol + segmented raw-byte array transport).

    The in-process :class:`ProcessingModel` is the default on one chip (XLA
    async dispatch already overlaps groups); this variant actually overlaps
    the HOST-side Python work (replay-buffer bookkeeping, batching) in a
    separate process, which is what the reference's subprocess bought.  The
    worker runs JAX on CPU unless ``platform`` says otherwise.
    """

    def __init__(self, env, handle, name, port=0, sample_buffer_capacity=1000,
                 RLModel=None, platform="cpu", **kwargs):
        import multiprocessing as mp
        import numpy as np

        super().__init__(env, handle)
        assert RLModel is not None
        self._np = np
        self.name = name
        stub = _SpaceStub(env.get_view_space(handle),
                          env.get_feature_space(handle),
                          env.get_action_space(handle))
        model_args = dict(kwargs)
        model_args.update(env=stub, handle=handle, name=name,
                          platform=platform)

        ctx = mp.get_context("spawn")
        self.conn, child = ctx.Pipe()
        self.proc = ctx.Process(
            target=_model_worker,
            args=(child, sample_buffer_capacity, RLModel, model_args),
            daemon=True,
        )
        self.proc.start()
        child.close()

    def _ack(self):
        status, payload = self.conn.recv()
        if status != "ok":
            raise RuntimeError("model worker error: %s" % (payload,))
        return payload

    # ------------------------------------------------------------- inference
    def infer_action(self, raw_obs, ids, policy="e_greedy", eps=0, block=True):
        np = self._np
        self.conn.send(("act", (policy, eps)))
        _send_arrays(self.conn, [np.asarray(raw_obs[0]),
                                 np.asarray(raw_obs[1]), np.asarray(ids)])
        if block:
            return self.fetch_action()
        return None

    def fetch_action(self):
        return _recv_arrays(self.conn)[0]

    # -------------------------------------------------------------- sampling
    def sample_step(self, rewards, alives, block=True):
        np = self._np
        self.conn.send(("sample", None))
        _send_arrays(self.conn, [np.asarray(rewards, np.float32),
                                 np.asarray(alives, bool)])
        if block:
            return self.check_done()
        return None

    def fetch_sample(self):
        return self.check_done()

    def check_done(self):
        self._ack()
        return "done"

    # -------------------------------------------------------------- training
    def train(self, print_every=5000, block=True, **kwargs):
        self.conn.send(("train", (print_every, kwargs)))
        if block:
            return self.fetch_train()
        return None

    def fetch_train(self):
        return self._ack()

    # ------------------------------------------------------------ checkpoint
    def save(self, save_dir, epoch):
        self.conn.send(("save", (save_dir, epoch)))
        self._ack()

    def load(self, save_dir, epoch, name=None):
        self.conn.send(("load", (save_dir, epoch, name)))
        self._ack()

    def quit(self):
        try:
            self.conn.send(("quit", None))
        except (BrokenPipeError, OSError):
            pass
        self.proc.join(timeout=10)
