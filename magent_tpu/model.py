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
        self.sample_buffer.record_step(
            self._last_ids, self._last_obs, self._last_acts, rewards, alives
        )

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
class NDArrayPackage:
    """Raw-bytes numpy transport, segmented at 2^30/4 elements
    (reference: python/magent/model.py:70-112)."""

    MAX_LEN = (1 << 30) / 4

    def __init__(self, *args):
        import numpy as np

        if isinstance(args[0], np.ndarray):
            self.data = args
            self.info = [(x.shape, x.dtype) for x in args]
        else:
            self.data = None
            self.info = args[0]

    def send_to(self, conn):
        import numpy as np

        for x in self.data:
            x = np.ascontiguousarray(x)
            if np.prod(x.shape) > self.MAX_LEN:
                seg = int(self.MAX_LEN // max(np.prod(x.shape[1:]), 1))
                for pt in range(0, len(x), seg):
                    conn.send_bytes(x[pt:pt + seg])
            else:
                conn.send_bytes(x)

    def recv_from(self, conn):
        import numpy as np

        bufs = []
        for shape, dtype in self.info:
            buf = np.empty((int(np.prod(shape)),), dtype=dtype)
            item = int(np.prod(shape[1:])) or 1
            if np.prod(shape) > self.MAX_LEN:
                seg = int(self.MAX_LEN // item)
                for pt in range(0, int(np.prod(shape)), seg * item):
                    conn.recv_bytes_into(buf[pt:pt + seg * item])
            else:
                conn.recv_bytes_into(buf)
            bufs.append(buf.reshape(shape))
        return bufs


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


def model_client(conn, sample_buffer_capacity, RLModel, model_args):
    """Worker loop hosting one model in a subprocess (reference:
    python/magent/model.py:288-347).  Runs JAX on CPU by default so the
    parent keeps the accelerator (override with platform='tpu')."""
    platform = model_args.pop("platform", "cpu")
    if platform:
        import jax

        jax.config.update("jax_platforms", platform)

    model = RLModel(**model_args)
    sample_buffer = EpisodesBuffer(capacity=sample_buffer_capacity)
    obs = ids = acts = None

    while True:
        cmd = conn.recv()
        if cmd[0] == "act":
            policy, eps, array_info = cmd[1], cmd[2], cmd[3]
            view, feature, ids = NDArrayPackage(array_info).recv_from(conn)
            obs = (view, feature)
            acts = model.infer_action(obs, ids, policy=policy, eps=eps)
            package = NDArrayPackage(acts)
            conn.send(package.info)
            package.send_to(conn)
        elif cmd[0] == "sample":
            rewards, alives = NDArrayPackage(cmd[1]).recv_from(conn)
            sample_buffer.record_step(ids, obs, acts, rewards, alives)
            conn.send("done")
        elif cmd[0] == "train":
            total_loss, value = model.train(sample_buffer,
                                            print_every=cmd[1], **cmd[2])
            sample_buffer = EpisodesBuffer(sample_buffer_capacity)
            conn.send((total_loss, value))
        elif cmd[0] == "save":
            model.save(cmd[1], cmd[2])
            conn.send("done")
        elif cmd[0] == "load":
            model.load(cmd[1], cmd[2], cmd[3])
            conn.send("done")
        elif cmd[0] == "quit":
            conn.close()
            break
        else:
            # reply instead of looping silently: a silent fall-through would
            # deadlock the parent's pending recv
            conn.send(("error", "unknown command %r" % (cmd[0],)))


class SubprocessModel(BaseModel):
    """Cross-process model hosting with the reference's non-blocking
    protocol over a real pipe (reference: python/magent/model.py:115-285).

    The in-process :class:`ProcessingModel` is the default on one chip
    (XLA async dispatch already overlaps groups); this variant actually
    overlaps the HOST-side Python work (replay-buffer bookkeeping, batching)
    in a separate process, which is what the reference's subprocess bought.
    The worker runs JAX on CPU unless ``platform`` says otherwise.
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
            target=model_client,
            args=(child, sample_buffer_capacity, RLModel, model_args),
            daemon=True,
        )
        self.proc.start()
        child.close()

    # ------------------------------------------------------------- inference
    def infer_action(self, raw_obs, ids, policy="e_greedy", eps=0, block=True):
        np = self._np
        view, feature = np.asarray(raw_obs[0]), np.asarray(raw_obs[1])
        ids = np.asarray(ids)
        package = NDArrayPackage(view, feature, ids)
        self.conn.send(["act", policy, eps, package.info])
        package.send_to(self.conn)
        if block:
            return self.fetch_action()
        return None

    def fetch_action(self):
        info = self.conn.recv()
        return NDArrayPackage(info).recv_from(self.conn)[0]

    # -------------------------------------------------------------- sampling
    def sample_step(self, rewards, alives, block=True):
        np = self._np
        package = NDArrayPackage(np.asarray(rewards, np.float32),
                                 np.asarray(alives, bool))
        self.conn.send(["sample", package.info])
        package.send_to(self.conn)
        if block:
            return self.check_done()
        return None

    def fetch_sample(self):
        return self.check_done()

    def check_done(self):
        assert self.conn.recv() == "done"
        return "done"

    # -------------------------------------------------------------- training
    def train(self, print_every=5000, block=True, **kwargs):
        self.conn.send(["train", print_every, kwargs])
        if block:
            return self.fetch_train()
        return None

    def fetch_train(self):
        return self.conn.recv()

    # ------------------------------------------------------------ checkpoint
    def save(self, save_dir, epoch):
        self.conn.send(["save", save_dir, epoch])
        assert self.conn.recv() == "done"

    def load(self, save_dir, epoch, name=None):
        self.conn.send(["load", save_dir, epoch, name])
        assert self.conn.recv() == "done"

    def quit(self):
        try:
            self.conn.send(["quit"])
        except (BrokenPipeError, OSError):
            pass
        self.proc.join(timeout=10)
