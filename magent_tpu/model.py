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
