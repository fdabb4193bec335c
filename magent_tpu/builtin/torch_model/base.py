"""Checkpointing base for the torch backend.

The torch models are the INDEPENDENT second NN backend (the reference
ships two: TensorFlow + MXNet, python/magent/builtin/{tf,mx}_model).
They implement the same BaseModel surface as the JAX models against the
same environments and EpisodesBuffer, with torch (CPU) doing the math —
numerics and parameter layouts are this backend's own.

Checkpoints use the same per-model directory scheme
(``save_model/<name>/<subclass>_<epoch>.npz``, flat numpy archives of the
state_dict) so ``latest_epoch``/plot tooling work unchanged; the subclass
prefixes (``thdqn``/``tha2c``) keep them distinct from the JAX families,
exactly like the reference's ``tfdqn`` vs ``mxdqn`` split.
"""

from __future__ import annotations

import os

import numpy as np

from ...model import BaseModel
from ..jax_model.base import latest_epoch, round_up_pow2  # shared helpers

__all__ = ["TorchBaseModel", "latest_epoch", "round_up_pow2"]


class TorchBaseModel(BaseModel):
    def __init__(self, env, handle, name, subclass_name):
        super().__init__(env, handle)
        self.name = name
        self.subclass_name = subclass_name

    # subclasses expose .net (nn.Module); override these for extra state
    def state_arrays(self):
        return {k: v.detach().cpu().numpy()
                for k, v in self.net.state_dict().items()}

    def load_state_arrays(self, flat):
        import torch

        self.net.load_state_dict(
            {k: torch.from_numpy(np.asarray(v)) for k, v in flat.items()})

    def save(self, dir_name, epoch):
        dir_name = os.path.join(dir_name, self.name)
        os.makedirs(dir_name, exist_ok=True)
        path = os.path.join(dir_name, self.subclass_name + "_%d.npz" % epoch)
        np.savez(path, **self.state_arrays())

    def load(self, dir_name, epoch=0, name=None):
        name = name or self.name
        path = os.path.join(dir_name, name,
                            self.subclass_name + "_%d.npz" % epoch)
        self.load_state_arrays(dict(np.load(path)))
