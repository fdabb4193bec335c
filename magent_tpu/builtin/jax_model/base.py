"""Checkpointing base for JAX models.

Per-model directories ``save_model/<name>/<subclass>_<epoch>`` with
cross-name restore like the reference (reference:
python/magent/builtin/tf_model/base.py:24-76); checkpoints are flat
numpy archives of the parameter pytree.
"""

from __future__ import annotations

import os

import numpy as np
import jax

from ...model import BaseModel


def _flatten_pytree(tree, prefix=""):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten_pytree(v, prefix + k + "/"))
    else:
        out[prefix[:-1]] = np.asarray(tree)
    return out


def _unflatten_pytree(flat):
    tree = {}
    for key, value in flat.items():
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value
    return tree


def latest_epoch(dir_name, name, subclass=None):
    """Highest saved epoch of ``dir_name/name`` or None when absent.
    With ``subclass=None`` any model family's checkpoints count
    (tfdqn/tfdrqn/tfa2c save under different prefixes)."""
    import re

    path = os.path.join(dir_name, name)
    if not os.path.isdir(path):
        return None
    pat = r"%s_(\d+)\.npz$" % (subclass if subclass else r"[a-z0-9]+")
    epochs = [int(m.group(1)) for f in os.listdir(path)
              for m in [re.match(pat, f)] if m]
    return max(epochs) if epochs else None


def round_up_pow2(n, lo=64):
    """pad agent batches to power-of-two buckets so XLA compiles few shapes"""
    m = lo
    while m < n:
        m *= 2
    return m


class JaxBaseModel(BaseModel):
    def __init__(self, env, handle, name, subclass_name):
        super().__init__(env, handle)
        self.name = name
        self.subclass_name = subclass_name

    # subclasses expose .params (pytree) and accept .replace_params(tree)
    def get_params(self):
        raise NotImplementedError

    def set_params(self, tree):
        raise NotImplementedError

    def save(self, dir_name, epoch):
        """save model to dir_name/name/subclass_epoch.npz"""
        dir_name = os.path.join(dir_name, self.name)
        os.makedirs(dir_name, exist_ok=True)  # nested paths, concurrent savers
        path = os.path.join(dir_name, self.subclass_name + "_%d.npz" % epoch)
        np.savez(path, **_flatten_pytree(jax.device_get(self.get_params())))

    def load(self, dir_name, epoch=0, name=None):
        """load model; ``name`` allows restoring another model's weights"""
        name = name or self.name
        path = os.path.join(dir_name, name, self.subclass_name + "_%d.npz" % epoch)
        flat = dict(np.load(path))
        self.set_params(_unflatten_pytree(flat))
