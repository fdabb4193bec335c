"""Mesh construction and sharding rules.

Replaces the reference's process/transport plumbing (OpenMP stripes inside
the env, `multiprocessing` pipes between env and learners, multi-GPU
round-robin inference — reference: src/gridworld/GridWorld.cc:75-85,
python/magent/model.py:70-155, builtin/tf_model/dqn.py:368-393) with JAX
shardings over a device mesh:

- ``dp`` axis: env batch / replay batch data parallelism — each device owns a
  slice of envs and computes gradients on its own transitions; XLA inserts
  the gradient ``psum`` over ICI.
- ``tp`` axis: optional tensor parallelism over the policy MLP hidden dims
  (useful when the per-device env slice is small but the net is wide).
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, tp: int = 1, devices=None) -> Mesh:
    """Build a ("dp", "tp") mesh over the first ``n_devices`` devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    devices = devices[:n_devices]
    assert n_devices % tp == 0, (n_devices, tp)
    dp = n_devices // tp
    return Mesh(np.asarray(devices).reshape(dp, tp), ("dp", "tp"))


def state_sharding(mesh: Mesh, state_or_tree):
    """Shard every leaf's leading (env-batch) axis over ``dp``."""
    sh = NamedSharding(mesh, P("dp"))
    return jax.tree.map(lambda _: sh, state_or_tree)


def param_sharding(mesh: Mesh, params, tp_axis_min: int = 128):
    """Replicate params; shard wide matmul output dims over ``tp``.

    A 2-D kernel whose output dim is divisible by the ``tp`` size (and at
    least ``tp_axis_min``) is column-sharded; everything else (biases, conv
    kernels, scalars) is replicated.
    """
    tp = mesh.shape["tp"]

    def rule(x):
        if (
            tp > 1
            and hasattr(x, "ndim")
            and x.ndim == 2
            and x.shape[1] >= tp_axis_min
            and x.shape[1] % tp == 0
        ):
            return NamedSharding(mesh, P(None, "tp"))
        return NamedSharding(mesh, P())

    return jax.tree.map(rule, params)


def replicated(mesh: Mesh, tree):
    sh = NamedSharding(mesh, P())
    return jax.tree.map(lambda _: sh, tree)
