"""Compatibility alias: the reference exposed this under
``magent.builtin.mx_model.drqn``; the implementation is the JAX model."""

from ..jax_model.drqn import *  # noqa: F401,F403
from ..jax_model.drqn import DeepRecurrentQNetwork  # noqa: F401
