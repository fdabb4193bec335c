"""Compatibility alias: the reference exposed this under
``magent.builtin.mx_model.dqn``; the implementation is the JAX model."""

from ..jax_model.dqn import *  # noqa: F401,F403
from ..jax_model.dqn import DeepQNetwork  # noqa: F401
