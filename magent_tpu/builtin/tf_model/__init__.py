"""Compatibility alias: the reference exposed its models under
``magent.builtin.tf_model``; here they are JAX models (builtin.jax_model)."""

from ..jax_model import *  # noqa: F401,F403
from ..jax_model import DeepQNetwork  # noqa: F401
