"""Compatibility alias: the reference exposed this under
``magent.builtin.tf_model.a2c``; the implementation is the JAX model."""

from ..jax_model.a2c import *  # noqa: F401,F403
from ..jax_model.a2c import AdvantageActorCritic  # noqa: F401
