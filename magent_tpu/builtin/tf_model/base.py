"""Compatibility alias: the reference exposed this under
``magent.builtin.tf_model.base``; the implementation is the JAX model."""

from ..jax_model.base import *  # noqa: F401,F403
from ..jax_model.base import JaxBaseModel  # noqa: F401
