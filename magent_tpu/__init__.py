"""magent_tpu: a TPU-native many-agent gridworld RL framework.

Brand-new JAX/XLA implementation with the capabilities of the reference
MAgent platform (many-agent gridworld engine, declarative reward-rule DSL,
parameter-sharing RL baselines, replay rendering), re-designed TPU-first:
the entire environment step is batched jitted array ops over fixed-capacity
masked agent arrays; env batches shard over device meshes via ``jax.sharding``.

Public surface mirrors the reference package (reference:
python/magent/__init__.py): ``magent.GridWorld``, ``magent.gridworld`` (config
DSL), ``magent.utility``, ``magent.ProcessingModel``.
"""

import os as _os

# Honor JAX_PLATFORMS=cpu even when a site-installed PJRT plugin (the axon
# TPU tunnel) has force-registered itself as the default backend.
if _os.environ.get("JAX_PLATFORMS", "").split(",")[0] == "cpu":
    try:
        import jax as _jax

        _jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass

# Opt-in persistent XLA compile cache (MAGENT_JAX_CACHE=<dir>): env vars
# alone don't enable it on this jax version, and subprocess-hosted models
# (model.SubprocessModel children) never run tests/conftest.py — an
# inherited env var is the only channel that reaches them.
if _os.environ.get("MAGENT_JAX_CACHE"):
    try:
        import jax as _jax

        _jax.config.update("jax_compilation_cache_dir",
                           _os.environ["MAGENT_JAX_CACHE"])
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.2)
        _jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass

from . import gridworld
from . import utility
from .env import GridWorld
from .discrete_snake import DiscreteSnake
from .model import BaseModel, ProcessingModel, SubprocessModel

round = utility.rec_round

__all__ = ["GridWorld", "gridworld", "utility", "BaseModel", "ProcessingModel", "SubprocessModel", "round"]
