"""TPU scale-out layer.

The reference scales with OpenMP threads inside one C++ env plus one
subprocess per group for model hosting (reference: src/gridworld/GridWorld.cc
stripe decomposition, python/magent/model.py:115-285).  Here the scaling axes
are TPU-native instead:

- :mod:`vec_env` — a functional environment core ``(state, actions, key) ->
  state`` vmapped over an env batch; thousands of envs step in lockstep in one
  XLA program.
- :mod:`sharding` — mesh construction and sharding rules: env batches shard
  over the ``dp`` mesh axis, model weights optionally shard over ``tp``; XLA
  inserts the ICI collectives.
- :mod:`train` — fused rollout + DQN learner step compiled as one pjit
  program over the mesh (replaces the reference's pipe-connected subprocess
  learners).
"""

from .vec_env import VecGridWorld
from .sharding import make_mesh, state_sharding, param_sharding
from .train import (make_a2c_train_loop, make_a2c_train_step,
                    make_dqn_train_loop, make_dqn_remat_train_loop,
                    make_dqn_train_step,
                    make_dqn_train_step_remat,
                    make_drqn_train_loop, make_drqn_train_step,
                    init_drqn_hiddens, make_eval_q, sample_eval_set)

__all__ = [
    "VecGridWorld",
    "make_mesh",
    "state_sharding",
    "param_sharding",
    "make_dqn_train_step",
    "make_dqn_train_loop",
    "make_dqn_remat_train_loop",
    "make_dqn_train_step_remat",
    "make_a2c_train_step",
    "make_a2c_train_loop",
    "make_drqn_train_step",
    "make_drqn_train_loop",
    "make_eval_q",
    "sample_eval_set",
    "init_drqn_hiddens",
]
