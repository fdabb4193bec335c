"""Torch (CPU) backend — the independent second NN backend (the reference
ships TF + MXNet; python/magent/builtin/mx_model exposes DQN and A2C)."""

from .a2c import AdvantageActorCritic
from .dqn import DeepQNetwork

__all__ = ["DeepQNetwork", "AdvantageActorCritic"]
