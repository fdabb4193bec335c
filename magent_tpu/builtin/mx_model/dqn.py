"""Import-path alias: the reference's second-backend DQN lived at
``magent.builtin.mx_model.dqn``; the implementation is the torch model."""

from ..torch_model.dqn import DeepQNetwork, TorchDQNNet  # noqa: F401
