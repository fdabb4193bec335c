"""Import-path alias: the reference exposed its SECOND NN backend under
``magent.builtin.mx_model`` (MXNet DQN + A2C,
python/magent/builtin/mx_model/__init__.py); here the second backend is
torch (builtin.torch_model) with the same two model families."""

from ..torch_model import AdvantageActorCritic, DeepQNetwork  # noqa: F401

__all__ = ["DeepQNetwork", "AdvantageActorCritic"]
