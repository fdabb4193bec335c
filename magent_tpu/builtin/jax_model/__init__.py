from .dqn import DeepQNetwork
from .drqn import DeepRecurrentQNetwork
from .a2c import AdvantageActorCritic

__all__ = ["DeepQNetwork", "DeepRecurrentQNetwork", "AdvantageActorCritic"]
