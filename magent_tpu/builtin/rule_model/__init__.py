from .random import RandomActor
from .rush import RushPredator
from .runaway import RunawayPrey
from .rushgather import RushGatherer

__all__ = ["RandomActor", "RushPredator", "RunawayPrey", "RushGatherer"]
