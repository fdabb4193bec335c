"""Abstract environment base (reference: python/magent/environment.py).

Kept for API parity: concrete environments (GridWorld, DiscreteSnake)
implement this surface."""


class Environment:
    def __init__(self):
        pass

    def reset(self):
        pass

    def get_observation(self, handle):
        pass

    def set_action(self, handle, actions):
        pass

    def step(self):
        pass

    def render(self):
        pass

    def get_reward(self, handle):
        pass
