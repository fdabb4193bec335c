"""minstd_rand0 LCG replicating the reference engine RNG.

The reference engine uses ``std::default_random_engine`` (GNU libstdc++ =
``minstd_rand0``: x' = 16807 * x mod 2147483647), seeded 0 at construction
(which the standard maps to 1) and reseedable via the ``seed`` config
(reference: src/gridworld/GridWorld.cc:29,144-145).  It drives random agent
placement (Map.cc:49-63), spawn directions in turn mode (GridWorld.cc:230) and
the attack-order Fisher-Yates shuffle (GridWorld.cc:464-468).

Host-side (numpy) helpers drive placement and the sequential parity engine;
the fast engine derives its shuffle priorities from its own threefry key.
"""

from __future__ import annotations

import numpy as np

M = 2147483647  # 2^31 - 1
A = 16807


def seed_state(seed: int) -> np.uint32:
    """Map a user seed to engine state (0 -> 1, like libstdc++)."""
    s = int(seed) % M
    return np.uint32(1 if s == 0 else s)


def next_host(state: np.uint32) -> tuple[np.uint32, int]:
    """Advance once; returns (new_state, drawn_value). The drawn value IS the
    new state, matching ``linear_congruential_engine::operator()``."""
    nxt = (int(state) * A) % M
    return np.uint32(nxt), nxt


class HostLCG:
    """Mutable host-side engine RNG."""

    def __init__(self, seed: int = 0):
        self.state = seed_state(seed)

    def seed(self, seed: int):
        self.state = seed_state(seed)

    def __call__(self) -> int:
        self.state, val = next_host(self.state)
        return val

