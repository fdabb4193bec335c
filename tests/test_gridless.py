"""The gridless lockstep path must be bit-exact with the grid-maintaining
engine (same quad kernels, same priorities) on gridless-capable configs."""

import os

import numpy as np
import jax

from magent_tpu.builtin.config import battle
from magent_tpu.parallel import VecGridWorld


def test_gridless_matches_grid_path():
    cfg = battle.get_config(40)
    old = os.environ.get("MAGENT_GRIDLESS")
    try:
        os.environ["MAGENT_GRIDLESS"] = "0"
        v_grid = VecGridWorld(cfg, [24, 24], n_envs=3)
        os.environ.pop("MAGENT_GRIDLESS")
        v_free = VecGridWorld(cfg, [24, 24], n_envs=3)
    finally:
        if old is not None:
            os.environ["MAGENT_GRIDLESS"] = old
        else:
            os.environ.pop("MAGENT_GRIDLESS", None)

    s1 = v_grid.reset(jax.random.PRNGKey(0))
    s2 = jax.tree.map(lambda a: a, s1)
    key = jax.random.PRNGKey(1)
    for _ in range(25):
        key, akey = jax.random.split(key)
        acts = v_grid.random_actions(akey)
        s1, r1, a1, d1 = v_grid.transition(s1, acts)
        s2, r2, a2, d2 = v_free.transition(s2, acts)
        for name in ("x", "y", "hp", "dead", "last_op", "op_obj",
                     "last_reward", "next_reward"):
            np.testing.assert_array_equal(
                np.asarray(getattr(s1, name)), np.asarray(getattr(s2, name)),
                err_msg=name)
        np.testing.assert_array_equal(np.asarray(r1), np.asarray(r2))
        np.testing.assert_array_equal(np.asarray(d1), np.asarray(d2))
