"""On-chip differential for the segmented pair sweeps: the gridless engine
with MAGENT_SEG=1 (forced here) must stay bit-exact with the
grid-maintaining engine.  Segmentation only engages for
QUAD_MAX < A <= SEG_MAX on a rect config — at A <= QUAD_MAX this script
instead diffs the plain quad gridless path (still a valid check, flagged
in the output); CPU tests can't reach either (supports_pallas gates
them)."""

import math
import os
import sys

os.environ["MAGENT_SEG"] = "1"  # opt the engine into the segmented sweeps
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np
import jax

from magent_tpu.parallel import VecGridWorld
from test_1m import load_forest  # noqa: E402


def build(n, seed=3):
    map_size = int(math.sqrt(n * 20))
    cfg = load_forest(map_size)
    rng = np.random.RandomState(seed)
    taken = set()
    walls = []
    while len(walls) < n // 10:
        x, y = int(rng.randint(1, map_size - 1)), int(rng.randint(1, map_size - 1))
        if (x, y) not in taken:
            taken.add((x, y))
            walls.append([x, y])
    preds = []
    while len(preds) < n // 2:
        x, y = int(rng.randint(1, map_size - 3)), int(rng.randint(1, map_size - 3))
        block = [(x + dx, y + dy) for dx in range(2) for dy in range(2)]
        if not any(c in taken for c in block):
            taken.update(block)
            preds.append([x, y, 0])
    prey = []
    while len(prey) < n - n // 2:
        x, y = int(rng.randint(1, map_size - 2)), int(rng.randint(1, map_size - 2))
        if (x, y) not in taken:
            taken.add((x, y))
            prey.append([x, y, 0])
    return cfg, [n // 2, n - n // 2], [preds, prey], walls


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 6000
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    cfg, caps, placements, walls = build(n)

    os.environ["MAGENT_GRIDLESS"] = "0"
    v_grid = VecGridWorld(cfg, caps, n_envs=1, placements=placements,
                          walls=walls)
    os.environ.pop("MAGENT_GRIDLESS")
    v_free = VecGridWorld(cfg, caps, n_envs=1, placements=placements,
                          walls=walls)
    from magent_tpu.core import engine
    seg_live = engine._use_seg(v_free.spec, v_free.spec.n_agents_cap)
    print("segmented sweeps engaged:" , seg_live,
          "(A=%d, quad max %d)" % (n, engine.ap.QUAD_MAX_AGENTS))

    s1 = v_grid.reset(jax.random.PRNGKey(0))
    s2 = jax.tree.map(lambda a: a, s1)
    step_g = jax.jit(v_grid.step)
    step_f = jax.jit(v_free.step)
    t_g = jax.jit(v_grid.transition)
    t_f = jax.jit(v_free.transition)
    key = jax.random.PRNGKey(1)
    from magent_tpu.spec import OP_COLLIDE, OP_ATTACK
    saw_c = saw_a = False
    for t in range(steps):
        key, akey = jax.random.split(key)
        acts = v_grid.random_actions(akey)
        st1 = step_g(s1, acts)
        st2 = step_f(s2, acts)
        for name in ("x", "y", "hp", "dead", "last_op", "op_obj",
                     "next_reward"):
            a = np.asarray(getattr(st1, name))
            b = np.asarray(getattr(st2, name))
            if not np.array_equal(a, b):
                bad = np.flatnonzero((a != b).reshape(-1))[:10]
                print("MISMATCH step %d field %s at %s" % (t, name, bad))
                print(" grid:", a.reshape(-1)[bad])
                print(" free:", b.reshape(-1)[bad])
                sys.exit(1)
        saw_c |= bool(np.any(np.asarray(st1.last_op) == OP_COLLIDE))
        saw_a |= bool(np.any(np.asarray(st1.last_op) == OP_ATTACK))
        s1, *_ = t_g(s1, acts)
        s2, *_ = t_f(s2, acts)
    assert saw_c and saw_a, (saw_c, saw_a)
    print("OK: %d steps bit-exact at A=%d (collide+attack events seen)"
          % (steps, n))


if __name__ == "__main__":
    main()
