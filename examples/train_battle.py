"""Train battle: two parameter-sharing DQN armies on the builtin battle game
(capability parity with reference examples/train_battle.py).

Both models live in-process; JAX's async dispatch overlaps their inference on
the accelerator (the reference needed one subprocess per group).  The episode
loop itself is the shared :class:`rollout.EpisodeRunner`.
"""

import logging
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import magent_tpu as magent
from rollout import (EpisodeRunner, Side, build_alg, load_checkpoints,
                     save_checkpoints, standard_cli)

# armies alternate sides of the map every round
_flip = [False]


def generate_map(env, map_size, handles):
    """Two facing squares of agents, mirrored each round."""
    n_init = int(map_size * map_size * 0.04)
    side_len = int(math.sqrt(n_init)) * 2
    gap = 3
    y0 = (map_size - side_len) // 2

    def square(x0):
        return [[x, y, 0]
                for x in range(x0, x0 + side_len, 2)
                for y in range(y0, y0 + side_len, 2)]

    left = square(map_size // 2 - gap - side_len)
    right = square(map_size // 2 + gap)
    _flip[0] = not _flip[0]
    first, second = (right, left) if _flip[0] else (left, right)
    env.add_agents(handles[0], method="custom", pos=first)
    env.add_agents(handles[1], method="custom", pos=second)


def main():
    args = standard_cli("battle", n_round=2000, map_size=125).parse_args()
    magent.utility.init_logger(args.name)

    env = magent.GridWorld("battle", map_size=args.map_size)
    env.set_render_dir("build/render")
    handles = env.get_handles()

    eval_obs = [None, None]
    if args.eval:
        print("building eval observation set")
        env.reset()
        generate_map(env, args.map_size, handles)
        eval_obs = magent.utility.sample_observation(env, handles, 2048, 500)

    RLModel, hyper = build_alg(args.alg, backend=args.backend)
    models = [
        magent.ProcessingModel(env, handles[i], f"{args.name}-{tag}",
                               20000 + i, 1000, RLModel,
                               eval_obs=eval_obs[i], **hyper)
        for i, tag in enumerate(("l", "r"))
    ]

    savedir = "save_model"
    start_from = load_checkpoints(models, savedir, args.load_from)

    print(args)
    print("view_space", env.get_view_space(handles[0]))
    print("feature_space", env.get_feature_space(handles[0]))

    runner = EpisodeRunner(
        env,
        [Side(h, m, train=args.train) for h, m in zip(handles, models)],
        max_steps=550, print_every=50, train_print_every=1000,
    )

    began = time.time()
    for k in range(start_from, start_from + args.n_round):
        tic = time.time()
        eps = 0 if args.greedy else magent.utility.piecewise_decay(
            k, [0, 700, 1400], [1, 0.2, 0.05])

        env.reset()
        generate_map(env, args.map_size, handles)
        loss, num, reward, value = runner.play(
            eps, train=args.train,
            render=args.render or (k + 1) % args.render_every == 0)

        logging.info("round %d\t loss: %s\t num: %s\t reward: %s\t value: %s"
                     % (k, loss, num, reward, value))
        print(f"round {k} took {time.time() - tic:.2f}s "
              f"(total {time.time() - began:.2f}s)\n")

        if (k + 1) % args.save_every == 0 and args.train:
            save_checkpoints(models, savedir, k)

    for m in models:
        m.quit()


if __name__ == "__main__":
    main()
