"""Self-play battle: ONE shared model plays both armies and learns from both
sides' experience (capability parity with reference examples/train_single.py)."""

import logging
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import magent_tpu as magent
from rollout import (EpisodeRunner, Side, load_checkpoints, save_checkpoints,
                     standard_cli)


def generate_map(env, map_size, handles):
    """Two facing squares of agents."""
    n_init = int(map_size * map_size * 0.04)
    side_len = int(math.sqrt(n_init)) * 2
    gap = 3
    y0 = (map_size - side_len) // 2

    def square(x0):
        return [[x, y, 0]
                for x in range(x0, x0 + side_len, 2)
                for y in range(y0, y0 + side_len, 2)]

    env.add_agents(handles[0], method="custom",
                   pos=square(map_size // 2 - gap - side_len))
    env.add_agents(handles[1], method="custom",
                   pos=square(map_size // 2 + gap))


def main():
    args = standard_cli("battle", n_round=2000, map_size=125,
                        algs=("dqn", "drqn")).parse_args()
    magent.utility.init_logger(args.name)

    env = magent.GridWorld("battle", map_size=args.map_size)
    env.set_render_dir("build/render")
    handles = env.get_handles()

    eval_obs = None
    if args.eval:
        print("building eval observation set")
        env.reset()
        generate_map(env, args.map_size, handles)
        eval_obs = magent.utility.sample_observation(env, handles, 2048, 500)[0]

    from rollout import model_module
    mod = model_module(args.backend)
    if args.alg == "dqn":
        model = mod.DeepQNetwork(env, handles[0], "selfplay", batch_size=512,
                                 learning_rate=3e-4, memory_size=2 ** 21,
                                 target_update=1200, train_freq=5,
                                 eval_obs=eval_obs)
    else:
        if not hasattr(mod, "DeepRecurrentQNetwork"):
            raise ValueError(
                f"drqn is not available on the {args.backend} backend")
        model = mod.DeepRecurrentQNetwork(env, handles[0], "selfplay",
                                          learning_rate=3e-4, batch_size=32,
                                          unroll_step=16,
                                          memory_size=2 * 8 * 625,
                                          target_update=1200, train_freq=5,
                                          eval_obs=eval_obs)

    savedir = "save_model"
    start_from = load_checkpoints([model], savedir, args.load_from)

    # both armies share the model AND the sample buffer: the runner trains
    # the (model, buffer) pair exactly once per round
    left = Side(handles[0], model, train=args.train, buffer_capacity=1000)
    right = Side(handles[1], model, train=args.train)
    right.buffer = left.buffer
    runner = EpisodeRunner(env, [left, right], max_steps=550, print_every=50)

    print(args)
    print("view_space", env.get_view_space(handles[0]))
    print("feature_space", env.get_feature_space(handles[0]))

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
                     % (k, loss[0], num, reward, value[0]))
        print(f"round {k} took {time.time() - tic:.2f}s "
              f"(total {time.time() - began:.2f}s)\n")

        if (k + 1) % args.save_every == 0 and args.train:
            save_checkpoints([model], savedir, k)


if __name__ == "__main__":
    main()
