"""Train double-attack tigers: two tigers must strike one deer in the same
step to earn reward; deer wander randomly (capability parity with reference
examples/train_tiger.py)."""

import logging
import os
import sys
import time

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import magent_tpu as magent
from magent_tpu.builtin.rule_model import RandomActor
from rollout import (EpisodeRunner, Side, build_alg, load_checkpoints,
                     save_checkpoints, standard_cli)


def generate_map(env, map_size, handles):
    env.add_walls(method="random", n=map_size * map_size * 0.04)
    env.add_agents(handles[0], method="random", n=map_size * map_size * 0.05)
    env.add_agents(handles[1], method="random", n=map_size * map_size * 0.01)


def main():
    args = standard_cli("tiger", n_round=200, map_size=500).parse_args()
    magent.utility.init_logger(args.name)

    env = magent.GridWorld("double_attack", map_size=args.map_size)
    env.set_render_dir("build/render")
    handles = env.get_handles()

    # reference hyperparameters: DQN replay 2^20 flat transitions, DRQN
    # 20000 episode windows (reference examples/train_tiger.py:136,142)
    RLModel, hyper = build_alg(
        args.alg, backend=args.backend, target_update=500,
        memory_size=20000 if args.alg == "drqn" else 2 ** 20)
    model = RLModel(env, handles[1], args.name, **hyper)
    # a2c trains in-loop on accumulated transitions instead of per round
    step_batch = (int(10 * args.map_size * args.map_size * 0.01)
                  if args.alg == "a2c" else None)

    savedir = "save_model"
    start_from = load_checkpoints([model], savedir, args.load_from)

    deer = Side(handles[0], RandomActor(env, handles[0], "deer"),
                observe=False)
    tigers = Side(handles[1], model, train=args.train, buffer_capacity=10000)
    runner = EpisodeRunner(
        env, [deer, tigers], max_steps=1000, print_every=40,
        train_print_every=500, step_batch=step_batch,
    )

    print(args)
    began = time.time()
    for k in range(start_from, start_from + args.n_round):
        tic = time.time()
        eps = 0 if args.greedy else magent.utility.piecewise_decay(
            k, [0, 100, 200], [1, 0.1, 0.05])

        env.reset()
        generate_map(env, args.map_size, handles)
        loss, _, reward, value = runner.play(
            eps, train=args.train, render=args.render)

        logging.info("round %d\t loss: %s\t reward: %s\t value: %s"
                     % (k, loss[1], reward[1], value[1]))
        print(f"round {k} took {time.time() - tic:.2f}s "
              f"(total {time.time() - began:.2f}s)\n")

        if (k + 1) % args.save_every == 0 and args.train:
            save_checkpoints([model], savedir, k)


if __name__ == "__main__":
    main()
