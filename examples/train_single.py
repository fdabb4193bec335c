"""Self-play battle with one shared model on both sides
(parity with reference examples/train_single.py)."""

import argparse
import logging as log
import math
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import magent_tpu as magent


def generate_map(env, map_size, handles):
    """two squares of agents"""
    width = height = map_size
    init_num = map_size * map_size * 0.04
    gap = 3

    side = int(math.sqrt(init_num)) * 2
    pos = []
    for x in range(width // 2 - gap - side, width // 2 - gap - side + side, 2):
        for y in range((height - side) // 2, (height - side) // 2 + side, 2):
            pos.append([x, y, 0])
    env.add_agents(handles[0], method="custom", pos=pos)

    pos = []
    for x in range(width // 2 + gap, width // 2 + gap + side, 2):
        for y in range((height - side) // 2, (height - side) // 2 + side, 2):
            pos.append([x, y, 0])
    env.add_agents(handles[1], method="custom", pos=pos)


def play_a_round(env, map_size, handles, model, print_every, train=True,
                 render=False, eps=None):
    env.reset()
    generate_map(env, map_size, handles)

    step_ct = 0
    done = False

    n = len(handles)
    obs = [None for _ in range(n)]
    ids = [None for _ in range(n)]
    acts = [None for _ in range(n)]
    nums = [env.get_num(handle) for handle in handles]
    sample_buffer = magent.utility.EpisodesBuffer(capacity=1000)
    total_reward = [0 for _ in range(n)]

    print("===== sample =====")
    print("eps %.2f number %s" % (eps, nums))
    start_time = time.time()
    while not done:
        for i in range(n):
            obs[i] = env.get_observation(handles[i])
            ids[i] = env.get_agent_id(handles[i])
            acts[i] = model.infer_action(obs[i], ids[i], 'e_greedy', eps)
            env.set_action(handles[i], acts[i])

        done = env.step()

        step_reward = []
        for i in range(n):
            rewards = env.get_reward(handles[i])
            if train:
                alives = env.get_alive(handles[i])
                sample_buffer.record_step(ids[i], obs[i], acts[i], rewards, alives)
            s = sum(rewards)
            step_reward.append(s)
            total_reward[i] += s

        if render:
            env.render()

        env.clear_dead()

        nums = [env.get_num(handle) for handle in handles]

        if step_ct % print_every == 0:
            print("step %3d,  nums: %s reward: %s,  total_reward: %s " %
                  (step_ct, nums, np.around(step_reward, 2),
                   np.around(total_reward, 2)))
        step_ct += 1
        if step_ct > 550:
            break

    sample_time = time.time() - start_time
    print("steps: %d,  total time: %.2f,  step average %.2f" %
          (step_ct, sample_time, sample_time / step_ct))

    total_loss = value = 0
    if train:
        print("===== train =====")
        start_time = time.time()
        total_loss, value = model.train(sample_buffer, print_every=1000)
        print("train_time %.2f" % (time.time() - start_time))

    def round_list(l):
        return [round(x, 2) for x in l]

    return total_loss, nums, round_list(total_reward), value


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--save_every", type=int, default=5)
    parser.add_argument("--render_every", type=int, default=10)
    parser.add_argument("--n_round", type=int, default=2000)
    parser.add_argument("--render", action="store_true")
    parser.add_argument("--load_from", type=int)
    parser.add_argument("--train", action="store_true")
    parser.add_argument("--map_size", type=int, default=125)
    parser.add_argument("--greedy", action="store_true")
    parser.add_argument("--name", type=str, default="battle")
    parser.add_argument("--eval", action="store_true")
    parser.add_argument("--alg", default="dqn", choices=["dqn", "drqn"])
    args = parser.parse_args()

    magent.utility.init_logger(args.name)

    env = magent.GridWorld("battle", map_size=args.map_size)
    env.set_render_dir("build/render")
    handles = env.get_handles()

    eval_obs = None
    if args.eval:
        print("sample eval set...")
        env.reset()
        generate_map(env, args.map_size, handles)
        eval_obs = magent.utility.sample_observation(env, handles, 2048, 500)[0]

    batch_size = 512
    unroll_step = 16
    target_update = 1200
    train_freq = 5

    if args.alg == "dqn":
        from magent_tpu.builtin.jax_model import DeepQNetwork
        model = DeepQNetwork(env, handles[0], "selfplay",
                             batch_size=batch_size,
                             learning_rate=3e-4,
                             memory_size=2 ** 21, target_update=target_update,
                             train_freq=train_freq, eval_obs=eval_obs)
    else:
        from magent_tpu.builtin.jax_model import DeepRecurrentQNetwork
        model = DeepRecurrentQNetwork(env, handles[0], "selfplay",
                                      learning_rate=3e-4,
                                      batch_size=batch_size // unroll_step,
                                      unroll_step=unroll_step,
                                      memory_size=2 * 8 * 625,
                                      target_update=target_update,
                                      train_freq=train_freq, eval_obs=eval_obs)

    savedir = 'save_model'
    if args.load_from is not None:
        start_from = args.load_from
        print("load ... %d" % start_from)
        model.load(savedir, start_from)
    else:
        start_from = 0

    print(args)
    print("view_space", env.get_view_space(handles[0]))
    print("feature_space", env.get_feature_space(handles[0]))

    start = time.time()
    for k in range(start_from, start_from + args.n_round):
        tic = time.time()
        eps = magent.utility.piecewise_decay(k, [0, 700, 1400], [1, 0.2, 0.05]) \
            if not args.greedy else 0
        loss, num, reward, value = play_a_round(
            env, args.map_size, handles, model,
            train=args.train, print_every=50,
            render=args.render or (k + 1) % args.render_every == 0,
            eps=eps)
        log.info("round %d\t loss: %s\t num: %s\t reward: %s\t value: %s"
                 % (k, loss, num, reward, value))
        print("round time %.2f  total time %.2f\n" %
              (time.time() - tic, time.time() - start))

        if (k + 1) % args.save_every == 0 and args.train:
            print("save model... ")
            model.save(savedir, k)


if __name__ == "__main__":
    main()
