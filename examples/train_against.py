"""Train one side against a frozen opponent checkpoint
(parity with reference examples/train_against.py)."""

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
    width = height = map_size
    init_num = map_size * map_size * 0.04
    gap = 3
    leftID, rightID = 0, 1

    side = int(math.sqrt(init_num)) * 2
    pos = []
    for x in range(width // 2 - gap - side, width // 2 - gap - side + side, 2):
        for y in range((height - side) // 2, (height - side) // 2 + side, 2):
            pos.append([x, y, 0])
    env.add_agents(handles[leftID], method="custom", pos=pos)

    pos = []
    for x in range(width // 2 + gap, width // 2 + gap + side, 2):
        for y in range((height - side) // 2, (height - side) // 2 + side, 2):
            pos.append([x, y, 0])
    env.add_agents(handles[rightID], method="custom", pos=pos)


def play_a_round(env, map_size, handles, models, print_every, eps,
                 step_batch_size=None, train=True, train_id=1, render=False):
    env.reset()
    generate_map(env, map_size, handles)

    step_ct = 0
    done = False

    n = len(handles)
    obs = [None for _ in range(n)]
    ids = [None for _ in range(n)]
    acts = [None for _ in range(n)]
    nums = [env.get_num(handle) for handle in handles]
    sample_buffer = magent.utility.EpisodesBuffer(capacity=5000)
    total_reward = [0 for _ in range(n)]
    n_transition = 0
    total_loss = value = 0

    print("===== sample =====")
    print("eps %.2f number %s" % (eps, nums))
    start_time = time.time()
    while not done:
        for i in range(n):
            obs[i] = env.get_observation(handles[i])
            ids[i] = env.get_agent_id(handles[i])
            acts[i] = models[i].infer_action(obs[i], ids[i], 'e_greedy', eps)
            env.set_action(handles[i], acts[i])

        done = env.step()

        step_reward = []
        for i in range(n):
            rewards = env.get_reward(handles[i])
            if train and i == train_id:
                alives = env.get_alive(handles[train_id])
                sample_buffer.record_step(ids[i], obs[i], acts[i], rewards, alives)
            s = sum(rewards)
            step_reward.append(s)
            total_reward[i] += s

        if render:
            env.render()

        env.clear_dead()

        nums = [env.get_num(handle) for handle in handles]
        n_transition += nums[train_id]

        if step_ct % print_every == 0:
            print("step %3d,  nums: %s reward: %s,  total_reward: %s " %
                  (step_ct, nums, np.around(step_reward, 2),
                   np.around(total_reward, 2)))
        step_ct += 1
        if step_ct > 550:
            break

        if step_batch_size and n_transition > step_batch_size and train:
            total_loss, value = models[train_id].train(sample_buffer, 500)
            sample_buffer = magent.utility.EpisodesBuffer(capacity=5000)
            n_transition = 0

    sample_time = time.time() - start_time
    print("steps: %d,  total time: %.2f,  step average %.2f" %
          (step_ct, sample_time, sample_time / step_ct))

    if train:
        print("===== train =====")
        start_time = time.time()
        total_loss, value = models[train_id].train(sample_buffer, print_every=1000)
        print("train_time %.2f" % (time.time() - start_time))

    def round_list(l):
        return [round(float(x), 2) for x in l]  # plain floats in logs

    return total_loss, nums, round_list(total_reward), value


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--save_every", type=int, default=2)
    parser.add_argument("--render_every", type=int, default=10)
    parser.add_argument("--n_round", type=int, default=2000)
    parser.add_argument("--render", action="store_true")
    parser.add_argument("--load_from", type=int)
    parser.add_argument("--train", action="store_true")
    parser.add_argument("--map_size", type=int, default=125)
    parser.add_argument("--greedy", action="store_true")
    parser.add_argument("--name", type=str, default="against")
    parser.add_argument("--opponent", type=int, default=0,
                        help="epoch of the frozen opponent checkpoint")
    parser.add_argument("--opponent_name", type=str, default="battle-l",
                        help="name of the frozen opponent model")
    parser.add_argument("--eval", action="store_true")
    parser.add_argument("--alg", default="dqn", choices=["dqn", "drqn", "a2c"])
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
        eval_obs = magent.utility.sample_observation(env, handles, 2048, 500)[1]

    batch_size = 512
    unroll_step = 16
    target_update = 1200
    train_freq = 5
    step_batch_size = None

    if args.alg == "dqn":
        from magent_tpu.builtin.jax_model import DeepQNetwork as RLModel
        base_args = {'batch_size': batch_size, 'learning_rate': 3e-4,
                     'memory_size': 2 ** 21, 'target_update': target_update,
                     'train_freq': train_freq}
    elif args.alg == "drqn":
        from magent_tpu.builtin.jax_model import DeepRecurrentQNetwork as RLModel
        base_args = {'batch_size': batch_size // unroll_step,
                     'unroll_step': unroll_step, 'learning_rate': 3e-4,
                     'memory_size': 2 * 8 * 625, 'target_update': target_update,
                     'train_freq': train_freq}
    else:
        from magent_tpu.builtin.jax_model import AdvantageActorCritic as RLModel
        base_args = {'batch_size': batch_size, 'learning_rate': 1e-3}
        step_batch_size = int(10 * args.map_size * args.map_size * 0.04)

    # frozen opponent on the left, learner on the right
    from magent_tpu.builtin.jax_model import DeepQNetwork
    opponent = DeepQNetwork(env, handles[0], args.opponent_name,
                            memory_size=2 ** 10)
    model = RLModel(env, handles[1], args.name, eval_obs=eval_obs, **base_args)
    models = [opponent, model]

    savedir = 'save_model'
    if args.opponent is not None:
        try:
            opponent.load(savedir, args.opponent)
            print("loaded opponent %s epoch %d" %
                  (args.opponent_name, args.opponent))
        except FileNotFoundError:
            print("no opponent checkpoint found; opponent plays untrained")

    if args.load_from is not None:
        start_from = args.load_from
        print("load ... %d" % start_from)
        model.load(savedir, start_from)
    else:
        start_from = 0

    print(args)
    start = time.time()
    for k in range(start_from, start_from + args.n_round):
        tic = time.time()
        eps = magent.utility.piecewise_decay(k, [0, 400, 1000], [1, 0.2, 0.05]) \
            if not args.greedy else 0
        loss, num, reward, value = play_a_round(
            env, args.map_size, handles, models, eps=eps,
            step_batch_size=step_batch_size, train=args.train,
            print_every=50,
            render=args.render or (k + 1) % args.render_every == 0)
        log.info("round %d\t loss: %s\t num: %s\t reward: %s\t value: %s"
                 % (k, loss, num, reward, value))
        print("round time %.2f  total time %.2f\n" %
              (time.time() - tic, time.time() - start))

        if (k + 1) % args.save_every == 0 and args.train:
            print("save model... ")
            model.save(savedir, k)


if __name__ == "__main__":
    main()
