"""Train agents to fight across wall barriers with openings — a transfer /
curriculum variant of battle (parity with reference examples/train_trans.py)."""

import argparse
import logging as log
import math
import os
import random
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import magent_tpu as magent


def get_config(map_size):
    gw = magent.gridworld
    cfg = gw.Config()
    cfg.set({"map_width": map_size, "map_height": map_size})
    cfg.set({"minimap_mode": True})
    cfg.set({"embedding_size": 10})
    small = cfg.register_agent_type(
        "small",
        {'width': 1, 'length': 1, 'hp': 10, 'speed': 2,
         'view_range': gw.CircleRange(6), 'attack_range': gw.CircleRange(1.5),
         'damage': 2, 'step_recover': 0.1,
         'step_reward': -0.005, 'kill_reward': 5, 'dead_penalty': -0.1,
         'attack_penalty': -0.1})
    g0 = cfg.add_group(small)
    g1 = cfg.add_group(small)
    a = gw.AgentSymbol(g0, index='any')
    b = gw.AgentSymbol(g1, index='any')
    cfg.add_reward_rule(gw.Event(a, 'attack', b), receiver=a, value=0.2)
    cfg.add_reward_rule(gw.Event(b, 'attack', a), receiver=b, value=0.2)
    return cfg


def generate_map(env, map_size, handles, n_doors=8, seed=0):
    """two armies separated by a vertical wall with random doors"""
    rng = random.Random(seed)
    width = height = map_size
    mid = width // 2

    doors = set()
    while len(doors) < n_doors:
        y = rng.randrange(2, height - 4)
        doors.update(range(y, y + 2))
    walls = [[mid, y] for y in range(1, height - 1) if y not in doors]
    env.add_walls(method="custom", pos=walls)

    init_num = map_size * map_size * 0.03
    side = int(math.sqrt(init_num)) * 2
    pos = []
    for x in range(mid - 4 - side, mid - 4, 2):
        for y in range((height - side) // 2, (height - side) // 2 + side, 2):
            pos.append([x, y, 0])
    env.add_agents(handles[0], method="custom", pos=pos)
    pos = []
    for x in range(mid + 4, mid + 4 + side, 2):
        for y in range((height - side) // 2, (height - side) // 2 + side, 2):
            pos.append([x, y, 0])
    env.add_agents(handles[1], method="custom", pos=pos)


def play_a_round(env, map_size, handles, models, print_every, train=True,
                 render=False, eps=None):
    env.reset()
    generate_map(env, map_size, handles)

    step_ct = 0
    done = False
    n = len(handles)
    obs = [None] * n
    ids = [None] * n
    acts = [None] * n
    total_reward = [0.0] * n
    nums = [env.get_num(h) for h in handles]

    print("===== sample =====")
    print("eps %.2f number %s" % (eps, nums))
    start_time = time.time()
    while not done:
        for i in range(n):
            obs[i] = env.get_observation(handles[i])
            ids[i] = env.get_agent_id(handles[i])
            models[i].infer_action(obs[i], ids[i], 'e_greedy', eps, block=False)
        for i in range(n):
            acts[i] = models[i].fetch_action()
            env.set_action(handles[i], acts[i])

        done = env.step()

        for i in range(n):
            rewards = env.get_reward(handles[i])
            if train:
                models[i].sample_step(rewards, env.get_alive(handles[i]),
                                      block=False)
            total_reward[i] += sum(rewards)

        if render:
            env.render()
        env.clear_dead()
        nums = [env.get_num(h) for h in handles]

        if step_ct % print_every == 0:
            print("step %3d,  nums: %s  total_reward: %s" %
                  (step_ct, nums, np.around(total_reward, 2)))
        step_ct += 1
        if step_ct > 500:
            break

    print("steps: %d,  time: %.2f" % (step_ct, time.time() - start_time))

    total_loss, value = [0] * n, [0] * n
    if train:
        for i in range(n):
            models[i].train(print_every=1000, block=False)
        for i in range(n):
            total_loss[i], value[i] = models[i].fetch_train()

    return (magent.round(total_loss), nums, magent.round(total_reward),
            magent.round(value))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--save_every", type=int, default=5)
    parser.add_argument("--render_every", type=int, default=10)
    parser.add_argument("--n_round", type=int, default=2000)
    parser.add_argument("--render", action="store_true")
    parser.add_argument("--load_from", type=int)
    parser.add_argument("--train", action="store_true")
    parser.add_argument("--map_size", type=int, default=60)
    parser.add_argument("--greedy", action="store_true")
    parser.add_argument("--name", type=str, default="trans")
    parser.add_argument("--eval", action="store_true")
    parser.add_argument("--alg", default="dqn", choices=["dqn", "drqn", "a2c"])
    args = parser.parse_args()

    magent.utility.init_logger(args.name)
    env = magent.GridWorld(get_config(args.map_size))
    env.set_render_dir("build/render")
    handles = env.get_handles()

    if args.alg == "dqn":
        from magent_tpu.builtin.jax_model import DeepQNetwork as RLModel
        base_args = {'batch_size': 256, 'memory_size': 2 ** 20,
                     'learning_rate': 1e-4, 'target_update': 1200,
                     'train_freq': 5}
    elif args.alg == "drqn":
        from magent_tpu.builtin.jax_model import DeepRecurrentQNetwork as RLModel
        base_args = {'batch_size': 32, 'unroll_step': 8,
                     'memory_size': 8 * 625, 'learning_rate': 1e-4,
                     'target_update': 1200, 'train_freq': 5}
    else:
        from magent_tpu.builtin.jax_model import AdvantageActorCritic as RLModel
        base_args = {'batch_size': 256, 'learning_rate': 1e-3}

    names = [args.name + "-l", args.name + "-r"]
    models = [magent.ProcessingModel(env, handles[i], names[i], 20000 + i,
                                     1000, RLModel, **base_args)
              for i in range(2)]

    savedir = 'save_model'
    start_from = args.load_from or 0
    if args.load_from is not None:
        for model in models:
            model.load(savedir, start_from)

    print(args)
    start = time.time()
    for k in range(start_from, start_from + args.n_round):
        tic = time.time()
        eps = magent.utility.piecewise_decay(k, [0, 700, 1400], [1, 0.2, 0.05]) \
            if not args.greedy else 0
        loss, num, reward, value = play_a_round(
            env, args.map_size, handles, models, train=args.train,
            print_every=50,
            render=args.render or (k + 1) % args.render_every == 0, eps=eps)
        log.info("round %d\t loss: %s\t num: %s\t reward: %s\t value: %s"
                 % (k, loss, num, reward, value))
        print("round time %.2f  total time %.2f\n" %
              (time.time() - tic, time.time() - start))
        if (k + 1) % args.save_every == 0 and args.train:
            for model in models:
                model.save(savedir, k)

    for model in models:
        model.quit()


if __name__ == "__main__":
    main()
