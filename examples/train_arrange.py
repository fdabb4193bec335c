"""Train agents to arrange themselves into a message: goal markers
(a can_absorb agent type) spell text from the 8x8 pixel font; agents get
reward for colliding into (being absorbed by) an unfilled marker
(parity with reference examples/train_arrange.py)."""

import argparse
import logging as log
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import magent_tpu as magent
from magent_tpu.renderer.server.arrange_server import generate_map, load_config
from magent_tpu.utility import FontProvider

FONT_FILE = os.path.join(os.path.dirname(__file__), "..", "data",
                         "font_8x8", "basic.txt")


def play_a_round(env, map_size, font, messages, handles, model,
                 print_every=50, train=True, render=False, eps=None):
    env.reset()
    generate_map(env, map_size, handles[0], handles[1], messages, font)

    step_ct = 0
    done = False
    total_reward = 0.0
    goal_handle, agent_handle = handles
    sample_buffer = magent.utility.EpisodesBuffer(capacity=5000)

    print("===== sample =====")
    print("eps %.2f  goals %d  agents %d" %
          (eps, env.get_num(goal_handle), env.get_num(agent_handle)))
    start_time = time.time()
    while not done:
        obs = env.get_observation(agent_handle)
        ids = env.get_agent_id(agent_handle)
        acts = model.infer_action(obs, ids, 'e_greedy', eps)
        env.set_action(agent_handle, acts)
        env.set_action(goal_handle,
                       np.zeros(env.get_num(goal_handle), np.int32))

        done = env.step()

        rewards = env.get_reward(agent_handle)
        if train:
            sample_buffer.record_step(ids, obs, acts, rewards,
                                      env.get_alive(agent_handle))
        total_reward += sum(rewards)

        if render:
            env.render()
        env.clear_dead()

        sl = env._group_slice(goal_handle)
        filled = int(np.sum(np.asarray(env.state.absorbed[sl])))
        if step_ct % print_every == 0:
            print("step %3d,  filled %d,  reward %.2f" %
                  (step_ct, filled, total_reward))
        step_ct += 1
        if step_ct > 350 or env.get_num(agent_handle) == 0:
            break

    print("steps: %d, time %.2f" % (step_ct, time.time() - start_time))

    total_loss = value = 0
    if train:
        total_loss, value = model.train(sample_buffer, print_every=500)

    return (magent.round(total_loss), magent.round(total_reward),
            magent.round(value), filled)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--save_every", type=int, default=5)
    parser.add_argument("--n_round", type=int, default=1000)
    parser.add_argument("--render", action="store_true")
    parser.add_argument("--load_from", type=int)
    parser.add_argument("--train", action="store_true")
    parser.add_argument("--map_size", type=int, default=100)
    parser.add_argument("--greedy", action="store_true")
    parser.add_argument("--name", type=str, default="arrange")
    parser.add_argument("--message", type=str, default="MAGENT")
    parser.add_argument("--backend", default="jax",
                        choices=["jax", "torch"])
    args = parser.parse_args()

    magent.utility.init_logger(args.name)
    env = magent.GridWorld(load_config(args.map_size))
    env.set_render_dir("build/render")
    handles = env.get_handles()
    font = FontProvider(FONT_FILE)

    from rollout import model_module
    RLModel = model_module(args.backend).DeepQNetwork
    model = RLModel(env, handles[1], args.name, batch_size=256,
                    memory_size=2 ** 19, target_update=1000, train_freq=4)

    savedir = 'save_model'
    start_from = args.load_from or 0
    if args.load_from is not None:
        model.load(savedir, start_from)

    print(args)
    start = time.time()
    for k in range(start_from, start_from + args.n_round):
        tic = time.time()
        eps = magent.utility.piecewise_decay(k, [0, 400, 800], [1, 0.2, 0.08]) \
            if not args.greedy else 0
        loss, reward, value, filled = play_a_round(
            env, args.map_size, font, [args.message], handles, model,
            train=args.train, render=args.render, eps=eps)
        log.info("round %d\t loss: %s\t reward: %s\t value: %s\t filled: %s"
                 % (k, loss, reward, value, filled))
        print("round time %.2f  total time %.2f\n" %
              (time.time() - tic, time.time() - start))
        if (k + 1) % args.save_every == 0 and args.train:
            model.save(savedir, k)


if __name__ == "__main__":
    main()
