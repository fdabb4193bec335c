"""Head-to-head evaluation: a checkpointed DQN vs an untrained/random
opponent on the battle map. Reports survivors and kill counts per game —
quick evidence that training produced behavior beyond random."""

import argparse
import math
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import magent_tpu as magent
from magent_tpu.builtin.jax_model import DeepQNetwork
from magent_tpu.builtin.jax_model.base import latest_epoch
from magent_tpu.builtin.rule_model import RandomActor


def generate_map(env, map_size, handles):
    init_num = map_size * map_size * 0.04
    gap = 3
    side = int(math.sqrt(init_num)) * 2
    for idx, x0 in ((0, map_size // 2 - gap - side), (1, map_size // 2 + gap)):
        pos = []
        for x in range(x0, x0 + side, 2):
            for y in range((map_size - side) // 2, (map_size - side) // 2 + side, 2):
                pos.append([x, y, 0])
        env.add_agents(handles[idx], method="custom", pos=pos)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--name", default="battle-fused-l")
    parser.add_argument("--savedir", default="save_model")
    parser.add_argument("--epoch", type=int, default=None)
    parser.add_argument("--map_size", type=int, default=64)
    parser.add_argument("--n_games", type=int, default=4)
    parser.add_argument("--max_steps", type=int, default=400)
    parser.add_argument("--opponent", choices=["random", "untrained"],
                        default="untrained")
    args = parser.parse_args()

    env = magent.GridWorld("battle", map_size=args.map_size)
    h0, h1 = env.get_handles()

    trained = DeepQNetwork(env, h0, "trained", memory_size=2 ** 10)
    ep = args.epoch if args.epoch is not None else latest_epoch(
        args.savedir, args.name)
    assert ep is not None, "no checkpoint found for %s" % args.name
    trained.load(args.savedir, ep, args.name)
    print("loaded %s epoch %d" % (args.name, ep))

    if args.opponent == "random":
        opponent = RandomActor(env, h1)
    else:
        opponent = DeepQNetwork(env, h1, "untrained", memory_size=2 ** 10)

    wins = 0
    for game in range(args.n_games):
        env.reset()
        generate_map(env, args.map_size, (h0, h1))
        n0_start, n1_start = env.get_num(h0), env.get_num(h1)
        done, step = False, 0
        while not done and step < args.max_steps:
            for h, model in ((h0, trained), (h1, opponent)):
                obs = env.get_observation(h)
                ids = env.get_agent_id(h)
                acts = model.infer_action(obs, ids, "e_greedy", eps=0.05)
                env.set_action(h, acts)
            done = env.step()
            env.clear_dead()
            step += 1
        n0, n1 = env.get_num(h0), env.get_num(h1)
        result = "WIN" if n0 > n1 else ("LOSS" if n1 > n0 else "DRAW")
        wins += n0 > n1
        print("game %d: trained %d/%d vs opponent %d/%d after %d steps -> %s"
              % (game, n0, n0_start, n1, n1_start, step, result))
    print("trained side won %d / %d games" % (wins, args.n_games))


if __name__ == "__main__":
    main()
