"""Train the models used by the interactive battle game
(parity with reference examples/train_battle_game.py — the same battle
training loop, producing the 'trusty-battle-game-l/r' checkpoints that
show_battle_game.py / BattleServer load)."""

import os
import sys

sys.path.insert(0, os.path.dirname(__file__))

import train_battle

if __name__ == "__main__":
    # reuse the battle training entry with the interactive game's model names
    argv = sys.argv[1:]
    if "--name" not in argv:
        argv += ["--name", "trusty-battle-game"]
    sys.argv = [sys.argv[0]] + argv
    train_battle.main()
