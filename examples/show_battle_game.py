"""Play the interactive battle game against trained models
(parity with reference examples/show_battle_game.py).

Train first with examples/train_battle_game.py (which saves the
trusty-battle-game-l/r checkpoints this loads), then run this."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from magent_tpu.renderer import PyGameRenderer
from magent_tpu.renderer.server import BattleServer

if __name__ == "__main__":
    PyGameRenderer().start(BattleServer())
