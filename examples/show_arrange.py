"""Watch agents arrange themselves into a message
(parity with reference examples/show_arrange.py)."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from magent_tpu.renderer import PyGameRenderer
from magent_tpu.renderer.server import ArrangeServer

if __name__ == "__main__":
    messages = sys.argv[1:] or ["HELLO"]
    PyGameRenderer().start(ArrangeServer(messages=messages))
