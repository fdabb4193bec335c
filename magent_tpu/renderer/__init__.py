"""Interactive live rendering (PyGame client + game servers), capability
parity with the reference renderer package
(reference: python/magent/renderer/)."""

from .base_renderer import BaseRenderer
from .pygame_renderer import PyGameRenderer

__all__ = ["BaseRenderer", "PyGameRenderer"]
