"""TPU kernels (Pallas) for the hot ops, with XLA fallbacks for CPU/tests."""

from . import window_gather
from .window_gather import supports_pallas

__all__ = ["window_gather", "supports_pallas"]
