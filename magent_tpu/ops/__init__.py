"""TPU kernels (Pallas) for the hot ops, with XLA fallbacks for CPU/tests."""

from .window_gather import window_gather, supports_pallas

__all__ = ["window_gather", "supports_pallas"]
