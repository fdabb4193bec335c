"""Replay rendering: frame dumps in the reference text format
(config.json + video_<k>.txt), consumed by the C++ WebSocket replay server
and the HTML/Canvas frontend."""

from .generator import RenderGenerator

__all__ = ["RenderGenerator"]
