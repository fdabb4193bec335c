"""Renderer interface (reference: python/magent/renderer/base_renderer.py)."""

from abc import ABCMeta, abstractmethod


class BaseRenderer(metaclass=ABCMeta):
    @abstractmethod
    def start(self, *args, **kwargs):
        pass
