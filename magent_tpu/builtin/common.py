"""Circular replay buffer (reference: python/magent/builtin/common.py)."""

import numpy as np


class ReplayBuffer:
    def __init__(self, shape, dtype=np.float32):
        self.buffer = np.empty(shape=shape, dtype=dtype)
        self.head = 0
        self.capacity = len(self.buffer)

    def put(self, data):
        """put data to the buffer; returns the number of items appended"""
        n = len(data)
        if self.head + n <= self.capacity:
            self.buffer[self.head : self.head + n] = data
            self.head = (self.head + n) % self.capacity
        else:
            split = self.capacity - self.head
            self.buffer[self.head :] = data[:split]
            self.buffer[: n - split] = data[split:]
            self.head = n - split
        return n

    def get(self, index):
        """get items by index array"""
        return self.buffer[index]

    def clear(self):
        self.head = 0
