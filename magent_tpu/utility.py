"""Utilities: episode replay buffer, exploration schedulers, eval-set
sampling, logging (reference: python/magent/utility.py)."""

from __future__ import annotations

import collections
import logging
import math
import os

import numpy as np


class EpisodesBufferEntry:
    """Per-agent episode record (reference: utility.py:15-30)."""

    def __init__(self):
        self.views = []
        self.features = []
        self.actions = []
        self.rewards = []
        self.terminal = False

    def append(self, view, feature, action, reward, alive):
        self.views.append(view.copy())
        self.features.append(feature.copy())
        self.actions.append(action)
        self.rewards.append(reward)
        if not alive:
            self.terminal = True


class EpisodesBuffer:
    """Episode store keyed by agent id, one entry per agent
    (reference: utility.py:33-75)."""

    def __init__(self, capacity):
        self.buffer = {}
        self.capacity = capacity
        self.is_full = False

    def record_step(self, ids, obs, acts, rewards, alives):
        buffer = self.buffer
        index = np.random.permutation(len(ids))

        if self.is_full:
            for i in range(len(ids)):
                entry = buffer.get(ids[i])
                if entry is None:
                    continue
                entry.append(obs[0][i], obs[1][i], acts[i], rewards[i], alives[i])
        else:
            for i in range(len(ids)):
                i = index[i]
                entry = buffer.get(ids[i])
                if entry is None:
                    if self.is_full:
                        continue
                    entry = EpisodesBufferEntry()
                    buffer[ids[i]] = entry
                    if len(buffer) >= self.capacity:
                        self.is_full = True
                entry.append(obs[0][i], obs[1][i], acts[i], rewards[i], alives[i])

    def reset(self):
        self.buffer = {}
        self.is_full = False

    def episodes(self):
        return self.buffer.values()


# ---------------------------------------------------------------- schedulers
def exponential_decay(now_step, total_step, final_value, rate):
    """exponential decay scheduler (reference: utility.py:79-82)"""
    decay = math.exp(math.log(final_value) / total_step ** rate)
    return max(final_value, 1 * decay ** (now_step ** rate))


def linear_decay(now_step, total_step, final_value):
    """linear decay scheduler (reference: utility.py:85-88)"""
    decay = (1 - final_value) / total_step
    return max(final_value, 1 - decay * now_step)


def piecewise_decay(now_step, anchor, anchor_value):
    """piecewise linear decay scheduler (reference: utility.py:91-111)"""
    i = 0
    while i < len(anchor) and now_step >= anchor[i]:
        i += 1
    if i == len(anchor):
        return anchor_value[-1]
    return anchor_value[i - 1] + (now_step - anchor[i - 1]) * (
        (anchor_value[i] - anchor_value[i - 1]) / (anchor[i] - anchor[i - 1])
    )


# ---------------------------------------------------------- eval observations
def sample_observation(env, handles, n_obs=-1, step=-1):
    """Sample observations with random actors for evaluation
    (reference: utility.py:115-178)."""
    from .builtin.rule_model import RandomActor

    models = [RandomActor(env, handle) for handle in handles]

    n = len(handles)
    views = [[] for _ in range(n)]
    features = [[] for _ in range(n)]

    done = False
    step_ct = 0
    while not done:
        obs = [env.get_observation(handle) for handle in handles]
        ids = [env.get_agent_id(handle) for handle in handles]

        for i in range(n):
            act = models[i].infer_action(obs[i], ids[i])
            env.set_action(handles[i], act)

        done = env.step()
        env.clear_dead()

        for i in range(n):
            views[i].append(obs[i][0])
            features[i].append(obs[i][1])

        if step != -1 and step_ct > step:
            break
        step_ct += 1

    for i in range(n):
        views[i] = np.concatenate(views[i]).reshape((-1,) + env.get_view_space(handles[i]))
        features[i] = np.concatenate(features[i]).reshape(
            (-1,) + env.get_feature_space(handles[i])
        )

    if n_obs != -1:
        for i in range(n):
            idx = np.random.choice(np.arange(views[i].shape[0]), n_obs)
            views[i] = views[i][idx]
            features[i] = features[i][idx]

    return [(v, f) for v, f in zip(views, features)]


# -------------------------------------------------------------------- logging
def init_logger(filename):
    """tee INFO logs to <filename>.log and console (reference: utility.py:181-192)"""
    logging.basicConfig(level=logging.INFO, filename=filename + ".log")
    console = logging.StreamHandler()
    console.setLevel(logging.INFO)
    logging.getLogger('').addHandler(console)


def rec_round(x, ndigits=2):
    """round recursively (reference: utility.py:195-206)"""
    if isinstance(x, collections.abc.Iterable):
        return [rec_round(item, ndigits) for item in x]
    return round(x, ndigits)


def has_gpu():
    """whether an accelerator (TPU here) is available"""
    import jax

    return any(d.platform != "cpu" for d in jax.devices())


# ------------------------------------------------------- pretrained models
def download_file(filename, url):
    """Download a file (reference: utility.py:216-236).  Kept for API
    parity; raises a clear error in network-less environments."""
    import urllib.request

    print("Download %s from %s..." % (filename, url))
    try:
        urllib.request.urlretrieve(url, filename)
    except Exception as e:  # no egress, bad URL, ...
        raise RuntimeError(
            "cannot download %s (%s); train the models locally with the "
            "examples instead" % (url, e)
        )


def download_model(url):
    """Download and extract a pretrained model archive
    (reference: utility.py:239-256)."""
    import os
    import tarfile

    name = url.split("/")[-1]
    download_file(name, url)
    with tarfile.open(name) as tar:
        tar.extractall("data/")
    os.remove(name)


class FontProvider:
    """8x8 pixel font for the arrange demo (reference: utility.py:271-305)."""

    def __init__(self, filename):
        data = []
        with open(filename) as fin:
            for line in fin.readlines():
                char = []
                for x in line.split(','):
                    char.append(int(x, 0))
                data.append(char)

        height, width = 8, 8
        expand_data = []
        for char in data:
            expand_char = [[0 for _ in range(width)] for _ in range(height)]
            for i in range(width):
                for j in range(height):
                    if char[i] & (1 << j):
                        expand_char[i][j] = 1
            expand_data.append(expand_char)

        self.data = expand_data
        self.width = width
        self.height = height

    def get(self, i):
        if isinstance(i, int):
            return self.data[i]
        return self.data[ord(i)]
