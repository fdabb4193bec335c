"""Heatmap of agent positions from a replay dump
(parity with reference scripts/plot_heat.py — theirs parses logged
positions; ours aggregates the replay video files, which every example
writes with --render)."""

import os
import sys

import numpy as np


def parse_video(path):
    """yield (x, y) for every agent line of a video_<k>.txt"""
    with open(path) as fin:
        lines = fin.read().split("\n")
    i = 0
    n_wall = int(lines[0].split()[1])
    i = 1 + n_wall
    while i < len(lines) and lines[i].startswith("F"):
        _, n_agents, n_events, _ = lines[i].split()
        for j in range(int(n_agents)):
            parts = lines[i + 1 + j].split()
            yield int(parts[3]), int(parts[4])
        i += 1 + int(n_agents) + int(n_events)


if __name__ == "__main__":
    render_dir = sys.argv[1] if len(sys.argv) > 1 else "build/render"
    import json

    cfg = json.load(open(os.path.join(render_dir, "config.json")))
    heat = np.zeros((cfg["height"], cfg["width"]))
    n_files = 0
    for name in sorted(os.listdir(render_dir)):
        if name.startswith("video_") and name.endswith(".txt"):
            for x, y in parse_video(os.path.join(render_dir, name)):
                if 0 <= y < heat.shape[0] and 0 <= x < heat.shape[1]:
                    heat[y, x] += 1
            n_files += 1
    print("aggregated %d replay files" % n_files)

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    plt.imshow(np.log1p(heat), cmap="hot", origin="upper")
    plt.colorbar(label="log(1 + visits)")
    out = os.path.join(render_dir, "heat.png")
    plt.savefig(out, dpi=150)
    print("saved", out)
