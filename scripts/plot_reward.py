"""Plot per-round reward curves from an example log
(parity with reference scripts/plot_reward.py)."""

import sys

import numpy as np

from plot_log import parse_log_file, to_numbers

if __name__ == "__main__":
    filename = sys.argv[1]
    col = int(sys.argv[2]) if len(sys.argv) > 2 else -1

    log = parse_log_file(filename)
    reward = to_numbers(log["reward"], col)

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    plt.plot(reward, label="reward")
    if "value" in log:
        plt.plot(to_numbers(log["value"], col), label="value")
    plt.xlabel("round")
    plt.legend()
    out = filename.replace(".log", "") + "-reward.png"
    plt.savefig(out)
    print("saved", out, "mean=%.4f last=%.4f" %
          (np.nanmean(reward), reward[-1]))
