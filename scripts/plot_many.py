"""Plot curves from many log files listed in a record file
(parity with reference scripts/plot_many.py).

The record file has lines ``log_file: <path>\\t legend: <label>``; each log
file is parsed with the same ``\\tkey: value\\t`` format as plot_log.py."""

import sys

import numpy as np

from plot_log import parse_log_file, to_numbers

if __name__ == "__main__":
    rec_filename = sys.argv[1]
    plot_key = sys.argv[2]
    silent = "--silent" in sys.argv
    args = [a for a in sys.argv[3:] if a != "--silent"]
    col = int(args[0]) if args else -1

    rec_dict = parse_log_file(rec_filename)

    legend = []
    data = []
    for i, log_file_name in enumerate(rec_dict["log_file"]):
        log_dict = parse_log_file(log_file_name)
        data.append(to_numbers(log_dict[plot_key], col))
        if "legend" in rec_dict:
            legend.append(rec_dict["legend"][i])
        else:
            legend.append(log_file_name)

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    for curve in data:
        plt.plot(curve)
    plt.xlabel("round")
    plt.ylabel(plot_key)
    plt.legend(legend)
    out = rec_filename + "-" + plot_key + ".png"
    plt.savefig(out)
    print("saved", out)
    if not silent:
        for name, curve in zip(legend, data):
            print("%-30s mean=%.4f last=%.4f" %
                  (name, np.nanmean(curve), curve[-1]))
