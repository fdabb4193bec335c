"""Plot a learning curve from one log file
(parity with reference scripts/plot_log.py; format: ``\\tkey: value\\t``
lines written by the examples' log.info calls)."""

import sys

import numpy as np


def parse_pair(item):
    split_index = item.find(":")
    key = item[:split_index].strip()
    value = item[split_index + 1:].strip()
    return key, value


def parse_log_file(filename, begin_item_index=0):
    """log format: ``key: value\\t key: value\\t ...`` per line"""
    ret = {}
    with open(filename) as fin:
        for line in fin.readlines():
            items = line.split("\t")
            if len(items) < 1:
                continue
            for item in items[begin_item_index:]:
                if ":" not in item:
                    continue
                key, value = parse_pair(item)
                if not key:
                    continue
                ret.setdefault(key, []).append(value)
    return ret


_NUM = __import__("re").compile(r"-?\d+(?:\.\d+)?(?:[eE][+-]?\d+)?")


def _to_float(x):
    """Parse a float, tolerating numpy>=2 scalar reprs in old logs
    (``np.float32(-825.38)``)."""
    try:
        return float(x)
    except ValueError:
        m = _NUM.search(x)
        if m:
            return float(m.group(0))
        return np.nan


def to_numbers(values, col=-1):
    out = []
    for v in values:
        if v.startswith("["):
            items = [x for x in v.strip("[]").split(",") if x.strip()]
            out.append(_to_float(items[col]) if col >= 0 else
                       np.mean([_to_float(x) for x in items]))
        else:
            out.append(_to_float(v))
    return np.asarray(out)


if __name__ == "__main__":
    filename = sys.argv[1]
    plot_key = sys.argv[2] if len(sys.argv) > 2 else "reward"
    col = int(sys.argv[3]) if len(sys.argv) > 3 else -1

    data = to_numbers(parse_log_file(filename)[plot_key], col)
    print("%s: n=%d  mean=%.4f  last=%.4f" %
          (plot_key, len(data), np.nanmean(data), data[-1]))

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    plt.plot(data)
    plt.xlabel("round")
    plt.ylabel(plot_key)
    plt.title(filename)
    out = filename.replace(".log", "") + "-" + plot_key + ".png"
    plt.savefig(out)
    print("saved", out)
