"""Live-updating multi-line plot helper (parity with reference
scripts/plot.py:5-40 DynamicPlot): n lines over a shared x axis, points
appended incrementally, redrawn in place during a training run.

Falls back to a non-interactive Agg backend automatically on headless
boxes — ``redraw`` then only updates the figure state and ``save`` still
writes the PNG, so training scripts can use one code path everywhere.
"""

import matplotlib

try:  # headless: no $DISPLAY -> Agg (draw/pause become no-ops)
    import tkinter  # noqa: F401  (the default interactive backend)
except ImportError:
    matplotlib.use("Agg")
import matplotlib.pyplot as plt


class DynamicPlot:
    """``n`` lines appended point-by-point and redrawn live."""

    def __init__(self, n, labels=None):
        self.xs = []
        self.ys = [[] for _ in range(n)]
        self.interactive = matplotlib.get_backend().lower() != "agg"
        if self.interactive:
            plt.show(block=False)
        self.axes = plt.gca()
        self.lines = [
            self.axes.plot([], [], label=labels[i] if labels else None)[0]
            for i in range(n)
        ]
        if labels:
            self.axes.legend()

    def add_point(self, x, ys):
        self.xs.append(x)
        for series, y in zip(self.ys, ys):
            series.append(y)

    def redraw(self):
        for line, series in zip(self.lines, self.ys):
            line.set_data(self.xs, series)
        self.axes.relim()
        self.axes.autoscale(True)
        # headroom: round the x limit up to the next 100, pad y by 20%
        # (same viewport policy as the reference helper)
        _, x_right = self.axes.get_xlim()
        _, y_top = self.axes.get_ylim()
        self.axes.set_xlim(left=None, right=(int(x_right) // 100 + 1) * 100)
        self.axes.set_ylim(0, y_top * 1.2)
        if self.interactive:
            plt.draw()
            plt.pause(1e-15)

    def save(self, filename):
        plt.savefig(filename)


if __name__ == "__main__":  # tiny self-demo: two decaying series
    import math

    p = DynamicPlot(2, labels=["reward", "loss"])
    for k in range(120):
        p.add_point(k, [50 + 40 * math.tanh(k / 40.0),
                        30 * math.exp(-k / 25.0)])
        if k % 10 == 0:
            p.redraw()
    p.save("/tmp/dynamic_plot_demo.png")
    print("wrote /tmp/dynamic_plot_demo.png")
