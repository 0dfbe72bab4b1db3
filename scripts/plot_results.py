"""Plot training histories: loss-vs-time, loss-vs-iteration and
gradient-norm panels (log-y) from every ``*_history.csv`` in the working
directory, plus accuracy panels when any CSV carries TrainAcc/TestAcc
columns — capability mirror of the reference's scripts/plot_results.py
(accuracy panels: reference scripts/plot_results.py:107-127).

Usage: python scripts/plot_results.py [directory] [-o out.png]
"""

from __future__ import annotations

import argparse
import glob
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("directory", nargs="?", default=".")
    parser.add_argument("-o", "--output", default="benchmark_results.png")
    args = parser.parse_args()

    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:
        print("matplotlib not available; skipping plots", file=sys.stderr)
        return 0

    files = sorted(glob.glob(os.path.join(args.directory, "*_history.csv")))
    if not files:
        print(f"no *_history.csv under {args.directory}", file=sys.stderr)
        return 1

    loaded = []
    acc_cols = set()
    for path in files:
        name = os.path.basename(path).replace("_history.csv", "")
        data = np.atleast_1d(np.genfromtxt(path, delimiter=",", names=True))
        loaded.append((name, data))
        acc_cols.update(c for c in ("TrainAcc", "TestAcc")
                        if data.dtype.names and c in data.dtype.names)

    n_panels = 3 + len(acc_cols)
    fig, axes = plt.subplots(1, n_panels, figsize=(6 * n_panels, 5))
    acc_axes = dict(zip(sorted(acc_cols), axes[3:]))
    for name, data in loaded:
        it = data["Iteration"]
        loss = data["Loss"]
        gnorm = data["GradNorm"]
        t_s = data["TimeMs"] / 1e3
        axes[0].plot(t_s, loss, label=name)
        axes[1].plot(it, loss, label=name)
        axes[2].plot(it, gnorm, label=name)
        for col, ax in acc_axes.items():
            if data.dtype.names and col in data.dtype.names:
                ax.plot(it, data[col], label=name)

    axes[0].set_xlabel("time [s]")
    axes[0].set_ylabel("loss")
    axes[1].set_xlabel("iteration")
    axes[1].set_ylabel("loss")
    axes[2].set_xlabel("iteration")
    axes[2].set_ylabel("||grad||")
    for ax in axes[:3]:
        ax.set_yscale("log")
    for col, ax in acc_axes.items():
        ax.set_xlabel("iteration")
        ax.set_ylabel(f"{col} [%]")
    for ax in axes:
        ax.grid(True, alpha=0.3)
        ax.legend(fontsize=8)
    fig.tight_layout()
    fig.savefig(args.output, dpi=120)
    print(f"wrote {args.output}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
