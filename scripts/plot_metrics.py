#!/usr/bin/env python
"""Plot training curves from a run's metrics.jsonl.

The TensorBoard-viewer equivalent for this framework's JSONL scalar logs
(utils/logger.py MetricsWriter replaces the reference's rank-0
SummaryWriter, train_dist.py:390-393,411-420): loss/lr curves become a PNG
next to the log, viewable without any custom parsing.

Usage:
  python scripts/plot_metrics.py --log_dir .data/log5/synthetic_quality_diverse
  python scripts/plot_metrics.py --log_dir ... --out curves.png
"""
from __future__ import annotations

import argparse
import collections
import json
import os

# fixed categorical order (blue, amber): a colorblind-safe hue opposition,
# also separated in lightness; never cycled or auto-generated
SERIES_COLORS = ["#4269d0", "#efb118", "#3ca951", "#ff725c", "#a463f2"]
GRID = "#e3e3e3"
INK = "#3d3d3d"


def load_metrics(path: str):
    # last-wins per (tag, step): an --auto_resume relaunch re-runs the
    # epoch that was in flight when the previous process was killed, so
    # the JSONL can contain duplicate steps
    by_tag = collections.defaultdict(dict)
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            rec = json.loads(line)
            by_tag[rec["tag"]][int(rec["step"])] = float(rec["value"])
    return {tag: (sorted(d), [d[s] for s in sorted(d)])
            for tag, d in by_tag.items()}


def main():
    p = argparse.ArgumentParser("training-curve plots")
    p.add_argument("--log_dir", required=True)
    p.add_argument("--metrics", default="metrics.jsonl")
    p.add_argument("--out", default=None,
                   help="output PNG (default <log_dir>/curves.png)")
    p.add_argument("--logy", action="store_true", default=True)
    p.add_argument("--no-logy", dest="logy", action="store_false")
    args = p.parse_args()

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    path = os.path.join(args.log_dir, args.metrics)
    by_tag = load_metrics(path)
    if not by_tag:
        raise SystemExit(f"no scalars in {path}")

    # group tags by measure (suffix after '/'): each measure gets its own
    # axes — never two y-scales on one axis
    groups = collections.defaultdict(list)
    for tag in sorted(by_tag):
        measure = tag.split("/")[-1]
        groups[measure].append(tag)

    n = len(groups)
    fig, axes = plt.subplots(1, n, figsize=(5.2 * n, 3.6), squeeze=False)
    for ax, (measure, tags) in zip(axes[0], sorted(groups.items())):
        for i, tag in enumerate(tags):
            xs, ys = by_tag[tag]
            ax.plot(xs, ys, color=SERIES_COLORS[i % len(SERIES_COLORS)],
                    linewidth=2.0, label=tag)
        ax.set_title(measure, color=INK, fontsize=11)
        ax.set_xlabel("epoch", color=INK, fontsize=9)
        if args.logy and all(v > 0 for t in tags for v in by_tag[t][1]):
            ax.set_yscale("log")
        ax.grid(True, color=GRID, linewidth=0.6)
        ax.tick_params(colors=INK, labelsize=8)
        for s in ("top", "right"):
            ax.spines[s].set_visible(False)
        for s in ("left", "bottom"):
            ax.spines[s].set_color(GRID)
        if len(tags) >= 2:
            ax.legend(frameon=False, fontsize=8, labelcolor=INK)
    fig.tight_layout()
    out = args.out or os.path.join(args.log_dir, "curves.png")
    fig.savefig(out, dpi=130)
    print(out)


if __name__ == "__main__":
    main()
