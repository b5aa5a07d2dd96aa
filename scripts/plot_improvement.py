#!/usr/bin/env python
"""Top-config improvement bar plots — equivalent of the reference's
``scripts/plot_improvement.py:121-184``.

Reads a results CSV produced by ``make_result_table.py`` and plots, for the
top-N configs by post-training accuracy, the before/after accuracy bars.

Usage: python scripts/plot_improvement.py results/<sweep>.csv [--top 10]
       [--metric post_acc_after] [--out plots/<sweep>.png]
"""

from __future__ import annotations

import argparse
import os


def main(argv=None) -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("csv_path")
    parser.add_argument("--top", type=int, default=10)
    parser.add_argument("--metric", default="post_acc_after")
    parser.add_argument("--baseline_metric", default="post_acc_before")
    parser.add_argument("--out")
    args = parser.parse_args(argv)

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import pandas as pd

    df = pd.read_csv(args.csv_path)
    if args.metric not in df.columns:
        raise SystemExit(f"column {args.metric!r} not in {list(df.columns)}")
    agg = df.groupby("config_num").agg(
        after=(args.metric, "mean"),
        before=(args.baseline_metric, "mean")
        if args.baseline_metric in df.columns
        else (args.metric, "mean"),
    )
    top = agg.sort_values("after", ascending=False).head(args.top)

    fig, ax = plt.subplots(figsize=(10, 5))
    x = range(len(top))
    width = 0.4
    ax.bar([i - width / 2 for i in x], top["before"], width, label="before")
    ax.bar([i + width / 2 for i in x], top["after"], width, label="after")
    ax.set_xticks(list(x))
    ax.set_xticklabels([str(i) for i in top.index], rotation=45)
    ax.set_xlabel("config_num")
    ax.set_ylabel(args.metric)
    ax.set_title(f"Top {len(top)} configs: {os.path.basename(args.csv_path)}")
    ax.legend()
    fig.tight_layout()

    out = args.out or os.path.splitext(args.csv_path)[0] + "_top.png"
    os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
    fig.savefig(out, dpi=120)
    print(f"wrote {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
