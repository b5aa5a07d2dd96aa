#!/usr/bin/env python
"""Aggregate sweep artifacts into a CSV — equivalent of the reference's
``scripts/make_result_table.py:34-131``.

Crawls ``model_saves/<sweep>/config_<n>_run_<r>/{pre,post}/`` for accuracy
files (accepting both ``acc_{before,after}.txt`` — the name the reference's
aggregation expects — and ``test_acc_{before,after}.txt`` — the name its
trainer actually writes; SURVEY.md §2 row 21 notes the upstream drift), joins
each run with its ``config.json``, and writes ``results/<sweep>.csv``.

Usage: python scripts/make_result_table.py <sweep_name> [--saves model_saves]
       [--out results]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import sys


def read_acc(folder: str, stage: str):
    for prefix in ("acc", "test_acc"):
        path = os.path.join(folder, f"{prefix}_{stage}.txt")
        if os.path.isfile(path):
            with open(path) as f:
                return float(f.read().strip())
    return None


def read_results_json(folder: str, stage: str):
    path = os.path.join(folder, f"test_results_{stage}.json")
    if os.path.isfile(path):
        return json.load(open(path))
    return None


def collect(sweep_dir: str):
    rows = []
    pattern = os.path.join(sweep_dir, "config_*_run_*")
    for run_dir in sorted(glob.glob(pattern)):
        m = re.search(r"config_(\d+)_run_(\d+)$", run_dir)
        if not m:
            continue
        config_num, run_idx = int(m.group(1)), int(m.group(2))
        cfg_path = os.path.join(run_dir, "config.json")
        cfg = json.load(open(cfg_path)) if os.path.isfile(cfg_path) else {}
        row = {"config_num": config_num, "run": run_idx}
        for k in ("sentiment_hidden_size", "lr", "sentiment_lr", "n_epochs",
                  "word_loss_weight", "likelihood_weight", "pos_embed_dim",
                  "norm", "optimizer", "e2e", "dataset", "unimodal"):
            if k in cfg:
                row[k] = cfg[k]
        for which in ("pre", "post"):
            sub = os.path.join(run_dir, which)
            for stage in ("before", "after"):
                acc = read_acc(sub, stage)
                if acc is not None:
                    row[f"{which}_acc_{stage}"] = acc
                res = read_results_json(sub, stage)
                if res is not None:
                    for mk in ("mae", "corr", "mult_acc", "f_score"):
                        v = res.get(mk)
                        if isinstance(v, (int, float)):
                            row[f"{which}_{mk}_{stage}"] = v
        rows.append(row)
    return rows


def main(argv=None) -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("sweep_name")
    parser.add_argument("--saves", default="model_saves")
    parser.add_argument("--out", default="results")
    args = parser.parse_args(argv)

    rows = collect(os.path.join(args.saves, args.sweep_name))
    if not rows:
        print(f"no runs found under {args.saves}/{args.sweep_name}", file=sys.stderr)
        return 1
    import pandas as pd

    df = pd.DataFrame(rows).sort_values(["config_num", "run"])
    os.makedirs(args.out, exist_ok=True)
    out_path = os.path.join(args.out, f"{args.sweep_name}.csv")
    df.to_csv(out_path, index=False)
    print(f"wrote {out_path} ({len(df)} rows)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
