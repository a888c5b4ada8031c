"""`mp summary`: aggregate prediction result CSVs into a dice report.

Parity surface: `mpunet/bin/summary.py` — walks result folders for csv/
sub-directories, reports overall mean dice +/- std, per-class means and
per-view means (sample output: reference README.md:246-274)."""

from __future__ import annotations

import os
from argparse import ArgumentParser
from glob import glob
from pathlib import Path

import numpy as np
import pandas as pd


def get_argparser():
    parser = ArgumentParser(description="Summarize prediction results")
    parser.add_argument("--dir", type=str, default="./",
                        help="Folder (or glob pattern) of prediction result "
                             "directories containing a csv/ subfolder")
    parser.add_argument("--out", type=str, default=None,
                        help="Optional path to write the report text file")
    return parser


def find_result_dirs(pattern):
    hits = []
    for path in glob(pattern) or [pattern]:
        for root, dirs, files in os.walk(path):
            if os.path.basename(root) == "csv" and "results.csv" in files:
                hits.append(root)
    return sorted(set(hits))


def parse_results(csv_dir):
    """(results df, {view: per-class df}) from one csv folder."""
    results = pd.read_csv(os.path.join(csv_dir, "results.csv"), index_col=0)
    pc = {}
    for path in glob(os.path.join(csv_dir, "*.csv")):
        name = Path(path).stem
        if name in ("results", "detailed"):
            continue
        pc[name] = pd.read_csv(path, index_col=0)
    return results, pc


def build_report(csv_dirs):
    lines = []
    all_mj = []
    for csv_dir in csv_dirs:
        results, pc = parse_results(csv_dir)
        lines.append(f"\n=== {csv_dir} ===")
        if "MJ" in results.columns:
            mj = results["MJ"].dropna()
            all_mj.append(mj)
            lines.append(f"Fused (MJ) mean dice: {mj.mean():.3f} "
                         f"+/- {mj.std():.3f}  (N={len(mj)})")
        if "MJ" in pc:
            per_class = pc["MJ"].mean(axis=1, skipna=True)
            lines.append("Per-class mean dice:")
            for cls, val in per_class.items():
                lines.append(f"  class {cls}: {val:.3f}")
        view_cols = [c for c in results.columns if c != "MJ"]
        if view_cols:
            lines.append("Per-view mean dice:")
            for c in view_cols:
                col = results[c].dropna()
                if len(col):
                    lines.append(f"  {c}: {col.mean():.3f}")
    if all_mj:
        cat = pd.concat(all_mj)
        lines.insert(0, f"Overall fused mean dice: {cat.mean():.3f} "
                        f"+/- {cat.std():.3f}  (N={len(cat)})")
    return "\n".join(lines)


def entry_func(args=None):
    args = get_argparser().parse_args(args)
    csv_dirs = find_result_dirs(args.dir)
    if not csv_dirs:
        print(f"No result csv folders found under '{args.dir}'")
        return
    report = build_report(csv_dirs)
    print(report)
    if args.out:
        Path(args.out).write_text(report + "\n")


if __name__ == "__main__":
    entry_func()
