#!/usr/bin/env python
"""Aggregate experiment CSVs into summary tables and barplots.

Reference: implicit-neural-representations/analyze_results.ipynb (pandas +
seaborn analysis of the contrast/CNR CSVs).
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mri_super_resolution_tpu.utils import analysis


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("csv", help="metrics CSV (master.py schema)")
    p.add_argument("--metrics", nargs="*", default=["C", "CNR", "CNR2"])
    p.add_argument("--out_dir", default="analysis")
    args = p.parse_args(argv)

    df = analysis.load_contrast_csv(args.csv)
    os.makedirs(args.out_dir, exist_ok=True)
    for metric in args.metrics:
        summary = analysis.summarize_contrast(df, metric)
        print(f"== {metric}")
        print(summary.to_string())
        analysis.barplot_metric(df, metric, os.path.join(args.out_dir, f"{metric}.png"))
    print(f"plots in {args.out_dir}")


if __name__ == "__main__":
    main()
