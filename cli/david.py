#!/usr/bin/env python
"""ERD-only contrast statistics (no INR) — david.py equivalent.

Reference: implicit-neural-representations/david.py.
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mri_super_resolution_tpu.data import load_cases
from mri_super_resolution_tpu.pipelines import erd_stats


def main(argv=None):
    p = argparse.ArgumentParser(description="DAVID")
    p.add_argument("--out_folder", default="experiments/")
    p.add_argument("--experiment_name", default="david")
    p.add_argument("--limit_cases", type=int, default=None)
    args = p.parse_args(argv)

    cases = load_cases(limit=args.limit_cases)
    if not cases:
        p.error("no cases found")
    path = erd_stats.run(cases, args.out_folder, args.experiment_name)
    print(f"metrics written to {path}")


if __name__ == "__main__":
    main()
