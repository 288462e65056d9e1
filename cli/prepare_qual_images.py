#!/usr/bin/env python
"""Blinded qualitative-study panel preparation — prepare_qual_images.py equiv.

Reference: implicit-neural-representations/prepare_qual_images.py. Produces
shuffled 4-way (low / interpolated / SR / base) panels + labels.csv, and can
additionally run the perceptual scoring that replaces the MATLAB analysis.
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mri_super_resolution_tpu.pipelines import qual_study


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--out_dir", default="qual")
    p.add_argument("--limit_cases", type=int, default=None)
    p.add_argument("--slices_per_case", type=int, default=1)
    p.add_argument("--num_acq", type=int, default=9)
    p.add_argument("--fine_tune_steps", type=int, default=500)
    p.add_argument("--start_counter", type=int, default=291)
    p.add_argument("--score", action="store_true", help="also run perceptual scoring")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    from cli.inr_erd import build_cases  # reuse the synthetic ERD-case builder

    cases = build_cases(args.limit_cases, args.num_acq)
    if not cases:
        p.error("no cases found")

    import numpy as np

    rng = np.random.default_rng(args.seed)
    os.makedirs(args.out_dir, exist_ok=True)
    from mri_super_resolution_tpu.data import MetricsCSV

    csv = MetricsCSV(
        os.path.join(args.out_dir, "labels.csv"),
        ("file", "pt", "image", "1", "2", "3", "4"),
    )
    counter = args.start_counter
    panels = {}
    for case in cases:
        S = case.b3.shape[2]
        for _slice in rng.permutation(S)[: args.slices_per_case]:
            panel = qual_study.build_panel(
                case, int(_slice), seed=counter, fine_tune_steps=args.fine_tune_steps
            )
            row = qual_study.save_panel(panel, os.path.join(args.out_dir, f"{counter}.png"))
            csv.append(counter, case.pt_id, int(_slice), row["1"], row["2"], row["3"], row["4"])
            panels[counter] = panel
            counter += 1
    print(f"labels written to {csv.path} ({len(panels)} panels)")

    if args.score:
        out = qual_study.score_panels(panels, os.path.join(args.out_dir, "perceptual_scores.csv"))
        print(f"perceptual scores written to {out}")


if __name__ == "__main__":
    main()
