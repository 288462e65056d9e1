#!/usr/bin/env python
"""Pin the round-2 CNR drift (VERDICT r2 weak #8): one case, same seed, the
2-D ensemble fit run twice — fused Pallas kernel vs pure XLA autodiff — and
the CNR/contrast/C2 metrics compared line by line.

Round-1 (XLA path) cohort-mean CNR was 7.30; round-2 (kernel path) 6.22. The
open question: numerical path difference, or 3x3-ROI noise sensitivity? This
isolates the variable: identical case, seed, steps — only the gradient path
differs.

Usage: python scripts/pin_cnr.py [--case 0] [--steps 3000]
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--case", type=int, default=0)
    ap.add_argument("--steps", type=int, default=3000)
    ap.add_argument("--out", default="results/round3_cnr/pin.json")
    args = ap.parse_args()

    from mri_super_resolution_tpu.config import Master2DConfig
    from mri_super_resolution_tpu.data import MetricsCSV, load_cases
    from mri_super_resolution_tpu.pipelines import master2d

    case = load_cases(limit=args.case + 1)[args.case]
    rows = {}
    for label, use_pallas in (("kernel", True), ("xla", False)):
        cfg = Master2DConfig(total_steps=args.steps, use_pallas=use_pallas,
                             exp_name=f"pin_{label}")
        csv = MetricsCSV(f"/tmp/pin_cnr_{label}.csv",
                         ("seed", "patient", "direction", "image", "metric",
                          "performance"))
        master2d.run_case(case, cfg, seed=0, csv=csv)
        recs = {}
        for line in open(csv.path).read().splitlines()[1:]:
            seed, pt, d, img, metric, val = line.split(",")
            recs[(d, img, metric)] = float(val)
        rows[label] = recs
        print(f"{label}: {len(recs)} metric rows", flush=True)

    keys = sorted(set(rows["kernel"]) & set(rows["xla"]))
    diffs = []
    print(f"{'direction':9s} {'image':13s} {'metric':9s} {'kernel':>9s} "
          f"{'xla':>9s} {'rel':>8s}")
    for k in keys:
        a, b = rows["kernel"][k], rows["xla"][k]
        rel = abs(a - b) / (abs(b) + 1e-9)
        diffs.append(rel)
        if rel > 0.02 or k[2] in ("CNR", "CNR2"):
            print(f"{k[0]:9s} {k[1]:13s} {k[2]:9s} {a:9.4f} {b:9.4f} {rel:8.4f}")
    cnr_k = np.mean([v for (d, i, m), v in rows["kernel"].items() if m == "CNR"])
    cnr_x = np.mean([v for (d, i, m), v in rows["xla"].items() if m == "CNR"])
    summary = {
        "case": case.pt_id, "steps": args.steps,
        "mean_CNR_kernel": float(cnr_k), "mean_CNR_xla": float(cnr_x),
        "median_rel_diff_all_metrics": float(np.median(diffs)),
        "max_rel_diff_all_metrics": float(np.max(diffs)),
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary, indent=2))


if __name__ == "__main__":
    main()
