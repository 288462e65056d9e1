#!/usr/bin/env python
"""Synthetic half-res quality protocol — superres-lowres(-qual).ipynb port.

Downsamples each slice's acquisition-mean 0.5x, super-resolves it back with
the two-phase perturbed INR, and scores SR vs spline against the original
full-res mean (the confound-free quality harness; see
pipelines/lowres_qual.py).
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--limit_cases", type=int, default=None)
    p.add_argument("--num_acq", type=int, default=9)
    p.add_argument("--slices", type=int, nargs="*", default=None,
                   help="slice indices (default: every slice, qual-notebook style)")
    p.add_argument("--cancer_slice_only", action="store_true",
                   help="just each case's cancer slice (superres-lowres.ipynb cell 6)")
    p.add_argument("--phase2_steps", type=int, default=500)
    p.add_argument("--loss_threshold", type=float, default=2e-5)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out_csv", default="lowres_qual.csv")
    p.add_argument("--data_dir", default=None)
    p.add_argument("--split_protocol", action="store_true",
                   help="ground truth from a held-out half of the "
                        "acquisitions (noise independent of both arms)")
    args = p.parse_args(argv)

    from cli.inr_erd import build_cases

    from mri_super_resolution_tpu.pipelines import lowres_qual

    cfg = lowres_qual.LowresQualConfig(
        phase2_steps=args.phase2_steps, loss_threshold=args.loss_threshold,
        split_protocol=args.split_protocol,
    )
    cases = build_cases(args.limit_cases, args.num_acq, args.data_dir)
    if not cases:
        p.error("no cases found")

    if args.cancer_slice_only:
        path = None
        from mri_super_resolution_tpu.data import MetricsCSV
        from mri_super_resolution_tpu.pipelines.lowres_qual import LOWRES_QUAL_HEADER

        csv = MetricsCSV(args.out_csv, LOWRES_QUAL_HEADER)
        for case in cases:
            res = lowres_qual.run_slice(case, case.cancer_slice, cfg, seed=args.seed)
            ssim_sp, ssim_sr, psnr_sp, psnr_sr = res.metrics
            csv.append(case.pt_id, case.cancer_slice,
                       round(ssim_sp, 5), round(ssim_sr, 5),
                       round(psnr_sp, 3), round(psnr_sr, 3))
            print(f"{case.pt_id}: SSIM spline {ssim_sp:.4f} SR {ssim_sr:.4f}")
        path = csv.path
    else:
        path = lowres_qual.run(cases, cfg, args.out_csv, slices=args.slices, seed=args.seed)
    print(f"metrics written to {path}")


if __name__ == "__main__":
    main()
