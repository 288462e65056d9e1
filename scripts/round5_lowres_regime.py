#!/usr/bin/env python
"""Round-5 quality reconciliation, experiment 2: corruption-regime sweep on
the 2-D split-acquisition harness (VERDICT r4 Next #1, companion to
scripts/round5_quality_ladder.py).

Hypothesis under test: the round-3 "SR beats spline 59/87" result
(results/round3_lowres_split/) and the round-4 "spline beats SR 725/870"
cohort result differ because of the DATA REGIME + PIPELINE pairing, not the
protocol or dimensionality:

  - round 3 (2-D): acquisitions_from_b0 defaults = 3% noise, sigma=0.6 px
    shifts, 8% whole-acquisition dropouts — and the 2-D pipeline is
    soft-ERD weighted + perturbation-corrected (INR_ERD.py:198-273), i.e.
    it explicitly models exactly that corruption.
  - round 4 (3-D): hybrid_from_b0 = 2% noise, sigma=0.4 shifts, NO
    outliers — and the 3-D pipeline (superresDWI.py parity) fits a plain
    mean with no acceptance weighting.

If the hypothesis holds, re-running the SAME 2-D split harness on a benign
acquisition regime (matched to the 3-D generator's parameters) should
erase or flip the SR-over-spline margin, while the round-3 regime
reproduces it. Both regimes here use identical cases, slices, seeds, and
pipeline config — only the synthetic acquisition corruption changes.

Writes results/round5_quality/lowres_regime.json.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


REGIMES = {
    # round-3 evidence regime: synthetic.acquisitions_from_b0 defaults
    "round3_corrupt": dict(noise_sigma_frac=0.03, shift_sigma=0.6,
                           outlier_prob=0.08),
    # matched to hybrid_from_b0 (the 3-D cohort generator): no outliers,
    # smaller shifts, 2% noise
    "benign_3dmatch": dict(noise_sigma_frac=0.02, shift_sigma=0.4,
                           outlier_prob=0.0),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--limit_cases", type=int, default=3)
    ap.add_argument("--num_acq", type=int, default=9)
    ap.add_argument("--slice_stride", type=int, default=1)
    ap.add_argument("--phase2_steps", type=int, default=500)
    ap.add_argument("--out", default="results/round5_quality/lowres_regime.json")
    args = ap.parse_args()

    import jax

    from cli.inr_erd import build_cases
    from mri_super_resolution_tpu.pipelines import lowres_qual

    cfg = lowres_qual.LowresQualConfig(
        phase2_steps=args.phase2_steps, split_protocol=True)

    out = {"protocol": "2-D split-acquisition masked SSIM "
                       "(results/round3_lowres_split protocol), identical "
                       "cases/slices/seeds per regime",
           "platform": jax.devices()[0].platform,
           "num_acq": args.num_acq, "regimes": {}}
    from scipy import stats

    for name, kw in REGIMES.items():
        cases = build_cases(args.limit_cases, args.num_acq, acq_kwargs=kw)
        rows = []
        for case in cases:
            n_slices = case.b3.shape[2]
            for s in range(0, n_slices, args.slice_stride):
                t0 = time.perf_counter()
                res = lowres_qual.run_slice(case, s, cfg, seed=0)
                ssim_sp, ssim_sr, psnr_sp, psnr_sr = res.metrics
                rows.append((case.pt_id, s, float(ssim_sp), float(ssim_sr),
                             float(psnr_sp), float(psnr_sr)))
                print(f"{name} {case.pt_id} s{s}: SSIM sp {ssim_sp:.4f} "
                      f"sr {ssim_sr:.4f} ({time.perf_counter()-t0:.1f}s)",
                      flush=True)

        d_ssim = np.array([r[3] - r[2] for r in rows])
        d_psnr = np.array([r[5] - r[4] for r in rows])
        wins = int((d_ssim > 0).sum())
        out["regimes"][name] = {
            "acq_params": kw,
            "n": len(rows),
            "sr_ssim_mean": round(float(np.mean([r[3] for r in rows])), 5),
            "spline_ssim_mean": round(float(np.mean([r[2] for r in rows])), 5),
            "sr_wins_ssim": f"{wins}/{len(rows)}",
            "mean_delta_ssim": round(float(d_ssim.mean()), 5),
            "median_delta_ssim": round(float(np.median(d_ssim)), 5),
            "sign_test_p": float(stats.binomtest(wins, len(rows), 0.5).pvalue),
            "mean_delta_psnr": round(float(d_psnr.mean()), 4),
            "rows": rows,
        }
        # incremental write so a cut run still leaves evidence
        os.makedirs(os.path.dirname(args.out), exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)
        print(name, json.dumps({k: v for k, v in out["regimes"][name].items()
                                if k != "rows"}), flush=True)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
