#!/usr/bin/env python
"""SSIM-protocol quality sweep: SR-vs-spline win rate as a function of SNR.

Round-1 finding (BASELINE.md): with per-acquisition noise sigma = 2% of
signal, SR loses the superresDWI SSIM protocol to spline 1/112; near-clean
(0.2%) it wins 59/112. The reference operates on acquisition-averaged real
data whose effective SNR sits between those regimes (it fits the mean of the
cross-b combination expansion, superresDWI.py:68-82). This sweep synthesizes
that regime directly: per-acquisition sigma swept over
{2%, 1%, 0.5%, 0.23%, 0.1%, 0.02%}, where 0.23% ~= 2%/sqrt(75) is the
effective-sigma point VERDICT.md identifies with the reference's
combination-mean operating regime.

For each point: full reference config fit (2500 epochs, FF-128, 512x3 + PN),
the 112-row (slice x b) SSIM table (superresDWI.py:179-187), and the
*measured* effective noise of the fitted mean volume (vs a sigma=0 rerun of
the same generator seed — same smooth fields, same shifts).

Writes results/round2_quality/ssim_vs_snr.{csv,json}.
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from mri_super_resolution_tpu.config import SupperresDWIConfig
from mri_super_resolution_tpu.data import load_mat, combination_mean
from mri_super_resolution_tpu.data import synthetic
from mri_super_resolution_tpu.pipelines import superres3d

SIGMAS = (0.02, 0.01, 0.005, 0.0023, 0.001, 0.0002)
PT_NO = "07"
B_VALUES = (0.0, 150.0, 1000.0, 1500.0)


def mean_volume(hybrid) -> np.ndarray:
    normed, _ = superres3d.normalize_hybrid(hybrid)
    return combination_mean(normed, te=0)


def main():
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                           "results", "round2_quality")
    os.makedirs(out_dir, exist_ok=True)

    b0 = np.asarray(
        load_mat(
            os.path.join(
                os.environ.get("MRI_SR_DATA_DIR", "/root/reference/anon_data"),
                f"pat{PT_NO}_mean_b0.mat",
            ),
            "data_mean_b0",
        ),
        dtype=np.float32,
    )
    cfg = SupperresDWIConfig()  # full reference config
    seed = int(PT_NO)

    clean = synthetic.hybrid_from_b0(b0, b_values=B_VALUES, seed=seed, noise_sigma_frac=0.0)
    clean_mean = mean_volume(clean)
    r0, r1 = cfg.roi_start, cfg.roi_end
    roi_clean = clean_mean[r0:r1, r0:r1]
    signal_level = float(np.mean(roi_clean[roi_clean > 0.05]))

    rows = []
    for sigma in SIGMAS:
        hybrid = synthetic.hybrid_from_b0(
            b0, b_values=B_VALUES, seed=seed, noise_sigma_frac=sigma
        )
        noisy_mean = mean_volume(hybrid)
        eff_noise = float(np.std((noisy_mean - clean_mean)[r0:r1, r0:r1]))
        eff_pct = 100.0 * eff_noise / signal_level

        res = superres3d.run_patient(hybrid, np.asarray(B_VALUES), cfg, seed=0, pt_id=PT_NO)
        sp = np.asarray([r[3] for r in res.ssim_rows])
        sr = np.asarray([r[4] for r in res.ssim_rows])
        wins = int((sr > sp).sum())
        row = {
            "sigma_acq_frac": sigma,
            "eff_noise_pct_of_signal": round(eff_pct, 4),
            "mean_ssim_spline": round(float(sp.mean()), 5),
            "mean_ssim_sr": round(float(sr.mean()), 5),
            "sr_wins": wins,
            "n_pairs": len(sp),
        }
        rows.append(row)
        print(json.dumps(row), flush=True)

    with open(os.path.join(out_dir, "ssim_vs_snr.json"), "w") as f:
        json.dump({"patient": PT_NO, "config": "superresDWI full", "rows": rows}, f, indent=1)
    with open(os.path.join(out_dir, "ssim_vs_snr.csv"), "w") as f:
        f.write(",".join(rows[0].keys()) + "\n")
        for row in rows:
            f.write(",".join(str(v) for v in row.values()) + "\n")
    print("done ->", out_dir)


if __name__ == "__main__":
    main()
