#!/usr/bin/env python
"""End-to-end 3-D super-resolution walkthrough — the SR3D.ipynb /
super-res_example.ipynb capability as a runnable script.

Synthesises hybrid acquisitions from a real mean-b0 volume, runs the full
superres3d pipeline at a reduced configuration, and prints the SSIM table
(SR vs spline-interpolation baseline, the per-run self-check the reference
builds into every experiment; SURVEY.md section 4).

Run: python examples/sr3d_demo.py [--epochs 300]
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from mri_super_resolution_tpu.config import SupperresDWIConfig
from mri_super_resolution_tpu.data import load_mat, synthetic
from mri_super_resolution_tpu.pipelines import superres3d


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--epochs", type=int, default=300)
    p.add_argument("--pn_epochs", type=int, default=6)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    data_dir = os.environ.get("MRI_SR_DATA_DIR", "/root/reference/anon_data")
    b0_path = os.path.join(data_dir, "pat07_mean_b0.mat")
    if os.path.exists(b0_path):
        b0 = np.asarray(load_mat(b0_path, "data_mean_b0"), dtype=np.float32)[:, :, 8:16]
    else:
        rng = np.random.default_rng(0)
        b0 = np.abs(rng.normal(1.0, 0.3, (128, 128, 8))).astype(np.float32)

    bvalues = np.asarray([0.0, 150.0, 1000.0, 1500.0])
    hybrid = synthetic.hybrid_from_b0(b0, b_values=bvalues, acq_counts=(1, 2, 3, 3), seed=7)

    cfg = SupperresDWIConfig(
        number_of_epochs=args.epochs,
        perturbation_epochs=args.pn_epochs,
        hidden_dim=256,
        num_layers=2,
        mapping_size=64,
    )
    result = superres3d.run_patient(hybrid, bvalues, cfg, seed=args.seed, pt_id="demo")

    print("\nslice  b-value  SSIM(spline)  SSIM(SR)")
    wins = 0
    for pt, b, s, ssim_sp, ssim_sr in result.ssim_rows:
        print(f"{s:5d}  {b:7.0f}  {ssim_sp:12.4f}  {ssim_sr:8.4f}")
        wins += ssim_sr > ssim_sp
    n = len(result.ssim_rows)
    print(f"\nSR beats spline interpolation on {wins}/{n} slice x b combinations")


if __name__ == "__main__":
    main()
