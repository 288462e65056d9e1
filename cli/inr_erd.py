#!/usr/bin/env python
"""Soft-ERD two-phase INR fine-tune — INR_ERD.py equivalent.

Reference: implicit-neural-representations/INR_ERD.py. The original loads
per-b bigImage.mat volumes from a cluster path; here the high-b acquisition
stacks are synthesized from the distributed mean-b0 volumes when real data is
absent.
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from mri_super_resolution_tpu.config import INRERDConfig
from mri_super_resolution_tpu.data import available_patients, load_mat
from mri_super_resolution_tpu.data import synthetic
from mri_super_resolution_tpu.pipelines import inr_erd


def _load_bigimage(path):
    """Real bigImage.mat (INR_ERD.py:89-95): b0 (H, W, S) + b1..b3
    (H, W, S, A). Validates the schema with precise first-contact errors."""
    data = load_mat(path)
    missing = [k for k in ("b0", "b1", "b2", "b3") if k not in data]
    if missing:
        raise ValueError(
            f"{path}: missing variable(s) {missing} (bigImage.mat holds "
            f"'b0'..'b3' per INR_ERD.py:92-95); file contains {sorted(data)}"
        )
    b0 = np.asarray(data["b0"], dtype=np.float32)
    b3 = np.asarray(data["b3"], dtype=np.float32)
    if b0.ndim != 3:
        raise ValueError(f"{path}: 'b0' has shape {b0.shape}, expected (H, W, S)")
    if b3.ndim != 4 or b3.shape[:3] != b0.shape:
        raise ValueError(
            f"{path}: 'b3' has shape {b3.shape}, expected "
            f"{b0.shape} + (n_acq,)"
        )
    return b0, b3


def build_cases(limit=None, num_acq=9, data_dir=None, acq_kwargs=None):
    """Build ERD cases; ``acq_kwargs`` forwards extra knobs (noise_sigma_frac,
    shift_sigma, outlier_prob) to the synthetic acquisition generator — used
    by the round-5 corruption-regime sweep (scripts/round5_lowres_regime.py)
    to match / unmatch the 3-D cohort's benign data regime."""
    data_dir = data_dir or os.environ.get("MRI_SR_DATA_DIR", "/root/reference/anon_data")
    cases = []
    for row in available_patients(data_dir)[:limit]:
        pt_no = row["pt_id"].split("-")[-1]
        b = (0.0, 150.0, 1000.0, 1500.0) if row["b"] == 1500.0 else (0.0, 300.0, 600.0, 900.0)
        # real bigImage.mat takes precedence when present, at the reference's
        # layout <data_dir>/<pt_no>/no_aver/bigImage.mat (INR_ERD.py:91-92)
        bigimage = os.path.join(data_dir, pt_no, "no_aver", "bigImage.mat")
        if os.path.exists(bigimage):
            b0, b3 = _load_bigimage(bigimage)
            scale = float(b0.max()) + 1e-12  # unit-order, see note below
            cases.append(
                inr_erd.ERDCase(
                    pt_id=row["pt_id"], b=b, cancer_loc=row["cancer_loc"],
                    contralateral_loc=row["contralateral_loc"],
                    noise=row["noise"], cancer_slice=row["cancer_slice"],
                    b0=b0 / scale, b3=b3 / scale,
                )
            )
            continue
        b0 = np.asarray(
            load_mat(os.path.join(data_dir, f"pat{pt_no}_mean_b0.mat"), "data_mean_b0"),
            dtype=np.float32,
        )
        # unit-scale the case: the reference's bigImage volumes are
        # unit-order (its loss-threshold while-loops assume it) — raw
        # scanner intensities (~0-400 here) would make loss < 2e-5
        # unreachable and run the pre-train to its 100k-step cap
        b0 = b0 / (float(b0.max()) + 1e-12)
        b3 = synthetic.acquisitions_from_b0(
            b0, num_acq=num_acq, b=b[3], seed=int(pt_no),
            **(acq_kwargs or {}))
        cases.append(
            inr_erd.ERDCase(
                pt_id=row["pt_id"],
                b=b,
                cancer_loc=row["cancer_loc"],
                contralateral_loc=row["contralateral_loc"],
                noise=row["noise"],
                cancer_slice=row["cancer_slice"],
                b0=b0,
                b3=b3,
            )
        )
    return cases


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--seeds", type=int, default=10)
    p.add_argument("--limit_cases", type=int, default=None)
    p.add_argument("--num_acq", type=int, default=9)
    p.add_argument("--loss_threshold", type=float, default=2e-5)
    p.add_argument("--hidden_features", type=int, default=128)
    p.add_argument("--hidden_layers", type=int, default=3)
    p.add_argument("--out_csv", default="experiments.csv")
    p.add_argument("--models_dir", default="models")
    p.add_argument("--data_dir", default=None)
    args = p.parse_args(argv)

    cfg = INRERDConfig(seeds=args.seeds, loss_threshold=args.loss_threshold,
                       hidden_features=args.hidden_features,
                       hidden_layers=args.hidden_layers)
    cases = build_cases(args.limit_cases, args.num_acq, args.data_dir)
    if not cases:
        p.error("no cases found")
    os.makedirs(args.models_dir, exist_ok=True)
    path = inr_erd.run(cases, cfg, args.out_csv, models_dir=os.path.abspath(args.models_dir))
    print(f"metrics written to {path}")


if __name__ == "__main__":
    main()
