#!/usr/bin/env python
"""3-D volume FF-INR + PerturbNet super-resolution — superresDWI.py equivalent.

Reference: implicit-neural-representations/superresDWI.py. Loads hybrid
master.mat volumes if given, otherwise synthesizes hybrid acquisitions from
the distributed mean-b0 volumes (see data/synthetic.py docstring).
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from mri_super_resolution_tpu.config import SupperresDWIConfig
from mri_super_resolution_tpu.data import load_mat, available_patients
from mri_super_resolution_tpu.data import synthetic
from mri_super_resolution_tpu.pipelines import superres3d


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--master_mats", nargs="*", default=None,
                   help="paths to master.mat files (else synthesize from anon_data)")
    p.add_argument("--epochs", type=int, default=2500)
    p.add_argument("--pn_epochs", type=int, default=10)
    p.add_argument("--hidden_dim", type=int, default=512)
    p.add_argument("--num_layers", type=int, default=3)
    p.add_argument("--mapping_size", type=int, default=128)
    p.add_argument("--roi_start", type=int, default=40)
    p.add_argument("--roi_end", type=int, default=90)
    p.add_argument("--limit_patients", type=int, default=None)
    p.add_argument("--save_panels", action="store_true")
    p.add_argument("--export_npz", action="store_true",
                   help="export zero-shot LR/GT/SR triplets (forbagci.py variant)")
    p.add_argument("--export_artifact", action="store_true",
                   help="export each patient's fitted volume INR as a "
                        "jax.export serving artifact (pat<id>/artifact/)")
    p.add_argument("--synthetic_model", choices=("mono", "tissue"),
                   default="mono",
                   help="synthetic hybrid physics when master.mat is absent: "
                        "mono-exponential (reference-like) or 3-compartment "
                        "tissue (in-model for the hybrid fitters)")
    p.add_argument("--inr_lr", type=float, default=1e-4,
                   help="INR learning rate (inrDWI.py clean-data variant uses 5e-5)")
    p.add_argument("--inr_restart_every", type=int, default=0,
                   help="periodic Adam-moment restarts for the INR fit "
                        "(0 = reference flat Adam; 100 measured faster "
                        "time-to-PSNR — see fit/optim.py for the evidence "
                        "and its caveats)")
    p.add_argument("--inr_model", choices=("siren", "grid", "wire"),
                   default="siren",
                   help="volume INR family: the reference's FF-SIREN "
                        "(parity default), the multiresolution dense-grid "
                        "model (models/grid_inr.py; separable tensor-product "
                        "fit/inference — far faster to a given quality), or "
                        "the WIRE complex-Gabor INR (models/wire.py, "
                        "INRmodel.py:66-120) on raw coords via the fused "
                        "Gabor kernel")
    p.add_argument("--wire_hidden", type=int, default=256)
    p.add_argument("--wire_layers", type=int, default=2)
    p.add_argument("--wire_lr", type=float, default=1e-3,
                   help="Gabor-INR lr (round-5 sweep: 1e-3 beats the old "
                   "5e-3 default at both widths)")
    p.add_argument("--wire_omega", type=float, default=10.0)
    p.add_argument("--wire_sigma", type=float, default=10.0)
    p.add_argument("--wire_trainable", action="store_true",
                   help="trainable per-layer omega/sigma (reference "
                   "INRmodel.py:70-84 nn.Parameter; +6.7 dB on the flagship "
                   "ROI fit, results/round5_wire/sweep.json)")
    p.add_argument("--grid_lr", type=float, default=5e-3,
                   help="Adam lr for --inr_model grid")
    p.add_argument("--grid_levels", type=int, default=4)
    p.add_argument("--grid_base_resolution", type=int, default=6)
    p.add_argument("--grid_hidden", type=int, default=64)
    p.add_argument("--grid_features", type=int, default=4,
                   help="features per grid level")
    p.add_argument("--grid_z_divisor", type=int, default=1,
                   help="z grid resolution = max(R // divisor, 2); 1 (full "
                        "z resolution) is required on ROI-cropped LR grids "
                        "where z is the largest axis; 4 suits full volumes "
                        "with sparse slices")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", default="SR_results")
    from mri_super_resolution_tpu.config import add_preset_arg

    add_preset_arg(p, argv)
    args = p.parse_args(argv)

    cfg = SupperresDWIConfig(
        number_of_epochs=args.epochs,
        perturbation_epochs=args.pn_epochs,
        hidden_dim=args.hidden_dim,
        num_layers=args.num_layers,
        mapping_size=args.mapping_size,
        roi_start=args.roi_start,
        roi_end=args.roi_end,
        inr_lr=args.inr_lr,
        inr_restart_every=args.inr_restart_every,
        inr_model=args.inr_model,
        grid_lr=args.grid_lr,
        grid_levels=args.grid_levels,
        grid_base_resolution=args.grid_base_resolution,
        grid_hidden=args.grid_hidden,
        grid_features=args.grid_features,
        grid_z_divisor=args.grid_z_divisor,
        wire_hidden=args.wire_hidden,
        wire_layers=args.wire_layers,
        wire_lr=args.wire_lr,
        wire_omega=args.wire_omega,
        wire_sigma=args.wire_sigma,
        wire_trainable=args.wire_trainable,
    )

    patients = []
    if args.master_mats:
        for path in args.master_mats:
            pt_id = os.path.basename(os.path.dirname(path)) or os.path.basename(path)
            hybrid, b = superres3d.load_hybrid(path)
            patients.append((pt_id, hybrid, b))
    else:
        rows = available_patients()[: args.limit_patients]
        b_values = (0.0, 150.0, 1000.0, 1500.0)
        for row in rows:
            pt_no = row["pt_id"].split("-")[-1]
            b0 = np.asarray(
                load_mat(
                    os.path.join(
                        os.environ.get("MRI_SR_DATA_DIR", "/root/reference/anon_data"),
                        f"pat{pt_no}_mean_b0.mat",
                    ),
                    "data_mean_b0",
                    prefer_native=True,
                ),
                dtype=np.float32,
            )
            if args.synthetic_model == "tissue":
                hybrid, _ = synthetic.hybrid_from_tissue(
                    b0, b_values=b_values, seed=int(pt_no))
            else:
                hybrid = synthetic.hybrid_from_b0(
                    b0, b_values=b_values, seed=int(pt_no))
            patients.append((pt_no, hybrid, np.asarray(b_values)))

    if not patients:
        p.error("no patients found")
    out = superres3d.run(
        patients, cfg, args.out, seed=args.seed,
        save_panels=args.save_panels, export_npz=args.export_npz,
        export_artifact=args.export_artifact,
    )
    print(f"results in {out}")


if __name__ == "__main__":
    main()
