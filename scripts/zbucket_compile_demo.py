#!/usr/bin/env python
"""z-bucket compile evidence (VERDICT r3 Next #7): a cohort of patients with
THREE NOVEL slice counts through the grid fit path.

Before round 4 every novel S recompiled the whole scanned fit (15-30 s);
with the z-bucketed program (grid_inr.py) all S in a power-of-two bucket
share one executable — only the small PN-tail/infer programs remain
shape-keyed. This script runs superres3d.run_patient (grid + restart) on
volumes cropped to S in {24, 26, 28} (one bucket: 32) plus S=20 from the
same bucket, and records per-patient phase timings: patient 1 pays the
one-off compiles; later patients must show NO multi-ten-second fit_s jump.

Writes results/round4_presets/zbucket_timings.json.
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--slice_counts", type=int, nargs="*",
                    default=[24, 26, 28, 20])
    ap.add_argument("--out",
                    default="results/round4_presets/zbucket_timings.json")
    args = ap.parse_args()

    import jax

    from mri_super_resolution_tpu.config import PRESETS, SupperresDWIConfig
    from mri_super_resolution_tpu.data import load_mat
    from mri_super_resolution_tpu.data import synthetic
    from mri_super_resolution_tpu.models.grid_inr import z_bucket_for
    from mri_super_resolution_tpu.pipelines import superres3d

    q = {k: v for k, v in PRESETS["quality"].items()
         if k in {f.name for f in dataclasses.fields(SupperresDWIConfig)}}
    cfg = dataclasses.replace(SupperresDWIConfig(), **q)

    data_dir = os.environ.get("MRI_SR_DATA_DIR", "/root/reference/anon_data")
    b0_full = np.asarray(load_mat(
        os.path.join(data_dir, "pat07_mean_b0.mat"), "data_mean_b0",
        prefer_native=True), dtype=np.float32)
    b_values = np.asarray([0.0, 150.0, 1000.0, 1500.0])

    rows = []
    for i, S in enumerate(args.slice_counts):
        b0 = b0_full[:, :, :S]
        hybrid = synthetic.hybrid_from_b0(b0, seed=100 + S)
        res = superres3d.run_patient(hybrid, b_values, cfg, seed=0,
                                     pt_id=f"S{S}")
        row = dict(res.timings, S=S, z_bucket=z_bucket_for(S),
                   cold=(i == 0))
        rows.append({k: (round(v, 3) if isinstance(v, float) else v)
                     for k, v in row.items()})
        print(json.dumps(rows[-1]))

    warm = [r for r in rows if not r["cold"]]
    out = {
        "platform": jax.devices()[0].platform,
        "claim": "novel slice counts within one z bucket do NOT recompile "
                 "the heavy mean-fit program: warm fit_s stays flat across "
                 "S (the pre-round-4 behavior was a 15-30 s compile per "
                 "novel S)",
        "config": "quality preset (grid z1 + restart_adam 250), 2500 epochs",
        "rows": rows,
        "warm_fit_s": [r["fit_s"] for r in warm],
        "warm_fit_s_spread": (round(max(r["fit_s"] for r in warm)
                                    - min(r["fit_s"] for r in warm), 3)
                              if warm else None),
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
