#!/usr/bin/env python
"""bf16-vs-f32 training parity for the RAMS compute path (VERDICT r2 #1:
'optimize ... at cPSNR parity').

Trains two fresh RAMS models — compute_dtype float32 and bfloat16 — on the
SAME synthetic-DWI patch set, same seeds and schedule, and reports the val
cPSNR trajectory of each plus wall-clock per step. Parity = bf16 within
~0.1 dB of f32 at every checkpoint of the (short) schedule.

Usage: python scripts/rams_dtype_parity.py [--epochs 6]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=6)
    ap.add_argument("--out", default="results/round3_rams/dtype_parity.json")
    args = ap.parse_args()

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, os.path.join(repo, "cli"))
    from train_misr import build_dataset

    from mri_super_resolution_tpu.config import RAMSConfig, TrainerConfig
    from mri_super_resolution_tpu.fit.trainer import Trainer
    from mri_super_resolution_tpu.pipelines.misr import build_rams

    X, Y, M, _ = build_dataset(seed=0)  # historical sequential split (anchor comparability)
    n_val = max(8, len(X) // 10)
    Xv, Yv, Mv = X[:n_val], Y[:n_val], M[:n_val]
    Xt, Yt, Mt = X[n_val:], Y[n_val:], M[n_val:]
    print(f"train {len(Xt)} / val {len(Xv)} patches", flush=True)

    out = {}
    for dtype in ("float32", "bfloat16"):
        cfg = TrainerConfig(
            batch_size=8, hr_size=Yv.shape[1],
            checkpoint_dir=f"/tmp/parity_{dtype}", log_dir=f"/tmp/parity_{dtype}_logs",
            save_best_only=False,
        )
        tr = Trainer(build_rams(RAMSConfig(compute_dtype=dtype)), cfg,
                     name=f"parity_{dtype}")
        tr.init(Xv, seed=0)
        psnrs = []
        t0 = time.perf_counter()
        for epoch in range(args.epochs):
            tr.fit(Xt, (Yt, Mt), validation_data=((Xv, Yv, Mv)), epochs=1, seed=epoch)
            psnrs.append(float(tr.evaluate(Xv, Yv, Mv)))
            print(f"{dtype} epoch {epoch + 1}: val cPSNR {psnrs[-1]:.3f} dB",
                  flush=True)
        out[dtype] = {"val_cpsnr": psnrs,
                      "wall_s": time.perf_counter() - t0}

    d = [b - a for a, b in zip(out["float32"]["val_cpsnr"],
                               out["bfloat16"]["val_cpsnr"])]
    out["cpsnr_delta_bf16_minus_f32"] = d
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
