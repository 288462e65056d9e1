#!/usr/bin/env python
"""k-fold patient cross-validation of the RAMS B=96 recipe (VERDICT r4
Next #4).

Round 4's generalization claim rested on ONE held-out patient
(results/round4_rams/holdout_retrain_b96.json: 24.92 dB, +6.59 over
bicubic). The validated recipe costs ~5-7 min/fold on the v5e
(results/round4_rams/recipe_ab.json), so a full leave-one-patient-out sweep
is cheap: one from-scratch retrain per patient with the production recipe
(B=96, lr 3.5e-4, cosine over the 115200-sample budget — the recipe of the
committed artifact, artifacts/rams_dwi/anchor.json), scored on the held-out
patient's patches vs their bicubic baseline.

Reference trainer being judged: multi-image-super-resolution/
utils/training.py:108-187 (which never measured generalization at all —
its val split shares patients with train).

Writes results/round5_rams/holdout_cv.json.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, repo)
sys.path.insert(0, os.path.join(repo, "cli"))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sample_budget", type=int, default=115200)
    ap.add_argument("--batch", type=int, default=96)
    ap.add_argument("--lr", type=float, default=3.5e-4)
    ap.add_argument("--patches_per_slice", type=int, default=8)
    ap.add_argument("--only", type=int, nargs="*", default=None,
                    help="run only these holdout patient ids (resume aid; "
                    "completed fold rows can be merged from the run log)")
    ap.add_argument("--merge_rows", default=None,
                    help="path to a JSON-lines file of already-completed fold "
                    "rows to merge before the summary")
    ap.add_argument("--out", default="results/round5_rams/holdout_cv.json")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from train_misr import build_dataset

    from mri_super_resolution_tpu.config import RAMSConfig, TrainerConfig
    from mri_super_resolution_tpu.data.preprocessing import bicubic
    from mri_super_resolution_tpu.fit.trainer import Trainer
    from mri_super_resolution_tpu.ops.shift_metrics import shift_psnr
    from mri_super_resolution_tpu.pipelines.misr import build_rams

    X, Y, M, pids = build_dataset(seed=0,
                                  patches_per_slice=args.patches_per_slice)
    pids = np.asarray(pids)
    patients = np.unique(pids).tolist()
    merged = []
    if args.merge_rows:
        with open(args.merge_rows) as fh:
            merged = [json.loads(ln) for ln in fh if ln.strip()]
        done_ids = {r["holdout_patient"] for r in merged}
        patients = [u for u in patients if u not in done_ids]
    if args.only is not None:
        patients = [u for u in patients if u in set(args.only)]
    B = args.batch
    total_steps = args.sample_budget // B
    scale = Y.shape[1] // X.shape[1]
    print(f"{len(X)} patches, {len(patients)} patients, "
          f"{total_steps} steps/fold", flush=True)

    folds = list(merged)
    for u in patients:
        v = pids == u
        Xt, Yt, Mt = X[~v], Y[~v], M[~v]
        Xv, Yv, Mv = X[v], Y[v], M[v]
        steps_per_epoch = -(-len(Xt) // B)
        epochs = -(-total_steps // steps_per_epoch)
        cfg = TrainerConfig(
            batch_size=B, hr_size=Y.shape[1], learning_rate=args.lr,
            lr_schedule="cosine", decay_steps=total_steps, data_aug=False,
            evaluate_every=10**9,  # no mid-train eval; score once at the end
            checkpoint_dir=f"/tmp/rams_cv_{u}", log_dir=f"/tmp/rams_cv_{u}_l")
        tr = Trainer(build_rams(RAMSConfig()), cfg, name=f"cv{u}")
        tr.init(Xt[:B], seed=0)
        t0 = time.perf_counter()
        tr.fit(Xt, (Yt, Mt), epochs=epochs, seed=1)
        wall = time.perf_counter() - t0

        held = float(tr.evaluate(Xv, Yv, Mv))
        bic = []
        for i in range(len(Xv)):
            up = bicubic(Xv[i].mean(-1, keepdims=True)[None], scale=scale)[0]
            bic.append(float(shift_psnr(
                jnp.asarray(Yv[i:i + 1]), jnp.asarray(up[None], jnp.float32),
                jnp.asarray(Mv[i:i + 1]), Y.shape[1])))
        row = {
            "holdout_patient": int(u),
            "holdout_patches": int(v.sum()),
            "train_patches": int((~v).sum()),
            "steps": int(tr.state.step),
            "train_wall_s": round(wall, 1),
            "holdout_cpsnr_db": round(held, 4),
            "bicubic_cpsnr_db": round(float(np.mean(bic)), 4),
            "margin_db": round(held - float(np.mean(bic)), 4),
        }
        folds.append(row)
        print(json.dumps(row), flush=True)

    folds.sort(key=lambda f: f["holdout_patient"])
    margins = np.array([f["margin_db"] for f in folds])
    helds = np.array([f["holdout_cpsnr_db"] for f in folds])
    out = {
        "platform": jax.devices()[0].platform,
        "device": str(jax.devices()[0]),
        "recipe": {"batch": B, "lr": args.lr,
                   "lr_schedule": f"cosine over {total_steps} steps",
                   "sample_budget": args.sample_budget, "data_aug": False,
                   "patches_per_slice": args.patches_per_slice},
        "folds": folds,
        "holdout_cpsnr_mean_db": round(float(helds.mean()), 4),
        "holdout_cpsnr_std_db": round(float(helds.std(ddof=1)), 4),
        "margin_over_bicubic_mean_db": round(float(margins.mean()), 4),
        "margin_over_bicubic_std_db": round(float(margins.std(ddof=1)), 4),
        "margin_over_bicubic_min_db": round(float(margins.min()), 4),
        "protocol": (
            "leave-one-patient-out: one from-scratch B=96-recipe retrain per "
            "fold, shift-tolerant cPSNR on the held-out patient's patches vs "
            "their bicubic baseline (replaces the single-fold claim in "
            "results/round4_rams/holdout_retrain_b96.json)"),
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    json.dump(out, open(args.out, "w"), indent=1)
    print(json.dumps({k: out[k] for k in (
        "holdout_cpsnr_mean_db", "holdout_cpsnr_std_db",
        "margin_over_bicubic_mean_db", "margin_over_bicubic_std_db",
        "margin_over_bicubic_min_db")}), flush=True)
    print("wrote", args.out, flush=True)


if __name__ == "__main__":
    main()
