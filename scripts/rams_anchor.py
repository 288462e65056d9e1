#!/usr/bin/env python
"""Anchor the trained RAMS checkpoint against the standard MISR baseline.

The reference's checkpoints encode a best-val PSNR with no committed context
(utils/training.py:88-91); our replacement (artifacts/rams_dwi) was trained
on synthetic DWI with no external anchor. The PROBA-V literature's own
anchor is the margin over bicubic interpolation of the averaged LR stack
(RAMS beats it by ~1-1.5 dB cPSNR on PROBA-V). This script rebuilds the
exact training/validation split (same seed), evaluates both on the same
shift-tolerant cPSNR, and writes artifacts/rams_dwi/anchor.json.
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, os.path.join(repo, "cli"))
    from train_misr import build_dataset

    from mri_super_resolution_tpu.config import RAMSConfig, TrainerConfig
    from mri_super_resolution_tpu.data.preprocessing import bicubic
    from mri_super_resolution_tpu.fit.trainer import Trainer
    from mri_super_resolution_tpu.ops.shift_metrics import shift_psnr
    from mri_super_resolution_tpu.pipelines.misr import build_rams

    X, Y, M, _ = build_dataset(seed=0)  # historical sequential split (anchor comparability)
    n_val = max(8, len(X) // 10)
    Xv, Yv, Mv = X[:n_val], Y[:n_val], M[:n_val]
    print(f"val set: {len(Xv)} patches, LR {Xv.shape[1:]}, HR {Yv.shape[1:]}")

    ckpt_dir = os.path.join(repo, "artifacts", "rams_dwi")
    model = build_rams(RAMSConfig())
    cfg = TrainerConfig(batch_size=8, hr_size=Yv.shape[1], checkpoint_dir=ckpt_dir)
    trainer = Trainer(model, cfg)
    trainer.init(Xv, seed=0)  # restores latest checkpoint if present
    rams_psnr = trainer.evaluate(Xv, Yv, Mv)

    # baseline: bicubic upscale of the temporal mean of the LR stack
    psnrs = []
    for i in range(len(Xv)):
        lr_mean = Xv[i].mean(-1, keepdims=True)  # (h, w, 1)
        up = bicubic(lr_mean[None], scale=Yv.shape[1] // Xv.shape[1])[0]
        p = shift_psnr(
            jnp.asarray(Yv[i : i + 1]), jnp.asarray(up[None], jnp.float32),
            jnp.asarray(Mv[i : i + 1]), Yv.shape[1],
        )
        psnrs.append(float(p))
    bicubic_psnr = float(np.mean(psnrs))

    out = {
        "val_patches": int(len(Xv)),
        "rams_val_cpsnr_db": round(float(rams_psnr), 3),
        "bicubic_mean_val_cpsnr_db": round(bicubic_psnr, 3),
        "margin_db": round(float(rams_psnr) - bicubic_psnr, 3),
        "note": "shift-tolerant cPSNR, same protocol for both; PROBA-V "
                "literature margin for RAMS over bicubic is ~1-1.5 dB",
    }
    print(json.dumps(out, indent=1))
    with open(os.path.join(ckpt_dir, "anchor.json"), "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
