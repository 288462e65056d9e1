#!/usr/bin/env python
"""Export the best save-best checkpoint in artifacts/rams_dwi to
artifacts/rams_dwi_params, re-verify by restore+eval on the held-out split,
and refresh anchor.json.

Used when a continuation run (scripts/rams_continue.py) is interrupted after
the save-best checkpoint landed but before its export step ran.
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, os.path.join(repo, "cli"))
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt_dir",
                    default=os.path.join(repo, "artifacts", "rams_dwi"))
    ap.add_argument("--params_dir",
                    default=os.path.join(repo, "artifacts", "rams_dwi_params"))
    ap.add_argument("--lr_schedule", choices=("constant", "cosine"),
                    default="constant",
                    help="must match the training run — a cosine run's "
                    "opt_state carries schedule state the restore template "
                    "has to mirror")
    ap.add_argument("--decay_steps", type=int, default=1)
    args = ap.parse_args()

    from train_misr import build_dataset

    from mri_super_resolution_tpu.config import RAMSConfig, TrainerConfig
    from mri_super_resolution_tpu.fit.trainer import Trainer, TrainState
    from mri_super_resolution_tpu.pipelines.misr import build_rams
    from mri_super_resolution_tpu.utils import save_pytree

    X, Y, M, _ = build_dataset(seed=0, patches_per_slice=8)  # historical split
    n_val = max(8, len(X) // 10)
    Xv, Yv, Mv = X[:n_val], Y[:n_val], M[:n_val]

    ckpt_dir = os.path.abspath(args.ckpt_dir)
    params_dir = os.path.abspath(args.params_dir)
    cfg = TrainerConfig(
        batch_size=8, hr_size=Yv.shape[1], checkpoint_dir=ckpt_dir,
        save_best_only=True, lr_schedule=args.lr_schedule,
        decay_steps=args.decay_steps,
    )
    tr = Trainer(build_rams(RAMSConfig()), cfg, name="export")
    st = tr.init(Xv, seed=0)

    latest = tr.manager.latest_step()
    try:
        tree = tr.manager.restore(
            {"params": st.params, "opt_state": st.opt_state,
             "step": 0, "psnr": 0.0}, step=latest)
    except ValueError:
        # opt_state template mismatch (e.g. a cosine run's checkpoint
        # carries schedule state and --lr_schedule wasn't passed): restore
        # templateless — this script only needs the params anyway.
        tree = tr.manager.restore(step=latest)
    print(f"restored checkpoint step {tree['step']} "
          f"(recorded psnr {tree['psnr']:.4f} dB)", flush=True)

    # an EMA run's serving weights are the averaged ones (they are what the
    # save-best gate scored); fit/trainer.py checkpoints them as 'ema_params'
    ema = tree.get("ema_params")
    serve_params = ema if ema is not None else tree["params"]
    tr.state = TrainState(serve_params, st.opt_state, int(tree["step"]))
    val = float(tr.evaluate(Xv, Yv, Mv))
    print(f"restore+eval on held-out split: {val:.4f} dB", flush=True)

    save_pytree(params_dir, serve_params)
    print(f"exported params to {params_dir}", flush=True)
    print(json.dumps({"step": int(tree["step"]), "val_cpsnr": val}))


if __name__ == "__main__":
    main()
