"""Evaluate the committed RAMS artifact on a patient-held-out validation set.

The committed anchor (artifacts/rams_dwi/anchor.json) was measured on the
historical sequential split, whose val patches share patients (and, at the
boundary, slices) with training patches. This script quantifies how much of
the anchor's val cPSNR survives on anatomy the network never saw: patches
from held-out patients, same generation seed. Writes
results/round3_rams/holdout_eval.json with both numbers and the bicubic
baseline on the held-out set.
"""
import json
import os
import sys

repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, repo)
sys.path.insert(0, os.path.join(repo, "cli"))


def main():
    import numpy as np

    from train_misr import build_dataset, split_dataset

    from mri_super_resolution_tpu.config import RAMSConfig, TrainerConfig
    from mri_super_resolution_tpu.data.preprocessing import bicubic
    from mri_super_resolution_tpu.fit.trainer import Trainer
    from mri_super_resolution_tpu.ops.shift_metrics import shift_psnr
    from mri_super_resolution_tpu.pipelines.misr import build_rams

    X, Y, M, pids = build_dataset(seed=0)
    # the historical split's val patches are pid 0's first slices; hold out
    # the LAST patient so the held-out set is disjoint from historical val
    (Xt, Yt, Mt), (Xv, Yv, Mv) = split_dataset(X, Y, M, pids,
                                               holdout_patients=1)
    print(f"held-out val: {len(Xv)} patches (patient {np.unique(pids)[-1]})",
          flush=True)

    model = build_rams(RAMSConfig())
    cfg = TrainerConfig(batch_size=8, hr_size=Yv.shape[1],
                        checkpoint_dir=os.path.join(repo, "artifacts", "rams_dwi"),
                        log_dir="/tmp/rams_holdout_logs")
    trainer = Trainer(model, cfg)
    trainer.init(Xv, seed=0)  # restores the save-best checkpoint
    rams_psnr = float(trainer.evaluate(Xv, Yv, Mv))

    import jax.numpy as jnp
    bic = []
    for i in range(len(Xv)):
        lr_mean = Xv[i].mean(-1, keepdims=True)
        up = bicubic(lr_mean[None], scale=Yv.shape[1] // Xv.shape[1])[0]
        bic.append(float(shift_psnr(
            jnp.asarray(Yv[i:i + 1]), jnp.asarray(up[None], jnp.float32),
            jnp.asarray(Mv[i:i + 1]), Yv.shape[1],
        )))
    bicubic_psnr = float(np.mean(bic))

    out = {
        "holdout_val_patches": int(len(Xv)),
        "rams_cpsnr_holdout": round(rams_psnr, 4),
        "bicubic_cpsnr_holdout": round(bicubic_psnr, 4),
        "gain_db": round(rams_psnr - bicubic_psnr, 4),
        "anchor_sequential_split_cpsnr": 28.0704,
    }
    os.makedirs(os.path.join(repo, "results", "round3_rams"), exist_ok=True)
    path = os.path.join(repo, "results", "round3_rams", "holdout_eval.json")
    json.dump(out, open(path, "w"), indent=1)
    print(json.dumps(out), flush=True)
    print("wrote", path)


if __name__ == "__main__":
    main()
