"""Memorization probe for the committed RAMS artifact's split audit.

The committed anchor (artifacts/rams_dwi/anchor.json) was measured on the
historical sequential split, whose val patches share patients (and, at the
boundary, slices) with training patches. This script quantifies whether
that inflated the anchor by re-evaluating the artifact on the LAST
patient's patches — which WERE in its training set (the sequential split
trains on every patient beyond the first-10% patches). If the network were
memorizing, trained-on patches would score HIGHER than the never-trained
val set; measured round 3: they score LOWER (25.34 vs 28.07 dB), so the
spread is per-patient difficulty, not leakage. A true held-out
generalization number requires retraining with ``train_misr --split
patient`` (now the default; staged in scripts/tpu_queue.sh).

Writes results/round3_rams/holdout_eval.json.
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
    (Xt, Yt, Mt), (Xv, Yv, Mv) = split_dataset(X, Y, M, pids,
                                               holdout_patients=1)
    print(f"probe set: {len(Xv)} patches (patient idx {np.unique(pids)[-1]},"
          " IN the committed artifact's training set)", flush=True)

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
        "probe_patches": int(len(Xv)),
        "rams_cpsnr_trained_on_patient": round(rams_psnr, 4),
        "bicubic_cpsnr_same_patches": round(bicubic_psnr, 4),
        "margin_db": round(rams_psnr - bicubic_psnr, 4),
        "anchor_sequential_split_cpsnr": 28.0704,
        "interpretation": (
            "the probe patient WAS in the committed artifact's training set "
            "(the historical sequential split trains on all patients except "
            "the first-10% patches); trained-on patches scoring BELOW the "
            "never-trained sequential-val shows no memorization inflation — "
            "the spread is patient difficulty. True held-out generalization "
            "requires retraining with train_misr --split patient (now the "
            "default; queued in scripts/tpu_queue.sh)."
        ),
    }
    path = os.path.join(repo, "results", "round3_rams", "holdout_eval.json")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    json.dump(out, open(path, "w"), indent=1)
    print(json.dumps({k: v for k, v in out.items() if k != "interpretation"}),
          flush=True)
    print("wrote", path)


if __name__ == "__main__":
    main()
