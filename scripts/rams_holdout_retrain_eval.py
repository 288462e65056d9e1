"""True held-out generalization number for RAMS: evaluate the leak-free retrain.

Companion to scripts/rams_holdout_eval.py (the memorization probe of the
committed artifact). That probe showed the historical sequential split's
patient overlap did not inflate the anchor; this script closes the loop with
the number the probe said required a retrain: train with a whole patient
held out (``cli/train_misr.py --split patient``, staged in
scripts/tpu_queue.sh and run on TPU), then score the held-out patient's
patches — which the network has NEVER seen — against their bicubic baseline,
and against the committed artifact's score on the same patches (the artifact
*trained on* that patient, so artifact-minus-retrain bounds the value of
having seen the patient).

Writes results/round3_rams/holdout_retrain.json.
"""
import argparse
import json
import os
import sys

repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, repo)
sys.path.insert(0, os.path.join(repo, "cli"))


def _eval_ckpt(ckpt_dir, Xv, Yv, Mv, params_dir=None):
    """Score a checkpoint on (Xv, Yv, Mv).

    ``ckpt_dir``: an orbax CheckpointManager dir (restores save-best on
    construct). ``params_dir``: a raw params pytree from save_pytree (the
    committed artifact's export format, artifacts/rams_dwi_params) — used
    instead of the manager when given.
    """
    from mri_super_resolution_tpu.config import RAMSConfig, TrainerConfig
    from mri_super_resolution_tpu.fit.trainer import Trainer
    from mri_super_resolution_tpu.pipelines.misr import build_rams
    from mri_super_resolution_tpu.utils import restore_pytree

    model = build_rams(RAMSConfig())
    cfg = TrainerConfig(batch_size=8, hr_size=Yv.shape[1],
                        checkpoint_dir=ckpt_dir,
                        log_dir="/tmp/rams_holdout_retrain_logs")
    trainer = Trainer(model, cfg)
    trainer.init(Xv, seed=0)  # restores the save-best checkpoint if present
    if params_dir is not None:
        trainer.state.params = restore_pytree(params_dir)
    return float(trainer.evaluate(Xv, Yv, Mv))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt_dir", default="/tmp/rams_holdout_ckpt",
                    help="checkpoint dir of the --split patient retrain")
    ap.add_argument("--patches_per_slice", type=int, default=8,
                    help="must match the retrain invocation")
    ap.add_argument("--out", default=os.path.join(
        repo, "results", "round3_rams", "holdout_retrain.json"))
    args = ap.parse_args()

    import jax.numpy as jnp
    import numpy as np

    from train_misr import build_dataset, split_dataset

    from mri_super_resolution_tpu.data.preprocessing import bicubic
    from mri_super_resolution_tpu.ops.shift_metrics import shift_psnr

    X, Y, M, pids = build_dataset(
        hr_size=96, patches_per_slice=args.patches_per_slice, seed=0)
    (Xt, Yt, Mt), (Xv, Yv, Mv) = split_dataset(X, Y, M, pids,
                                               holdout_patients=1)
    print(f"held-out set: {len(Xv)} patches (patient idx "
          f"{np.unique(pids)[-1]}, never seen by the retrain)", flush=True)

    retrain_psnr = _eval_ckpt(os.path.abspath(args.ckpt_dir), Xv, Yv, Mv)
    artifact_psnr = _eval_ckpt(
        "/tmp/rams_holdout_retrain_nockpt", Xv, Yv, Mv,
        params_dir=os.path.join(repo, "artifacts", "rams_dwi_params"))

    scale = Yv.shape[1] // Xv.shape[1]
    bic = []
    for i in range(len(Xv)):
        lr_mean = Xv[i].mean(-1, keepdims=True)
        up = bicubic(lr_mean[None], scale=scale)[0]
        bic.append(float(shift_psnr(
            jnp.asarray(Yv[i:i + 1]), jnp.asarray(up[None], jnp.float32),
            jnp.asarray(Mv[i:i + 1]), Yv.shape[1],
        )))
    bicubic_psnr = float(np.mean(bic))

    out = {
        "holdout_patches": int(len(Xv)),
        "retrain_cpsnr_db": round(retrain_psnr, 4),
        "bicubic_cpsnr_db": round(bicubic_psnr, 4),
        "margin_db": round(retrain_psnr - bicubic_psnr, 4),
        "committed_artifact_on_same_patches_db": round(artifact_psnr, 4),
        "seen_patient_advantage_db": round(artifact_psnr - retrain_psnr, 4),
        "protocol": (
            "train_misr --epochs 40 --data_aug --patches_per_slice 8 "
            "--split patient --holdout_patients 1 (TPU, bf16 trainer); "
            "shift-tolerant cPSNR on the held-out patient's patches, same "
            "protocol for all three rows. The committed artifact trained ON "
            "this patient (sequential split), so seen_patient_advantage "
            "bounds what patient exposure is worth."
        ),
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    json.dump(out, open(args.out, "w"), indent=1)
    print(json.dumps({k: v for k, v in out.items() if k != "protocol"}),
          flush=True)
    print("wrote", args.out, flush=True)


if __name__ == "__main__":
    main()
