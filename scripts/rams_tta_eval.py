"""Quantify the RAMS+ geometric TTA gain on the committed artifact.

The reference ships the 8-fold flip/rot self-ensemble
(multi-image-super-resolution/utils/prediction.py:31-52) but never
reports its effect; this measures val cPSNR with and without it on the
committed artifact's sequential-split val set. Writes
results/round3_rams/tta_eval.json.
"""
import json
import os
import sys

repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, repo)
sys.path.insert(0, os.path.join(repo, "cli"))


def main():
    import numpy as np

    from train_misr import build_dataset

    from mri_super_resolution_tpu.config import RAMSConfig, TrainerConfig
    from mri_super_resolution_tpu.fit.trainer import Trainer
    from mri_super_resolution_tpu.ops.shift_metrics import shift_psnr
    from mri_super_resolution_tpu.ops.tta import geometric_ensemble_predict
    from mri_super_resolution_tpu.pipelines.misr import build_rams

    import jax.numpy as jnp

    X, Y, M, _ = build_dataset(seed=0)
    n_val = max(8, len(X) // 10)
    Xv, Yv, Mv = X[:n_val], Y[:n_val], M[:n_val]
    print(f"val: {len(Xv)} patches (sequential split, anchor protocol)",
          flush=True)

    model = build_rams(RAMSConfig())
    cfg = TrainerConfig(batch_size=8, hr_size=Yv.shape[1],
                        checkpoint_dir=os.path.join(repo, "artifacts", "rams_dwi"),
                        log_dir="/tmp/rams_tta_logs")
    trainer = Trainer(model, cfg)
    trainer.init(Xv, seed=0)  # restores the save-best checkpoint
    params = trainer.state.params

    def apply_fn(x):
        return model.apply(params, x)

    plain, tta = [], []
    bs = 8
    for i in range(0, len(Xv), bs):
        xb = jnp.asarray(Xv[i:i + bs])
        yb, mb = jnp.asarray(Yv[i:i + bs]), jnp.asarray(Mv[i:i + bs])
        base = np.asarray(jnp.round(jnp.clip(apply_fn(xb), 0, 2.0 ** 16)))
        ens = geometric_ensemble_predict(apply_fn, xb)
        for j in range(xb.shape[0]):
            plain.append(float(shift_psnr(
                yb[j:j + 1], jnp.asarray(base[j:j + 1], jnp.float32),
                mb[j:j + 1], Yv.shape[1])))
            tta.append(float(shift_psnr(
                yb[j:j + 1], jnp.asarray(ens[j:j + 1], jnp.float32),
                mb[j:j + 1], Yv.shape[1])))
        print(f"{i + xb.shape[0]}/{len(Xv)}: plain {np.mean(plain):.3f} "
              f"tta {np.mean(tta):.3f}", flush=True)

    out = {
        "val_patches": int(len(Xv)),
        "plain_cpsnr": round(float(np.mean(plain)), 4),
        "tta8_cpsnr": round(float(np.mean(tta)), 4),
        "tta_gain_db": round(float(np.mean(tta) - np.mean(plain)), 4),
        "wins": int(np.sum(np.asarray(tta) > np.asarray(plain))),
        "note": "geometric 8-fold flip/rot self-ensemble "
                "(ops/tta.geometric_ensemble_predict) on the committed "
                "artifact's sequential-split val set; per-patch cPSNR",
    }
    path = os.path.join(repo, "results", "round3_rams", "tta_eval.json")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    json.dump(out, open(path, "w"), indent=1)
    print(json.dumps(out), flush=True)
    print("wrote", path)


if __name__ == "__main__":
    main()
