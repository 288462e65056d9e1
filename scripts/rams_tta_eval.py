"""Quantify the RAMS+ test-time-ensemble gains on the committed artifact.

The reference ships BOTH test-time ensembles — the 8-fold flip/rot
geometric self-ensemble and the temporal-permutation ensemble
(multi-image-super-resolution/utils/prediction.py:31-97) — but never
reports their effect. This measures val cPSNR plain vs geometric-8x vs
temporal-permute-8x on the committed artifact's sequential-split val set
(the anchor protocol) and writes results/round4_rams/tta_eval.json.
"""
import json
import os
import sys
import time

repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, repo)
sys.path.insert(0, os.path.join(repo, "cli"))


def main():
    import numpy as np

    from train_misr import build_dataset

    from mri_super_resolution_tpu.config import RAMSConfig
    from mri_super_resolution_tpu.ops.shift_metrics import shift_psnr
    from mri_super_resolution_tpu.ops.tta import (
        geometric_ensemble_predict,
        predict_tensor,
        temporal_permute_predict,
    )
    from mri_super_resolution_tpu.pipelines.misr import build_rams
    from mri_super_resolution_tpu.utils.checkpoint import (
        restore_pytree,
        unwrap_trainer_params,
    )

    import jax
    import jax.numpy as jnp

    # the anchor protocol: patches_per_slice=8, sequential split, val = the
    # first 10% of the seed-0 dataset (artifacts/rams_dwi/anchor.json)
    X, Y, M, _ = build_dataset(seed=0, patches_per_slice=8)
    n_val = max(8, len(X) // 10)
    Xv, Yv, Mv = X[:n_val], Y[:n_val], M[:n_val]
    print(f"val: {len(Xv)} patches (sequential split, anchor protocol)",
          flush=True)

    model = build_rams(RAMSConfig())
    params = unwrap_trainer_params(
        restore_pytree(os.path.join(repo, "artifacts", "rams_dwi_params")))

    apply_fn = jax.jit(lambda x: model.apply(params, x))

    arms = {"plain": [], "tta_geo8": [], "tta_tperm8": []}
    t_arm = {k: 0.0 for k in arms}
    bs = 8
    key = jax.random.key(0)
    for i in range(0, len(Xv), bs):
        xb = jnp.asarray(Xv[i:i + bs])
        yb, mb = jnp.asarray(Yv[i:i + bs]), jnp.asarray(Mv[i:i + bs])
        key, sub = jax.random.split(key)
        t0 = time.perf_counter()
        preds = {"plain": np.asarray(predict_tensor(apply_fn, xb))}
        t1 = time.perf_counter()
        preds["tta_geo8"] = geometric_ensemble_predict(apply_fn, xb)
        t2 = time.perf_counter()
        preds["tta_tperm8"] = temporal_permute_predict(
            apply_fn, xb, sub, n_ens=8)
        t3 = time.perf_counter()
        if i > 0:  # first batch pays the compiles; keep it out of the clock
            t_arm["plain"] += t1 - t0
            t_arm["tta_geo8"] += t2 - t1
            t_arm["tta_tperm8"] += t3 - t2
        for arm, pred in preds.items():
            for j in range(xb.shape[0]):
                arms[arm].append(float(shift_psnr(
                    yb[j:j + 1], jnp.asarray(pred[j:j + 1], jnp.float32),
                    mb[j:j + 1], Yv.shape[1])))
        print(f"{i + xb.shape[0]}/{len(Xv)}: " + " ".join(
            f"{k} {np.mean(v):.3f}" for k, v in arms.items()), flush=True)

    plain = np.asarray(arms["plain"])
    out = {
        "val_patches": int(len(Xv)),
        "artifact_val_cpsnr": round(float(plain.mean()), 4),
        "note": "test-time ensembles on the committed artifact "
                "(artifacts/rams_dwi_params), anchor val protocol; "
                "per-patch shift-tolerant cPSNR; times are warm wall "
                "seconds over the val set minus the first (compile) batch",
    }
    for arm in ("tta_geo8", "tta_tperm8"):
        vals = np.asarray(arms[arm])
        out[arm] = {
            "cpsnr": round(float(vals.mean()), 4),
            "gain_db": round(float(vals.mean() - plain.mean()), 4),
            "wins_vs_plain": int(np.sum(vals > plain)),
            "wall_s": round(t_arm[arm], 2),
        }
    out["plain_wall_s"] = round(t_arm["plain"], 2)
    path = os.path.join(repo, "results", "round4_rams", "tta_eval.json")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    json.dump(out, open(path, "w"), indent=1)
    print(json.dumps(out), flush=True)
    print("wrote", path)


if __name__ == "__main__":
    main()
