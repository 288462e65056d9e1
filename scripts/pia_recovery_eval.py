"""PIA vs NLLS: tissue-parameter recovery accuracy + amortized-inference speed.

The reference trains PIA (PIA.py:16-155) to replace the per-voxel scipy
``curve_fit`` loop (``hybrid_fit``, PIA.py:240-283) with one amortized
forward pass, but ships no committed evidence of either the recovery
accuracy or the speedup. This script produces both on the synthetic
3-compartment generator (PIA.py:171-213, the reference's own training
distribution):

1. Train PIA supervised (``pipelines/pia_train.train_synthetic``).
2. On a held-out synthetic test set, compare per-compartment D/T2/v MAE of
   (a) PIA encode, (b) NLLS ``hybrid_fit`` on the same noisy signals, and
   (c) NLLS on the noiseless signals (the identifiability floor).
3. Fenced throughput (voxels/s) of PIA inference vs NLLS at production
   voxel counts.

Writes results/round3_pia/recovery.json.
"""
import argparse
import json
import os
import sys

repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, repo)


def mae(a, b):
    import numpy as np

    return [float(x) for x in np.mean(np.abs(np.asarray(a) - np.asarray(b)), axis=0)]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--train_steps", type=int, default=4000)
    ap.add_argument("--batch_size", type=int, default=256)
    ap.add_argument("--noise_std", type=float, default=0.1,
                    help="training noise level (PIA.py:208 scale)")
    ap.add_argument("--noise_range", type=float, nargs=2, default=None,
                    metavar=("LO", "HI"),
                    help="train with per-voxel sigma log-uniform in [LO, HI] "
                    "instead of the fixed level (pia_train.train_synthetic)")
    ap.add_argument("--eval_noise", type=float, nargs="+",
                    default=[0.1, 0.03, 0.01],
                    help="test noise levels: the same trained encoder and the "
                    "same NLLS are scored at each, giving a noise-response "
                    "curve instead of one operating point")
    ap.add_argument("--n_test", type=int, default=4096)
    ap.add_argument("--n_speed", type=int, default=65536,
                    help="voxel count for the throughput comparison")
    ap.add_argument("--out", default="results/round3_pia/recovery.json")
    ap.add_argument("--cpu", action="store_true",
                    help="pin to CPU (the env ignores JAX_PLATFORMS=cpu; "
                    "the config API must be used — see tests/conftest.py)")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from mri_super_resolution_tpu.models.pia import PIA, signal_model, synthetic_batch
    from mri_super_resolution_tpu.ops.nlls import hybrid_fit
    from mri_super_resolution_tpu.pipelines.pia_train import (
        predict_maps, train_synthetic)
    from mri_super_resolution_tpu.utils.profiling import time_jitted

    model = PIA()
    key = jax.random.PRNGKey(0)
    print(f"training PIA: {args.train_steps} steps x {args.batch_size} "
          f"(noise_std={args.noise_std})", flush=True)
    res = train_synthetic(model, key, steps=args.train_steps,
                          batch_size=args.batch_size, noise_std=args.noise_std,
                          noise_range=tuple(args.noise_range)
                          if args.noise_range else None)
    losses = np.asarray(res.losses)
    print(f"loss: {losses[0]:.4g} -> {losses[-1]:.4g}", flush=True)

    out = {
        "protocol": {
            "train_steps": args.train_steps,
            "batch_size": args.batch_size,
            "train_noise_std": args.noise_std,
            "train_noise_range": args.noise_range,
            "eval_noise_std": args.eval_noise,
            "n_test": args.n_test,
            "compartments": ["epithelium", "stroma", "lumen"],
            "note": "MAE per compartment on held-out synthetic draws "
                    "(PIA.py:171-213 distribution) at each test noise level; "
                    "nlls_clean is the identifiability floor (noiseless "
                    "signals, shared across levels).",
        },
        "train_loss_first": float(losses[0]),
        "train_loss_last": float(losses[-1]),
        "by_noise": {},
    }

    def block(tag, eD, eT2, ev, D, T2, v):
        entry = {
            "D_mae_um2_per_ms": mae(eD, D),
            "T2_mae_ms": mae(eT2, T2),
            "v_mae": mae(ev, v),
        }
        print(tag, json.dumps(entry), flush=True)
        return entry

    # held-out test draws (fresh key, never seen in training); the CLEAN
    # signals are identical across noise levels (same parameter draw), so
    # the floor is computed once.
    _, D, T2, v, clean = synthetic_batch(
        jax.random.PRNGKey(10_007), args.n_test, 0.0)
    fD, fT2, fv = hybrid_fit(clean)
    out["nlls_clean_floor"] = block("flr  ", fD, fT2, fv, D, T2, v)

    for ns in args.eval_noise:
        print(f"-- test noise_std={ns}", flush=True)
        sig, D, T2, v, clean = synthetic_batch(
            jax.random.PRNGKey(10_007), args.n_test, ns)
        pD, pT2, pv = predict_maps(model, res.params, sig)
        nD, nT2, nv = hybrid_fit(sig)
        level = {
            "pia": block("pia  ", pD, pT2, pv, D, T2, v),
            "nlls": block("nlls ", nD, nT2, nv, D, T2, v),
        }
        # signal-domain residuals (how well each explains the clean signal)
        for tag, (eD, eT2, ev) in (("pia", (pD, pT2, pv)),
                                   ("nlls", (nD, nT2, nv))):
            rec = signal_model(jnp.asarray(eD), jnp.asarray(eT2),
                               jnp.asarray(ev))
            level[tag]["signal_rmse_vs_clean"] = float(
                jnp.sqrt(jnp.mean((rec - clean) ** 2)))
        out["by_noise"][str(ns)] = level

    # throughput at production voxel counts
    ksp = jax.random.PRNGKey(42)
    sig_sp, *_ = synthetic_batch(ksp, args.n_speed, args.noise_std)
    sig_sp = jax.device_put(sig_sp)

    enc = jax.jit(lambda x: model.apply(res.params, x, method=model.encode))
    t_pia = time_jitted(lambda: enc(sig_sp))
    # NLLS at a smaller count (it is iterative); normalize to voxels/s
    n_nlls = min(args.n_speed, 16384)
    sig_nl = sig_sp[:n_nlls]
    t_nlls = time_jitted(lambda: hybrid_fit(sig_nl))

    out["throughput"] = {
        "pia_voxels_per_s": float(args.n_speed / t_pia),
        "nlls_voxels_per_s": float(n_nlls / t_nlls),
        "speedup": float((args.n_speed / t_pia) / (n_nlls / t_nlls)),
        "pia_n": args.n_speed,
        "nlls_n": n_nlls,
        "platform": jax.devices()[0].platform,
        "note": "fenced timing (jax.device_get); NLLS is the vmapped "
                "projected-LM (ops/nlls.py), itself already one XLA program "
                "replacing the reference's scipy loop.",
    }
    print("throughput:", json.dumps(out["throughput"]), flush=True)

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", args.out, flush=True)


if __name__ == "__main__":
    main()
