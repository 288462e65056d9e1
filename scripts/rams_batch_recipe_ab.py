#!/usr/bin/env python
"""RAMS batch-size training-recipe A/B (round-4 follow-up to the sweep).

The batch sweep (results/round4_rams/batch_sweep_hi.json) shows B=96 is the
v5e throughput optimum (878.8 patches/s = 85.7% of the lane-constrained
roofline vs ~400 at the reference B=8) — but that is a throughput claim,
not a training-recipe claim: larger batches change optimization dynamics.
This script settles it: from-scratch training at an EQUAL SAMPLE BUDGET,

  - B=8,  lr=1e-4          (the reference recipe, utils/training.py:108-120)
  - B=96, lr=1e-4          (same lr, big batch)
  - B=96, lr=3.5e-4        (sqrt-scaled lr, the standard large-batch rule)

recording val cPSNR vs consumed samples AND vs step wall-clock (compile
excluded: one discarded _train_step call pays each program's compile; eval
time is excluded from the clock). Writes results/round4_rams/recipe_ab.json.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sample_budget", type=int, default=115200,
                    help="total training samples per arm (default: 1200 "
                         "B=96 steps == 14400 B=8 steps)")
    ap.add_argument("--eval_every_samples", type=int, default=9600)
    ap.add_argument("--patches_per_slice", type=int, default=8)
    ap.add_argument("--out", default="results/round4_rams/recipe_ab.json")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, os.path.join(repo, "cli"))
    from train_misr import build_dataset

    from mri_super_resolution_tpu.config import RAMSConfig, TrainerConfig
    from mri_super_resolution_tpu.fit.trainer import Trainer
    from mri_super_resolution_tpu.pipelines.misr import build_rams

    X, Y, M, _ = build_dataset(seed=0, patches_per_slice=args.patches_per_slice)
    n_val = max(8, len(X) // 10)
    Xv, Yv, Mv = X[:n_val], Y[:n_val], M[:n_val]
    Xt, Yt, Mt = X[n_val:], Y[n_val:], M[n_val:]
    print(f"train {len(Xt)} / val {len(Xv)} patches", flush=True)

    arms = [
        ("b8_lr1e-4", 8, 1e-4),
        ("b96_lr1e-4", 96, 1e-4),
        ("b96_lr3.5e-4", 96, 3.5e-4),
    ]
    out = {"platform": jax.devices()[0].platform,
           "device": str(jax.devices()[0]),
           "sample_budget": args.sample_budget,
           "train_patches": int(len(Xt)), "val_patches": int(len(Xv)),
           "data_aug": False, "arms": {}}

    for name, B, lr in arms:
        cfg = TrainerConfig(batch_size=B, hr_size=Yv.shape[1],
                            learning_rate=lr, data_aug=False,
                            checkpoint_dir=f"/tmp/recipe_ab_{name}",
                            log_dir=f"/tmp/recipe_ab_{name}_logs")
        tr = Trainer(build_rams(RAMSConfig()), cfg, name=name)
        st = tr.init(Xt[:B], seed=0)
        params, opt_state = st.params, st.opt_state

        # pay the train/eval program compiles outside the clock: one
        # discarded functional step + one eval. _train_step DONATES its
        # params/opt_state buffers, so the warm-up runs on copies — the
        # live state (still referenced by tr.state / evaluate) survives.
        xb = jnp.asarray(Xt[:B]); yb = jnp.asarray(Yt[:B])
        mb = jnp.asarray(Mt[:B]); wb = jnp.ones((B,), jnp.float32)
        _ = tr._train_step(jax.tree.map(jnp.copy, params),
                           jax.tree.map(jnp.copy, opt_state), xb, yb, mb, wb)
        jax.device_get(_[2])
        _ = tr.evaluate(Xv, Yv, Mv)

        from mri_super_resolution_tpu.fit.trainer import TrainState

        rng = np.random.default_rng(0)
        consumed = 0
        next_eval = 0
        clock = 0.0
        curve = []
        order = rng.permutation(len(Xt))
        pos = 0
        while consumed < args.sample_budget:
            if consumed >= next_eval:
                # eval off the clock
                tr.state = TrainState(params, opt_state, tr.state.step)
                psnr = float(tr.evaluate(Xv, Yv, Mv))
                curve.append({"samples": consumed,
                              "wall_s": round(clock, 2),
                              "val_cpsnr": round(psnr, 4)})
                print(json.dumps(curve[-1] | {"arm": name}), flush=True)
                next_eval += args.eval_every_samples
            # run the chunk to the next eval/budget boundary with ONE fence
            # at the end — per-step device_get would charge the ~45 ms
            # tunnel dispatch latency to every step (the round-4 PIA
            # roofline lesson), 3x-poisoning the small-batch arm
            chunk_samples = min(next_eval, args.sample_budget) - consumed
            n_steps = max(1, chunk_samples // B)
            t0 = time.perf_counter()
            for _step in range(n_steps):
                if pos + B > len(Xt):
                    order = rng.permutation(len(Xt))
                    pos = 0
                idx = order[pos : pos + B]
                pos += B
                xb = jnp.asarray(Xt[idx]); yb = jnp.asarray(Yt[idx])
                mb = jnp.asarray(Mt[idx])
                params, opt_state, loss, _sr = tr._train_step(
                    params, opt_state, xb, yb, mb, wb)
            jax.device_get(loss)
            clock += time.perf_counter() - t0
            consumed += n_steps * B
        tr.state = TrainState(params, opt_state, tr.state.step)
        psnr = float(tr.evaluate(Xv, Yv, Mv))
        curve.append({"samples": consumed, "wall_s": round(clock, 2),
                      "val_cpsnr": round(psnr, 4)})
        print(json.dumps(curve[-1] | {"arm": name}), flush=True)

        # time-to-threshold summaries (linear interp on the wall clock)
        def time_to(th):
            prev = None
            for pt in curve:
                if pt["val_cpsnr"] >= th:
                    if prev is None or prev["val_cpsnr"] >= th:
                        return pt["wall_s"]
                    f = (th - prev["val_cpsnr"]) / (pt["val_cpsnr"] - prev["val_cpsnr"])
                    return round(prev["wall_s"] + f * (pt["wall_s"] - prev["wall_s"]), 2)
                prev = pt
            return None

        out["arms"][name] = {
            "batch": B, "lr": lr, "curve": curve,
            "final_val_cpsnr": curve[-1]["val_cpsnr"],
            "train_wall_s": curve[-1]["wall_s"],
            "time_to_dB": {str(th): time_to(th) for th in (24, 25, 26, 27)},
        }

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
