#!/usr/bin/env python
"""RAMS weight-EMA A/B at an equal sample budget (round-4 follow-up).

The reference trainer serves the raw optimizer weights
(multi-image-super-resolution/utils/training.py:183-187). The TPU trainer
gained cfg.ema_decay (fit/trainer.py): ema = d*ema + (1-d)*params each step,
with validation / best-checkpoint gating / serving on the averaged weights —
a standard SR-literature quality lever the reference never tried. This
script measures whether it actually helps on this workload: from-scratch
training with the validated large-batch recipe (B=96, lr 3.5e-4,
cosine-decayed over the budget; results/round4_rams/recipe_ab.json), arms

  - ema0      d=0      (recipe baseline, raw weights)
  - ema0.99   d=0.99   (~100-step averaging horizon)
  - ema0.999  d=0.999  (~1000-step horizon = most of the budget)

recording the val-cPSNR curve of BOTH the raw and the averaged weights for
the EMA arms. Writes results/round4_rams/ema_ab.json.
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
                    help="total training samples per arm (1200 B=96 steps)")
    ap.add_argument("--eval_every_samples", type=int, default=9600)
    ap.add_argument("--batch", type=int, default=96)
    ap.add_argument("--lr", type=float, default=3.5e-4)
    ap.add_argument("--patches_per_slice", type=int, default=8)
    ap.add_argument("--out", default="results/round4_rams/ema_ab.json")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, os.path.join(repo, "cli"))
    from train_misr import build_dataset

    from mri_super_resolution_tpu.config import RAMSConfig, TrainerConfig
    from mri_super_resolution_tpu.fit.trainer import Trainer, TrainState
    from mri_super_resolution_tpu.pipelines.misr import build_rams

    X, Y, M, _ = build_dataset(seed=0, patches_per_slice=args.patches_per_slice)
    n_val = max(8, len(X) // 10)
    Xv, Yv, Mv = X[:n_val], Y[:n_val], M[:n_val]
    Xt, Yt, Mt = X[n_val:], Y[n_val:], M[n_val:]
    print(f"train {len(Xt)} / val {len(Xv)} patches", flush=True)

    B = args.batch
    total_steps = args.sample_budget // B
    arms = [("ema0", 0.0), ("ema0.99", 0.99), ("ema0.999", 0.999)]
    out = {"platform": jax.devices()[0].platform,
           "device": str(jax.devices()[0]),
           "sample_budget": args.sample_budget,
           "batch": B, "lr": args.lr,
           "lr_schedule": f"cosine over {total_steps} steps",
           "train_patches": int(len(Xt)), "val_patches": int(len(Xv)),
           "data_aug": False, "arms": {}}

    for name, d in arms:
        cfg = TrainerConfig(batch_size=B, hr_size=Yv.shape[1],
                            learning_rate=args.lr, data_aug=False,
                            lr_schedule="cosine", decay_steps=total_steps,
                            ema_decay=d,
                            checkpoint_dir=f"/tmp/ema_ab_{name}",
                            log_dir=f"/tmp/ema_ab_{name}_logs")
        tr = Trainer(build_rams(RAMSConfig()), cfg, name=name)
        st = tr.init(Xt[:B], seed=0)
        params, opt_state, ema = st.params, st.opt_state, st.ema_params

        # pay the train/eval compiles off the clock (donated buffers: run
        # the warm-up on copies so the live state survives)
        xb = jnp.asarray(Xt[:B]); yb = jnp.asarray(Yt[:B])
        mb = jnp.asarray(Mt[:B]); wb = jnp.ones((B,), jnp.float32)
        cp = lambda t: jax.tree.map(jnp.copy, t)
        if d:
            _ = tr._train_step(cp(params), cp(opt_state), cp(ema),
                               xb, yb, mb, wb)
        else:
            _ = tr._train_step(cp(params), cp(opt_state), xb, yb, mb, wb)
        jax.device_get(_[-2])
        tr.state = TrainState(params, opt_state, 0, ema)
        _ = tr.evaluate(Xv, Yv, Mv, params=params)

        rng = np.random.default_rng(0)
        consumed, next_eval, clock = 0, 0, 0.0
        curve = []
        order = rng.permutation(len(Xt)); pos = 0

        def eval_point():
            tr.state = TrainState(params, opt_state, tr.state.step, ema)
            pt = {"samples": consumed, "wall_s": round(clock, 2),
                  "val_cpsnr_raw": round(
                      float(tr.evaluate(Xv, Yv, Mv, params=params)), 4)}
            if d:
                pt["val_cpsnr_ema"] = round(
                    float(tr.evaluate(Xv, Yv, Mv, params=ema)), 4)
            curve.append(pt)
            print(json.dumps(pt | {"arm": name}), flush=True)

        while consumed < args.sample_budget:
            if consumed >= next_eval:
                eval_point()
                next_eval += args.eval_every_samples
            chunk = min(next_eval, args.sample_budget) - consumed
            n_steps = max(1, chunk // B)
            t0 = time.perf_counter()
            for _step in range(n_steps):
                if pos + B > len(Xt):
                    order = rng.permutation(len(Xt)); pos = 0
                idx = order[pos: pos + B]; pos += B
                xb = jnp.asarray(Xt[idx]); yb = jnp.asarray(Yt[idx])
                mb = jnp.asarray(Mt[idx])
                if d:
                    params, opt_state, ema, loss, _sr = tr._train_step(
                        params, opt_state, ema, xb, yb, mb, wb)
                else:
                    params, opt_state, loss, _sr = tr._train_step(
                        params, opt_state, xb, yb, mb, wb)
            jax.device_get(loss)
            clock += time.perf_counter() - t0
            consumed += n_steps * B
        eval_point()

        arm = {"ema_decay": d, "curve": curve,
               "final_val_cpsnr_raw": curve[-1]["val_cpsnr_raw"],
               "train_wall_s": curve[-1]["wall_s"]}
        if d:
            arm["final_val_cpsnr_ema"] = curve[-1]["val_cpsnr_ema"]
            arm["final_ema_gain_db"] = round(
                curve[-1]["val_cpsnr_ema"] - curve[-1]["val_cpsnr_raw"], 4)
        out["arms"][name] = arm

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
