#!/usr/bin/env python
"""RAMS trainer batch sweep + step attribution (VERDICT r3 Next #3).

Measures warm train-step throughput (patches/sec) at batch {8, 16, 32, 64}
on the real TPU, with the lane-constrained roofline context per batch, and
separates the conv work from the non-conv tail by also timing a
forward+backward-only step (no optimizer/metric) at each batch.

Writes results/round4_rams/batch_sweep.json.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from scripts.profile_rams import conv_flops_per_step


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--batches", type=int, nargs="*", default=[8, 16, 32, 64])
    ap.add_argument("--out", default="results/round4_rams/batch_sweep.json")
    args = ap.parse_args()

    from mri_super_resolution_tpu.config import RAMSConfig, TrainerConfig
    from mri_super_resolution_tpu.fit.trainer import Trainer
    from mri_super_resolution_tpu.pipelines.misr import build_rams

    # lane-constrained ceiling: filters=32 caps MXU lane occupancy at 25%
    # -> ~49.25 TF/s bf16 on v5e (scripts/profile_rams.py rationale)
    CEIL_TFS = 49.25

    rng = np.random.default_rng(0)
    out_rows = []
    for B in args.batches:
        cfg = TrainerConfig(batch_size=B, hr_size=96,
                            checkpoint_dir="/tmp/sweep_ckpt",
                            log_dir="/tmp/sweep_logs")
        tr = Trainer(build_rams(RAMSConfig()), cfg, name=f"sweep{B}")
        x = jnp.asarray(rng.uniform(7000, 8000, (B, 32, 32, 9)).astype(np.float32))
        y = jnp.asarray(rng.uniform(7000, 8000, (B, 96, 96, 1)).astype(np.float32))
        m = jnp.ones_like(y)
        w = jnp.ones((B,), jnp.float32)
        st = tr.init(x)
        p, o = st.params, st.opt_state

        for _ in range(3):
            p, o, loss, _ = tr._train_step(p, o, x, y, m, w)
        jax.device_get(loss)
        t0 = time.perf_counter()
        for _ in range(args.steps):
            p, o, loss, _ = tr._train_step(p, o, x, y, m, w)
        jax.device_get(loss)
        dt = (time.perf_counter() - t0) / args.steps

        # fwd+bwd only (no Adam, no metric): isolates the optimizer+metric
        # share of the tail at this batch
        def fb(params):
            def loss_of(q):
                sr = tr.model.apply(q, x)
                per = tr.loss_fn(y, sr, m, 96)
                return jnp.sum(per * w) / jnp.sum(w)

            l, g = jax.value_and_grad(loss_of)(params)
            return l, g

        fb_j = jax.jit(fb)
        l, g = fb_j(p)
        jax.device_get(l)
        t0 = time.perf_counter()
        for _ in range(args.steps):
            l, g = fb_j(p)
        jax.device_get(l)
        dt_fb = (time.perf_counter() - t0) / args.steps

        # conv_flops_per_step is the FORWARD pass; backward ~2x forward
        # (grad wrt input + grad wrt kernel) -> train step ~3x
        flops = 3 * conv_flops_per_step(B=B)
        tf = flops / dt / 1e12
        row = {
            "batch": B,
            "ms_per_step": round(dt * 1e3, 2),
            "patches_per_sec": round(B / dt, 1),
            "ms_fwd_bwd_only": round(dt_fb * 1e3, 2),
            "ms_opt_metric_tail": round((dt - dt_fb) * 1e3, 2),
            "achieved_tflops": round(tf, 2),
            "pct_lane_constrained_roofline": round(100 * tf / CEIL_TFS, 1),
        }
        out_rows.append(row)
        print(json.dumps(row))

    best = max(out_rows, key=lambda r: r["patches_per_sec"])
    out = {
        "platform": jax.devices()[0].platform,
        "device": str(jax.devices()[0]),
        "config": "RAMS reference (scale 3, F=32, T=9, N=12), 32x32->96x96,"
                  " bf16 compute, shift-tolerant L1, donated step buffers",
        "steps_per_point": args.steps,
        "rows": out_rows,
        "best_batch": best["batch"],
        "best_patches_per_sec": best["patches_per_sec"],
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
