#!/usr/bin/env python
"""PIA roofline profile (VERDICT r3 Next #4).

States the analytic FLOPs/voxel of the PIA encoder, then measures:
  (a) the round-3 protocol — ONE jitted encode call per timing sample —
      which on the tunnelled TPU backend is dominated by the ~45 ms fixed
      dispatch latency, not compute;
  (b) dispatch-amortized throughput — `steps` encode applications chained
      inside ONE jitted lax.scan (the serving/pipeline steady state, where
      many slices stream through without host round-trips);
  (c) the training step (encode + analytic decode + loss + Adam).

Writes results/round4_pia/roofline.json with %-of-roofline context.
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


def encoder_flops_per_voxel(model) -> float:
    """Forward MACs*2 through encoder + three heads."""
    dims = [model.number_of_signals] + list(model.hidden_dims)
    macs = sum(a * b for a, b in zip(dims[:-1], dims[1:]))
    H = model.hidden_dims[-1]
    macs += 3 * (model.predictor_depth * H * H + H * 3)
    return 2.0 * macs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--voxels", type=int, nargs="*",
                    default=[16384, 65536, 262144])
    ap.add_argument("--out", default="results/round4_pia/roofline.json")
    args = ap.parse_args()

    from mri_super_resolution_tpu.models.pia import (
        PIA, pia_loss_unsupervised, synthetic_batch)
    from mri_super_resolution_tpu.utils import time_jitted

    model = PIA()
    fpv = encoder_flops_per_voxel(model)
    # v5e peaks: ~197 TF/s bf16 / ~49 TF/s 3-pass f32. The encoder's Dense
    # layers run at XLA DEFAULT matmul precision — f32 inputs execute as
    # bf16 multiplies with f32 accumulation on the MXU — so the bf16 peak
    # is the relevant ceiling (the first run's 115 TF/s measurement
    # exceeded the f32 ceiling, which is how the wrong label was caught).
    # 82% of the FLOPs are the three 512x512 head matmuls (tile cleanly);
    # the entry layers are small-K.
    CEIL_TFS = 197.0

    key = jax.random.key(0)
    rows = {"flops_per_voxel": fpv, "batches": []}
    for n in args.voxels:
        sig, *_ = synthetic_batch(jax.random.key(1), n, 0.05)
        params = model.init(key, sig[:8])
        sig = jax.device_put(sig)

        # (a) single-call protocol (round-3 bench line)
        enc = jax.jit(lambda x: model.apply(params, x, method=model.encode))
        sec_single = time_jitted(lambda: enc(sig), repeats=3, warmup=1)

        # (b) dispatch/transfer-amortized: `steps` encodes inside one
        # program. The carry feeds back into the INPUT (x + c*1e-9) so the
        # encode is genuinely loop-carried — a carry that only consumed the
        # outputs let XLA hoist the loop-invariant encode out of the scan
        # entirely (first run measured an impossible 855% of roofline), and
        # the scalar output avoids the other failure mode: a single eval's
        # wall-clock here is dominated by fetching the (n, 3) maps through
        # the ~12 MB/s tunnel, not by compute.
        @jax.jit
        def enc_scan(x):
            def body(c, _):
                D, T2, v = model.apply(params, x + c * 1e-9,
                                       method=model.encode)
                return (D.sum() + T2.sum() + v.sum()) * 1e-9, None

            out, _ = jax.lax.scan(body, 0.0, None, length=args.steps)
            return out

        sec_scan = time_jitted(lambda: enc_scan(sig), repeats=3, warmup=1)
        per_call = sec_scan / args.steps
        tf = fpv * n / per_call / 1e12
        rows["batches"].append({
            "n_voxels": n,
            # single call = compute + fetching 3x(n,3) maps to the host;
            # through the tunnelled backend the fetch dominates
            "single_call_ms": round(sec_single * 1e3, 3),
            "single_call_voxels_per_sec": round(n / sec_single),
            "amortized_ms_per_call": round(per_call * 1e3, 3),
            "amortized_voxels_per_sec": round(n / per_call),
            "achieved_tflops": round(tf, 2),
            "pct_bf16_mxu_peak": round(100 * tf / CEIL_TFS, 1),
            "dispatch_overhead_ms": round((sec_single - per_call) * 1e3, 3),
        })
        print(json.dumps(rows["batches"][-1]))

    # (c) training step (the pia_train loop's inner jit)
    import optax

    n = 16384
    sig, *_ = synthetic_batch(jax.random.key(2), n, 0.05)
    params = model.init(key, sig[:8])
    tx = optax.adam(1e-4)
    opt = tx.init(params)
    pids = jnp.ones_like(sig)

    @jax.jit
    def train_steps(params, opt):
        def body(carry, _):
            p, o = carry

            def loss_fn(q):
                pred, _, D, T2, v = model.apply(q, sig)
                return pia_loss_unsupervised(pred, sig, pids)

            l, g = jax.value_and_grad(loss_fn)(p)
            up, o = tx.update(g, o)
            return (optax.apply_updates(p, up), o), l

        (p, o), ls = jax.lax.scan(body, (params, opt), None,
                                  length=args.steps)
        return p, o, ls

    p, o, ls = train_steps(params, opt)
    jax.device_get(ls)
    t0 = time.perf_counter()
    p, o, ls = train_steps(params, opt)
    jax.device_get(ls)
    per_step = (time.perf_counter() - t0) / args.steps
    rows["train_step"] = {
        "n_voxels": n,
        "ms_per_step": round(per_step * 1e3, 3),
        "voxels_per_sec": round(n / per_step),
    }
    rows["platform"] = jax.devices()[0].platform
    rows["device"] = str(jax.devices()[0])
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(rows, f, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
