"""Profile the RAMS train step on the real TPU and report an MFU/roofline
breakdown (VERDICT r2 #1: 'give RAMS the INR treatment').

Reference workload: multi-image-super-resolution/master.py:20-27 +
utils/training.py:193-209 — scale 3, filters 32, T=9, N=12 RFABs, batch 8 of
32x32 LR patches -> 96x96 HR, shift-tolerant L1.

Usage: python scripts/profile_rams.py [--steps 20] [--trace /tmp/rams_trace]
"""
import argparse
import collections
import glob
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def conv_flops_per_step(B=8, H=32, W=32, T=9, F=32, N=12, scale=3):
    """Analytic MXU FLOPs of one fwd pass at the reference config; backward
    of a conv costs ~2x forward (grad wrt input + grad wrt kernel)."""
    pos = B * H * W  # spatial positions per temporal slice

    def conv3d(t_out, cin, cout, k=3):
        return 2 * pos * t_out * (k * k * k) * cin * cout

    f = 0.0
    f += conv3d(T, 1, F)                 # feature extraction (SAME pad)
    for _ in range(N):                   # RFABs: two 3^3 convs (+tiny attn)
        f += 2 * conv3d(T, F, F)
    f += conv3d(T, F, F)                 # post-RFAB conv
    t = T
    for _ in range(T // 3):              # temporal reduction stages
        f += 2 * conv3d(t, F, F)         # RFAB
        t -= 2
        f += conv3d(t, F, F)             # valid conv
    f += conv3d(1, F, scale * scale)     # final conv to 9 ch
    # global 2-D path: RTAB (two 3x3 convs on T channels) + final conv
    f += 2 * (2 * pos * 9 * T * T) + 2 * pos * 9 * T * scale * scale
    return f


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--trace", default="/tmp/rams_trace")
    ap.add_argument("--no-trace", action="store_true")
    ap.add_argument("--dtype", default="float32")
    ap.add_argument("--layout", default="nhwtc")
    ap.add_argument("--conv_kernel", action="store_true",
                    help="route the 3x3x3 SAME convs through the Pallas "
                         "kernel (ops/pallas/conv3d_kernel)")
    args = ap.parse_args()

    from mri_super_resolution_tpu.config import RAMSConfig, TrainerConfig
    from mri_super_resolution_tpu.fit.trainer import Trainer
    from mri_super_resolution_tpu.pipelines.misr import build_rams

    cfg = TrainerConfig(batch_size=args.batch, hr_size=96,
                        checkpoint_dir="/tmp/prof_rams_ckpt",
                        log_dir="/tmp/prof_rams_logs")
    tr = Trainer(build_rams(RAMSConfig(compute_dtype=args.dtype,
                                       layout=args.layout,
                                       conv_kernel=args.conv_kernel)), cfg,
                 name="prof")
    rng = np.random.default_rng(0)
    B = args.batch
    x = jnp.asarray(rng.uniform(7000, 8000, (B, 32, 32, 9)).astype(np.float32))
    y = jnp.asarray(rng.uniform(7000, 8000, (B, 96, 96, 1)).astype(np.float32))
    m = jnp.ones_like(y)
    w = jnp.ones((B,), jnp.float32)  # full batch: unit sample weights
    st = tr.init(x)
    p, o = st.params, st.opt_state

    t0 = time.perf_counter()
    p, o, loss, _ = tr._train_step(p, o, x, y, m, w)
    jax.device_get(loss)
    print(f"compile+first step: {time.perf_counter()-t0:.1f}s", flush=True)

    for _ in range(3):
        p, o, loss, _ = tr._train_step(p, o, x, y, m, w)
    jax.device_get(loss)

    t0 = time.perf_counter()
    for _ in range(args.steps):
        p, o, loss, _ = tr._train_step(p, o, x, y, m, w)
    jax.device_get(loss)
    wall = (time.perf_counter() - t0) / args.steps
    fwd = conv_flops_per_step(B=B)
    total = 3 * fwd  # fwd + ~2x bwd
    print(f"wall: {wall*1e3:.2f} ms/step  ({B/wall:.0f} patches/s)")
    print(f"analytic conv FLOPs: fwd {fwd/1e9:.1f} G, train-step ~{total/1e9:.1f} G")
    # Roofline framing: RAMS's reference architecture fixes filters=32, so
    # every MXU pass uses 32 of 128 lanes (25%). The achievable ceiling for
    # THIS architecture on one v5e chip is therefore ~49 TF/s bf16, not the
    # 197 TF nameplate — and merging T into lanes doesn't help (the banded
    # kernel becomes 3x denser: the two wastes cancel exactly).
    lane_ceiling = 197e12 * 32 / 128
    print(f"achieved: {total/wall/1e12:.2f} TFLOP/s "
          f"({100*total/wall/197e12:.1f}% of 197T nameplate bf16, "
          f"{100*total/wall/lane_ceiling:.1f}% of the {lane_ceiling/1e12:.0f}T "
          f"filters=32 lane-constrained roofline)")

    if args.no_trace:
        return
    with jax.profiler.trace(args.trace):
        for _ in range(args.steps):
            p, o, loss, _ = tr._train_step(p, o, x, y, m, w)
        jax.device_get(loss)

    try:
        from tensorflow.tsl.profiler.protobuf import xplane_pb2
    except ImportError:
        print("xplane proto unavailable; trace left at", args.trace)
        return
    f = sorted(glob.glob(f"{args.trace}/plugins/profile/*/*.xplane.pb"))[-1]
    xs = xplane_pb2.XSpace()
    xs.ParseFromString(open(f, "rb").read())
    for plane in xs.planes:
        if "TPU" not in plane.name:
            continue
        emeta = plane.event_metadata
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            agg = collections.defaultdict(lambda: [0, 0.0])
            for ev in line.events:
                name = emeta[ev.metadata_id].name
                agg[name][0] += 1
                agg[name][1] += ev.duration_ps / 1e6
            rows = sorted(agg.items(), key=lambda kv: -kv[1][1])
            total_us = sum(v[1] for _, v in rows)
            print(f"\ndevice busy: {total_us:.0f} us total, "
                  f"{total_us/args.steps:.1f} us/step")
            for name, (n, us) in rows[:25]:
                print(f"  {us:9.0f} us  n={n:5d}  {name[:110]}")


if __name__ == "__main__":
    main()
