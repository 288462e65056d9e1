"""Profile the flagship FF-SIREN fused train step on the real TPU and break
device time into kernel vs optimizer vs overhead (VERDICT r2 #5 follow-up).

Workload = bench.py's flagship: FF-SIREN 256->512x3, 70k coords full-batch,
one-pass fused Pallas loss+grad kernel + Adam, scanned.

Usage: python scripts/profile_flagship.py [--steps 50] [--trace /tmp/fs_trace]
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
import optax


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--trace", default="/tmp/fs_trace")
    ap.add_argument("--no-trace", action="store_true")
    args = ap.parse_args()

    from mri_super_resolution_tpu.core.coords import (
        fourier_matrix, fourier_encode, mgrid)
    from mri_super_resolution_tpu.fit.engine import fit_simple
    from mri_super_resolution_tpu.models import Siren
    from mri_super_resolution_tpu.ops.pallas.siren_kernel import (
        make_fused_value_and_grad, pad_rows_to)

    SHAPE = (25, 25, 28, 4)
    key = jax.random.key(0)
    B = fourier_matrix(key, 128, len(SHAPE), scale=0.5)
    coords = mgrid(SHAPE)
    ff = fourier_encode(coords, B)
    target = jax.random.uniform(key, (coords.shape[0], 1))
    model = Siren(hidden_features=512, hidden_layers=3)
    params = model.init(key, ff[:8])
    tx = optax.adam(1e-4)
    n_real = coords.shape[0]
    vag = make_fused_value_and_grad(model, n_rows=n_real)
    ffp, tp = pad_rows_to(ff, 512), pad_rows_to(target, 512)

    def run():
        res = fit_simple(model.apply, tx, jax.tree.map(jnp.copy, params),
                         ffp, tp, args.steps, value_and_grad_fn=vag)
        return res.losses

    t0 = time.perf_counter()
    jax.device_get(run())
    print(f"compile+first run: {time.perf_counter()-t0:.1f}s", flush=True)

    t0 = time.perf_counter()
    jax.device_get(run())
    wall = (time.perf_counter() - t0) / args.steps
    print(f"wall: {wall*1e3:.3f} ms/step "
          f"({n_real/wall/1e6:.2f}M voxels/s)", flush=True)

    if args.no_trace:
        return
    with jax.profiler.trace(args.trace):
        jax.device_get(run())

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
            for name, (n, us) in rows[:20]:
                print(f"  {us:9.0f} us  n={n:5d}  {name[:110]}")


if __name__ == "__main__":
    main()
