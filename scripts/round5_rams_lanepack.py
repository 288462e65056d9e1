#!/usr/bin/env python
"""Attack the RAMS lane constraint (VERDICT r4 Next #3).

Round 4 measured the B=96 RAMS step at 85.7% of a LANE-CONSTRAINED
roofline: filters=32 means the conv output-feature dimension fills 32 of
the MXU's 128 lanes (25% occupancy), capping the chip at ~42 of 197 bf16
TF/s. This script measures whether any reformulation of the hot op — the
3x3x3 SAME WN-conv at (B=96, 32, 32, T=9, C=32), reference
utils/network.py:91-155 — can beat that ceiling on real hardware:

  conv3d    the production formulation (lax.conv_general_dilated, NHWTC)
  concat2d  fold T into batch with a +/-1 halo concat: out[t] =
            conv2d([x[t-1]; x[t]; x[t+1]], K) — identical useful FLOPs,
            2-D conv shape (3, 3, 96, 32); tests whether the T spatial dim
            itself (not lanes) costs anything
  banded288 fold T into CHANNELS: one dense 2-D conv (3, 3, 288, 288)
            whose kernel is zero outside the T band. Fills the lane
            dimension (288 -> 3 x 128-lane tiles at 75% occupancy) but
            pays 3x the FLOPs for the dense band — net useful-FLOP
            utilisation is 0.75 * (1/3) = 25%, i.e. the SAME as the
            current 25% lane occupancy. Predicted a wash or worse;
            measured here so the ceiling claim rests on data, not argument.
  cN        lane-efficiency controls: the same conv3d at C=64 / C=128
            (NOT the RAMS workload — they chart TF/s vs lane occupancy and
            empirically pin the 25%-occupancy penalty the roofline assumes)

All arms run in bf16 (the production compute dtype) with parity checks
(f32 reference) and jax.device_get fencing. Writes
results/round5_rams/lanepack.json.
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
    ap.add_argument("--batch", type=int, default=96)
    ap.add_argument("--side", type=int, default=32)
    ap.add_argument("--T", type=int, default=9)
    ap.add_argument("--C", type=int, default=32)
    ap.add_argument("--repeats", type=int, default=10)
    ap.add_argument("--iters", type=int, default=20,
                    help="chained conv applications per jitted call "
                    "(dispatch-latency amortization)")
    ap.add_argument("--out", default="results/round5_rams/lanepack.json")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from mri_super_resolution_tpu.utils.profiling import time_jitted

    B, S, T, C = args.batch, args.side, args.T, args.C
    rng = np.random.default_rng(0)
    x_np = rng.normal(0, 1, (B, S, S, T, C)).astype(np.float32)
    k_np = (rng.normal(0, 0.05, (3, 3, 3, C, C)).astype(np.float32))

    x = jnp.asarray(x_np, jnp.bfloat16)
    k3 = jnp.asarray(k_np, jnp.bfloat16)

    # useful FLOPs of ONE 3x3x3 SAME conv at this shape (MACs * 2)
    useful_flops = 2 * B * S * S * T * (3 * 3 * 3 * C) * C

    dn3 = jax.lax.conv_dimension_numbers(
        x.shape, k3.shape, ("NHWDC", "HWDIO", "NHWDC"))

    def conv3d(xx, kk):
        return jax.lax.conv_general_dilated(
            xx, kk, (1, 1, 1), "SAME", dimension_numbers=dn3)

    # --- concat2d: halo along T folded into channels, T folded into batch
    def concat2d(xx, kk):
        # xx (b,s,s,t,c) -> pad T by 1 (zeros = SAME semantics on T)
        b, s1, s2, t, c = xx.shape
        xp = jnp.pad(xx, ((0, 0), (0, 0), (0, 0), (1, 1), (0, 0)))
        cat = jnp.concatenate(
            [xp[:, :, :, dt:dt + t, :] for dt in range(3)], axis=-1
        )  # (b,s,s,t,3c)
        cat = cat.transpose(0, 3, 1, 2, 4).reshape(b * t, s1, s2, 3 * c)
        # kernel (3,3,3,C,C): kk[ky,kx,kt,ci,co] -> 2-D (3,3,3C,co):
        # input channel block dt must multiply x[t-1+dt] => block dt maps
        # kernel tap kt=dt
        k2 = kk.transpose(0, 1, 2, 3, 4).reshape(3, 3, 3 * c, c)
        dn2 = jax.lax.conv_dimension_numbers(
            cat.shape, k2.shape, ("NHWC", "HWIO", "NHWC"))
        out = jax.lax.conv_general_dilated(
            cat, k2, (1, 1), "SAME", dimension_numbers=dn2)
        return out.reshape(b, t, s1, s2, c).transpose(0, 2, 3, 1, 4)

    # --- banded288: T folded into channels on BOTH sides, dense band kernel
    TC = T * C

    def make_banded_kernel(kk):
        kb = jnp.zeros((3, 3, TC, TC), kk.dtype)
        for t_out in range(T):
            for dt in (-1, 0, 1):
                t_in = t_out + dt
                if not 0 <= t_in < T:
                    continue
                kb = kb.at[:, :, t_in * C:(t_in + 1) * C,
                           t_out * C:(t_out + 1) * C].set(kk[:, :, dt + 1])
        return kb

    kb = make_banded_kernel(k3)

    def banded288(xx, kkb):
        b, s1, s2, t, c = xx.shape
        x2 = xx.reshape(b, s1, s2, t * c)
        dn2 = jax.lax.conv_dimension_numbers(
            x2.shape, kkb.shape, ("NHWC", "HWIO", "NHWC"))
        out = jax.lax.conv_general_dilated(
            x2, kkb, (1, 1), "SAME", dimension_numbers=dn2)
        return out.reshape(b, s1, s2, t, c)

    # Per-arm parity (f32, small slice) against the production conv3d
    # formulation (whose own parity tests live in test_rams.py). The first
    # run of this script found jitted concat2d off by 0.83 rel at
    # (4,32,32,9,32) on the TPU, while the identical program gives 0.0 error
    # on the true-CPU XLA backend (jax.config jax_platforms=cpu) and 1e-7 at
    # smaller shapes — i.e. a TPU-lowering defect for that conv pattern, not
    # a formulation bug. An arm that fails parity here is EXCLUDED from the
    # bench with the error recorded, instead of crashing the experiment.
    xf = jnp.asarray(x_np[:4], jnp.float32)
    kf = jnp.asarray(k_np, jnp.float32)
    ref = np.asarray(jax.jit(conv3d)(xf, kf))
    scale = np.abs(ref).max()
    parity = {}

    def check_parity(name, fn, *pa):
        got = np.asarray(jax.jit(fn)(*pa))
        err = float(np.abs(got - ref).max() / scale)
        parity[name] = err
        ok = err < 1e-5
        print(f"parity {name}: {err:.2e}{'' if ok else '  EXCLUDED'}",
              flush=True)
        return ok

    results = {}

    def bench(name, fn, x0, karg, flops=useful_flops, note=""):
        # Two defenses against the tunnelled backend's overhead (the round-4
        # PIA lesson, results/round4_pia/roofline.json): (1) the scan
        # returns a SCALAR — returning the (B,S,S,T,C) activation makes
        # jax.device_get drag ~56 MB through the ~12 MB/s tunnel, which is
        # what this script's first committed-less run actually measured;
        # (2) per-iter time is the SLOPE between two iteration counts
        # (N2-N1 extra convs), which cancels the constant per-call HTTP
        # round-trip exactly instead of hoping N amortizes it.
        N1, N2 = args.iters, 5 * args.iters

        def many(n):
            @jax.jit
            def run(x0_, k_):
                def body(c, _):
                    return fn(c, k_), None
                out, _ = jax.lax.scan(body, x0_, None, length=n)
                return jnp.float32(out).sum() * 1e-9
            return run

        m1, m2 = many(N1), many(N2)
        t1 = time_jitted(lambda: m1(x0, karg), repeats=args.repeats,
                         warmup=2)
        t2 = time_jitted(lambda: m2(x0, karg), repeats=args.repeats,
                         warmup=2)
        sec = (t2 - t1) / (N2 - N1)
        tf = flops / sec / 1e12
        results[name] = {"ms": round(sec * 1e3, 3),
                         "useful_tf_per_s": round(tf, 2),
                         "slope_iters": [N1, N2],
                         "call_ms": [round(t1 * 1e3, 1), round(t2 * 1e3, 1)]}
        if note:
            results[name]["note"] = note
        print(f"{name}: {sec * 1e3:.3f} ms = {tf:.2f} useful TF/s {note}",
              flush=True)

    bench("conv3d_c32", conv3d, x, k3)
    if check_parity("concat2d", concat2d, xf, kf):
        bench("concat2d_c32", concat2d, x, k3)
    if check_parity("banded288", banded288, xf, make_banded_kernel(kf)):
        bench("banded288", banded288, x, kb,
              note="dense band: 3x the raw FLOPs of the useful number shown")

    # lane-efficiency controls: same spatial extent, C = 64 / 128
    for Cc in (64, 128):
        xc = jnp.asarray(rng.normal(0, 1, (B, S, S, T, Cc)), jnp.bfloat16)
        kc = jnp.asarray(rng.normal(0, 0.05, (3, 3, 3, Cc, Cc)), jnp.bfloat16)
        dnc = jax.lax.conv_dimension_numbers(
            xc.shape, kc.shape, ("NHWDC", "HWDIO", "NHWDC"))

        def convc(xx, kk, dnc=dnc):
            return jax.lax.conv_general_dilated(
                xx, kk, (1, 1, 1), "SAME", dimension_numbers=dnc)

        fl = 2 * B * S * S * T * (27 * Cc) * Cc
        bench(f"conv3d_c{Cc}_control", convc, xc, kc, flops=fl,
              note="control workload (not RAMS): lane-occupancy curve")

    out = {
        "platform": jax.devices()[0].platform,
        "device": str(jax.devices()[0]),
        "workload": f"3x3x3 SAME conv, (B={B}, {S}, {S}, T={T}, C={C}) bf16",
        "useful_flops_per_call": useful_flops,
        "parity_max_rel_err": parity,
        "parity_note": ("arms with rel err >= 1e-5 are excluded from "
                        "results (miscompiled formulation, see docstring)"),
        "results": results,
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    json.dump(out, open(args.out, "w"), indent=1)
    print("wrote", args.out, flush=True)


if __name__ == "__main__":
    main()
