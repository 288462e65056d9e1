"""A/B the experimental Pallas RFAB conv against XLA's conv emitter.

Shapes = the RAMS trainer's dominant fusion: (8, 32, 32, 9, 32) bf16
activations, 3x3x3 SAME, C_out = 32 (docs/ROUND3.md attribution: ~190 us
per conv inside XLA's emitter = ~49% of the filters=32 lane-constrained
ceiling). The Pallas kernel pays the N=32 lane wall once per output plane
via a K=864 concatenated matmul; this script reports whether that beats
the emitter. Run on real TPU.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from mri_super_resolution_tpu.ops.pallas.conv3d_kernel import conv3d_same_rfab
    from mri_super_resolution_tpu.utils.profiling import time_jitted

    B, H, W, T, C = 8, 32, 32, 9, 32
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, H, W, T, C)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(3, 3, 3, C, C)) * 0.1, jnp.float32)
    b = jnp.asarray(rng.normal(size=(C,)), jnp.float32)

    dn = jax.lax.conv_dimension_numbers(
        x.shape, k.shape, ("NDHWC", "DHWIO", "NDHWC"))

    @jax.jit
    def xla_conv(x, k, b):
        return jax.lax.conv_general_dilated(
            x, k.astype(x.dtype), window_strides=(1, 1, 1), padding="SAME",
            dimension_numbers=dn) + b.astype(x.dtype)

    # numeric cross-check before timing. f32 first (isolates real kernel
    # bugs from bf16 rounding), then bf16 scaled by the output magnitude —
    # a fixed 1e-3 denominator floor mislabels ~0.01 bf16 quantization at a
    # near-zero output as O(1) "relative error".
    xf = x.astype(jnp.float32)
    a32 = np.asarray(xla_conv(xf, k, b), np.float32)
    p32 = np.asarray(conv3d_same_rfab(xf, k, b), np.float32)
    scale = float(np.std(a32))
    err32 = float(np.max(np.abs(a32 - p32))) / scale
    print(f"f32 max err / output std: {err32:.3e}")

    a = np.asarray(xla_conv(x, k, b), np.float32)
    p = np.asarray(
        conv3d_same_rfab(x, k, b, compute_dtype=jnp.bfloat16), np.float32)
    err = float(np.max(np.abs(a - p))) / scale
    print(f"bf16 max err / output std: {err:.3e}")

    # Timing: a single remote dispatch costs ~10-200 ms on the tunnelled
    # backend — whole-call timing cannot resolve a ~190 us kernel (the first
    # committed A/B measured 0.02 TF/s both ways: pure dispatch).  Chain
    # CHAIN data-dependent convs inside ONE jitted lax.scan so device time
    # dominates, and report per-conv time.
    CHAIN = 200
    reps = 5

    def chain(conv_fn):
        @jax.jit
        def run(x, k, b):
            def body(h, _):
                h = conv_fn(h, k, b)
                return h * (1.0 / 16.0), None  # keep magnitudes bounded
            h, _ = jax.lax.scan(body, x, None, length=CHAIN)
            return h
        return run

    run_xla = chain(lambda h, k, b: xla_conv(h, k, b))
    run_pl = chain(lambda h, k, b: conv3d_same_rfab(
        h, k, b, compute_dtype=jnp.bfloat16))
    t_xla = time_jitted(lambda: run_xla(x, k, b), repeats=reps) / CHAIN
    t_pl = time_jitted(lambda: run_pl(x, k, b), repeats=reps) / CHAIN

    # training shape: value+grad of an MSE through the conv chain (backward
    # runs CHAIN pallas bwd kernels)
    from mri_super_resolution_tpu.ops.pallas.conv3d_kernel import (
        conv3d_same_rfab_trainable)

    VG_CHAIN = 32
    tgt = jnp.asarray(rng.normal(size=(B, H, W, T, C)), jnp.float32)

    def vg_chain(conv_fn):
        @jax.jit
        def run(x, k, b):
            def loss(k, b):
                def body(h, _):
                    h = conv_fn(h, k, b)
                    return h * (1.0 / 16.0), None
                h, _ = jax.lax.scan(body, x, None, length=VG_CHAIN)
                return jnp.mean((h.astype(jnp.float32) - tgt) ** 2)
            return jax.value_and_grad(loss, argnums=(0, 1))(k, b)
        return run

    vg_xla = vg_chain(lambda h, k, b: xla_conv(h, k, b))
    vg_pl = vg_chain(lambda h, k, b: conv3d_same_rfab_trainable(
        h, k, b, jnp.bfloat16))
    t_vg_xla = time_jitted(lambda: vg_xla(x, k, b), repeats=reps) / VG_CHAIN
    t_vg_pl = time_jitted(lambda: vg_pl(x, k, b), repeats=reps) / VG_CHAIN

    flops = 2 * B * H * W * T * 27 * C * C
    row = {
        "shape": [B, H, W, T, C],
        "xla_us": round(t_xla * 1e6, 1),
        "pallas_us": round(t_pl * 1e6, 1),
        "speedup": round(t_xla / t_pl, 3),
        "xla_valgrad_us": round(t_vg_xla * 1e6, 1),
        "pallas_valgrad_us": round(t_vg_pl * 1e6, 1),
        "valgrad_speedup": round(t_vg_xla / t_vg_pl, 3),
        "pallas_tflops": round(flops / t_pl / 1e12, 2),
        "xla_tflops": round(flops / t_xla / 1e12, 2),
        "f32_max_err_over_std": err32,
        "bf16_max_err_over_std": err,
        "chain": CHAIN,
        "vg_chain": VG_CHAIN,
        "note": "per-conv time from a scan-chained program (dispatch "
                "amortized); pallas side includes pad/transpose/crop, XLA "
                "side is the bare conv+bias",
    }
    print(json.dumps(row))
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "results", "round3_rams", "conv_kernel_ab.json")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    json.dump(row, open(out, "w"), indent=1)
    print("wrote", out)


if __name__ == "__main__":
    main()
