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

    # numeric cross-check at bf16 before timing
    a = np.asarray(xla_conv(x, k, b), np.float32)
    p = np.asarray(
        conv3d_same_rfab(x, k, b, compute_dtype=jnp.bfloat16), np.float32)
    err = float(np.max(np.abs(a - p) / (np.abs(a) + 1e-3)))
    print(f"max rel err vs XLA: {err:.3e}")

    reps = 20
    t_xla = time_jitted(lambda: xla_conv(x, k, b), repeats=reps)
    t_pl = time_jitted(
        lambda: conv3d_same_rfab(x, k, b, compute_dtype=jnp.bfloat16),
        repeats=reps)

    # training step shape: value+grad of an MSE through one conv
    from mri_super_resolution_tpu.ops.pallas.conv3d_kernel import (
        conv3d_same_rfab_trainable)

    tgt = jnp.asarray(rng.normal(size=(B, H, W, T, C)), jnp.float32)

    @jax.jit
    def vg_xla(x, k, b):
        def loss(k, b):
            o = xla_conv(x, k, b).astype(jnp.float32)
            return jnp.mean((o - tgt) ** 2)
        return jax.value_and_grad(loss, argnums=(0, 1))(k, b)

    @jax.jit
    def vg_pl(x, k, b):
        def loss(k, b):
            o = conv3d_same_rfab_trainable(
                x, k, b, jnp.bfloat16).astype(jnp.float32)
            return jnp.mean((o - tgt) ** 2)
        return jax.value_and_grad(loss, argnums=(0, 1))(k, b)

    t_vg_xla = time_jitted(lambda: vg_xla(x, k, b), repeats=reps)
    t_vg_pl = time_jitted(lambda: vg_pl(x, k, b), repeats=reps)

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
        "max_rel_err": err,
        "note": "whole-call timing incl. pad/transpose/crop around the "
                "pallas_call; the XLA side is the bare conv+bias",
    }
    print(json.dumps(row))
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "results", "round3_rams", "conv_kernel_ab.json")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    json.dump(row, open(out, "w"), indent=1)
    print("wrote", out)


if __name__ == "__main__":
    main()
