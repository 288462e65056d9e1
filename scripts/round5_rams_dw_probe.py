#!/usr/bin/env python
"""Decompose the RAMS conv3d train-step cost: where does the backward go?

The per-fusion xplane profile of the B=96 bf16 train step
(scripts/profile_rams.py --batch 96 --dtype bfloat16) shows 57% of device
time in `multiply_reduce_fusion` ops emitting (f32[32], f32[3,3,3,32,32])
tuples — the conv WEIGHT gradients (+ weight-norm reparam grads), lowered
by the TPU backend as fused multiply+reduce rather than MXU convolutions —
while the actual convolution fusions are only 11% of the step. This probe
isolates the hot 3x3x3 SAME conv at the production shape
(B=96, 32, 32, T=9, C=32; reference utils/network.py:91-155) and slope-times
fwd / dX / dW separately, then races XLA's automatic dW against explicit
reformulations:

  dW(auto)      jax.vjp of lax.conv_general_dilated (what the step runs)
  dW(einsum27)  27 shifted (N,32)x(N,32) einsums, N = B*S*S*T = 884736,
                f32 accumulate (preferred_element_type)
  dW(stack27)   one (27,...)-stacked einsum — materializes a 1.5 GB
                operand; bandwidth arithmetic alone (reading 1.5 GB/iter
                at 819 GB/s ~= 1.9 ms) puts it behind dW(auto) before
                compute starts, and the measured run exceeded its timeout
  t2d           full fwd+bwd of the conv re-expressed as 3 summed 2-D
                convs with T folded into batch (tests whether 2-D kernel
                grads get a better lowering; the transposes/rolls on the
                56 MB activation dominate)

Measured on the v5e chip (2026-08, see results/round5_rams/dw_decomposition.json):

  fwd 0.609 ms / dX 0.649 ms / dW(auto) 1.406 ms
  dW(einsum27) 2.753 ms, t2d fwd+bwd 12.219 ms vs conv3d 2.732 ms

i.e. dW costs 2.3x fwd for identical FLOPs (34.8 vs 80 TF/s) and every
reformulation tried loses to XLA's choice — the step's remaining headroom
is bounded by the backend's kernel-grad lowering, not by anything the
model code can re-express. Run: python scripts/round5_rams_dw_probe.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from mri_super_resolution_tpu.utils.profiling import time_jitted

B, S, T, C = 96, 32, 9, 32
rng = np.random.default_rng(0)
x = jnp.asarray(rng.normal(0, 1, (B, S, S, T, C)), jnp.bfloat16)
k = jnp.asarray(rng.normal(0, 0.05, (3, 3, 3, C, C)), jnp.bfloat16)
dn3 = jax.lax.conv_dimension_numbers(x.shape, k.shape,
                                     ("NHWDC", "HWDIO", "NHWDC"))


def conv3d(xx, kk):
    return jax.lax.conv_general_dilated(xx, kk, (1, 1, 1), "SAME",
                                        dimension_numbers=dn3)


def slope(fn, n1=10, n2=50):
    """Per-iteration seconds as the slope between two scan lengths —
    cancels the constant tunnel round-trip (see round5_rams_lanepack.py)."""
    def mk(n):
        @jax.jit
        def run(x0, kk):
            def body(c, _):
                return fn(c, kk), None
            out, _ = jax.lax.scan(body, x0, None, length=n)
            return jnp.float32(out).sum() * 1e-9
        return run
    f1, f2 = mk(n1), mk(n2)
    t1 = time_jitted(lambda: f1(x, k), repeats=5, warmup=2)
    t2 = time_jitted(lambda: f2(x, k), repeats=5, warmup=2)
    return (t2 - t1) / (n2 - n1)


def dx_only(ct, kk):
    _, vjp = jax.vjp(lambda xx: conv3d(xx, kk), x)
    return vjp(ct)[0]


def dw_auto(ct, kk):
    _, vjp = jax.vjp(lambda kk_: conv3d(x, kk_), kk)
    dw = vjp(ct)[0]
    # fold dw back into the (B,...)-shaped carry so the scan is loop-carried
    return ct + (jnp.float32(dw).sum() * 1e-12).astype(ct.dtype)


def dw_einsum27(ct, kk):
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
    outs = []
    for ky in range(3):
        for kx in range(3):
            for kt in range(3):
                xs = jax.lax.dynamic_slice(xp, (0, ky, kx, kt, 0),
                                           (B, S, S, T, C))
                outs.append(jnp.einsum("bxytc,bxytd->cd", xs, ct,
                                       preferred_element_type=jnp.float32))
    dw = jnp.stack(outs).reshape(3, 3, 3, C, C)
    return ct + (dw.sum() * 1e-12).astype(ct.dtype)


def main():
    print(f"fwd: {slope(conv3d) * 1e3:.3f} ms", flush=True)
    print(f"dX: {slope(dx_only) * 1e3:.3f} ms", flush=True)
    print(f"dW(auto): {slope(dw_auto) * 1e3:.3f} ms", flush=True)
    print(f"dW(einsum27): {slope(dw_einsum27) * 1e3:.3f} ms", flush=True)


if __name__ == "__main__":
    main()
